"""Append-only per-commit performance ledger (SURVEY.md §4.7:
"images/sec/chip recorded per commit").

Every bench.py invocation — full or ``--quick`` — appends one JSON line
to ``PERF_LEDGER.jsonl`` at the repo root, stamped with the wall-clock
time and the current git commit (``+dirty`` when the working tree has
uncommitted changes), so a chip-side regression inside a round is
attributable to the commit that introduced it instead of only showing up
in the next round's ``BENCH_r*.json``. Experiment tools can tag their
entries with a ``note`` to build the ≥2-run evidence the adopt/reject
policy in docs/PERF.md asks for.

The ledger is diagnostic, never load-bearing: all failures (no git, RO
filesystem) degrade to a stderr warning so the bench gate cannot be
failed by bookkeeping.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
DEFAULT_PATH = os.path.join(_REPO_ROOT, "PERF_LEDGER.jsonl")


def git_commit(repo_root: str = _REPO_ROOT) -> str:
    """Current short commit hash, with ``+dirty`` when the tree has
    uncommitted tracked changes; ``"unknown"`` when git is unavailable."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=repo_root,
            capture_output=True, text=True, timeout=10, check=True,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=repo_root, capture_output=True, text=True, timeout=10,
            check=True,
        ).stdout.strip()
        return sha + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"


def append(record: dict, path: str = DEFAULT_PATH) -> dict:
    """Stamp ``record`` with ``ts`` (UTC ISO) + ``commit`` and append it
    as one JSON line. Returns the stamped record; never raises."""
    entry = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": git_commit(os.path.dirname(os.path.abspath(path))),
        **record,
    }
    try:
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")
    except OSError as e:
        print(f"[warn] perf ledger append failed: {e}", file=sys.stderr)
    return entry


def read(path: str = DEFAULT_PATH) -> list:
    """All ledger entries (oldest first); [] when absent/unreadable.
    Malformed lines are skipped — an interrupted append must not poison
    every later read."""
    entries = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    entries.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    except OSError:
        pass
    return entries
