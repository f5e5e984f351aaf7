"""Per-commit performance ledger (utils/perf_ledger.py; SURVEY.md §4.7)
and the bench.py --quick surface that feeds it."""

import json
import os
import subprocess
import sys

from modelcompression_tpu.utils import perf_ledger


def test_append_stamps_ts_and_commit(tmp_path):
    path = str(tmp_path / "ledger.jsonl")
    e1 = perf_ledger.append({"mode": "quick:pruned",
                             "img_per_sec": 15000.0}, path=path)
    e2 = perf_ledger.append({"mode": "full", "img_per_sec": 16000.0,
                             "note": "exp-int8-input"}, path=path)
    assert e1["img_per_sec"] == 15000.0
    # ISO-8601 UTC stamp
    assert len(e1["ts"]) == 20 and e1["ts"].endswith("Z")
    # tmp_path is not a git repo -> commit degrades to "unknown"
    assert e1["commit"] == "unknown"

    got = perf_ledger.read(path)
    assert [g["mode"] for g in got] == ["quick:pruned", "full"]
    assert got[1]["note"] == "exp-int8-input"
    # append-only: each entry is one standalone JSON line
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 2
    for ln in lines:
        json.loads(ln)


def test_read_skips_malformed_lines(tmp_path):
    path = str(tmp_path / "ledger.jsonl")
    perf_ledger.append({"a": 1}, path=path)
    with open(path, "a") as f:
        f.write("{truncated-by-a-crash\n")
    perf_ledger.append({"a": 2}, path=path)
    got = perf_ledger.read(path)
    assert [g["a"] for g in got] == [1, 2]
    assert perf_ledger.read(str(tmp_path / "missing.jsonl")) == []


def test_git_commit_stamps_real_repo(tmp_path):
    repo = str(tmp_path / "r")
    os.makedirs(repo)
    env = {**os.environ,
           "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}

    def git(*a):
        subprocess.run(["git", *a], cwd=repo, check=True, env=env,
                       capture_output=True)

    git("init", "-q")
    open(os.path.join(repo, "f.txt"), "w").write("x\n")
    git("add", "f.txt")
    git("commit", "-qm", "init")
    sha = perf_ledger.git_commit(repo)
    assert sha != "unknown" and "+dirty" not in sha and len(sha) >= 7
    # a tracked modification flips the dirty marker
    open(os.path.join(repo, "f.txt"), "w").write("y\n")
    assert perf_ledger.git_commit(repo) == sha + "+dirty"


def test_bench_quick_parser():
    """bench.py --quick: one-config regression mode with a ledger note;
    the TPU measurement itself runs only on hardware (driver/manual)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    args = bench.build_parser().parse_args([])
    assert args.quick is None and args.note == "" and not args.no_ledger
    args = bench.build_parser().parse_args(["--quick"])
    assert args.quick == "pruned"
    args = bench.build_parser().parse_args(
        ["--quick", "pruned_int8", "--note", "exp1", "--no-ledger"])
    assert args.quick == "pruned_int8"
    assert args.note == "exp1" and args.no_ledger
