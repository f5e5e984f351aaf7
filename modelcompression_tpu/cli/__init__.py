"""CLI entry points mirroring the reference's public script API
(BASELINE.json:5): prune, finetune, eval, train, detect.

Run as modules:  python -m modelcompression_tpu.cli.prune --help
"""
