"""CLI entry points mirroring the reference's public script API
(BASELINE.json:5): prune, finetune, eval, train, detect — plus summary
(layer table), deploy (the docs/DEPLOYMENT.md recipe as one command),
export (the fused serving program as a TF SavedModel), and serve (a
batching HTTP inference daemon over the same fused program).

Run as modules:  python -m modelcompression_tpu.cli.prune --help
"""
