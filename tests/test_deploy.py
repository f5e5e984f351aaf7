"""deploy CLI — the one-command docs/DEPLOYMENT.md recipe driver
(cli/deploy.py): prune -> fine-tune -> QAT int8 -> packed artifact, with
a per-stage report."""

import json
import os

import jax
import numpy as np

from modelcompression_tpu.data.fixtures import make_fake_voc, tiny_region_cfg
from modelcompression_tpu.models import (
    init_params, load_cfg, parse_cfg, save_weights,
)
from modelcompression_tpu.models.cfg import ConvLayer


def test_deploy_cli_end_to_end(tmp_path):
    from modelcompression_tpu.cli import deploy

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    cfg_path = str(tmp_path / "tiny.cfg")
    open(cfg_path, "w").write(
        tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(0))
    w_path = str(tmp_path / "init.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)
    data = make_fake_voc(str(tmp_path / "voc"), n_images=4, image_size=64)
    out_dir = str(tmp_path / "artifacts")

    rc = deploy.main([
        "--cfg", cfg_path, "--weights", w_path, "--data", data,
        "--out-dir", out_dir, "--fractions", "0.5",
        "--steps", "2", "--qat-steps", "2", "--cluster-bits", "4",
        "--batch", "2", "--eval-batch", "2", "--max-boxes", "8",
        "--export", "tflite",
    ])
    assert rc == 0

    # every documented artifact exists (incl. the stage-4 edge export)
    for name in ("slim.weights", "slim.cfg", "slim-qat.weights",
                 "deploy.qz", "deploy.cz", "slim.tflite", "report.json"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    assert json.load(open(os.path.join(out_dir, "report.json")))[
        "artifacts"]["slim.tflite"] > 0

    report = json.load(open(os.path.join(out_dir, "report.json")))
    assert set(report["stages"]) == {"baseline", "pruned", "int8"}
    for st in report["stages"].values():
        assert 0.0 <= st["map50"] <= 100.0
    # pruning physically shrank the model (report + cfg agree)
    assert report["stages"]["pruned"]["params"] < \
        report["stages"]["baseline"]["params"]
    slim = load_cfg(os.path.join(out_dir, "slim.cfg"))
    convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    orig = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert convs[-1].filters == orig[-1].filters
    assert sum(c.filters for c in convs) < sum(c.filters for c in orig)
    assert report["artifacts"]["slim.weights"] > \
        report["artifacts"]["deploy.qz"] > 0
    assert report["artifacts"]["deploy.cz"] > 0

    # the int8 artifact actually serves (the report measured through it)
    from modelcompression_tpu.compress import load_qmodel
    qparams, qspec = load_qmodel(os.path.join(out_dir, "deploy.qz"),
                                 spec=slim)
    assert qparams is not None and qspec is not None

    # bad fraction is a usage error before any work
    rc = deploy.main([
        "--cfg", cfg_path, "--weights", w_path, "--data", data,
        "--out-dir", out_dir, "--fractions", "1.5", "--steps", "1",
    ])
    assert rc == 2


def test_deploy_cli_skip_stages(tmp_path):
    """--qat-steps 0 and --cluster-bits 0 skip their stages cleanly."""
    from modelcompression_tpu.cli import deploy

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    cfg_path = str(tmp_path / "tiny.cfg")
    open(cfg_path, "w").write(
        tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(1))
    w_path = str(tmp_path / "init.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)
    data = make_fake_voc(str(tmp_path / "voc"), n_images=4, image_size=64)
    out_dir = str(tmp_path / "artifacts")

    rc = deploy.main([
        "--cfg", cfg_path, "--weights", w_path, "--data", data,
        "--out-dir", out_dir, "--fractions", "0.25",
        "--steps", "1", "--qat-steps", "0", "--cluster-bits", "0",
        "--batch", "2", "--eval-batch", "2", "--max-boxes", "8",
    ])
    assert rc == 0
    report = json.load(open(os.path.join(out_dir, "report.json")))
    assert set(report["stages"]) == {"baseline", "pruned"}
    assert not os.path.exists(os.path.join(out_dir, "deploy.qz"))
    assert not os.path.exists(os.path.join(out_dir, "deploy.cz"))
