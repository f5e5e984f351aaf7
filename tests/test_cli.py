"""CLI smoke tests (the public script surface, BASELINE.json:5) — including
the COCO-subset iterative config (BASELINE.json:10 / VERDICT r1 #8):
``finetune --iterate`` end-to-end with 80 classes on a COCO-class-count
fixture, using the shipped tiny-yolo-coco.cfg layer stack.
"""

import os
import re

import jax
import numpy as np

from modelcompression_tpu.data.fixtures import make_fake_voc
from modelcompression_tpu.models import (
    coco_names_path, dump_cfg, init_params, load_cfg, parse_cfg,
    save_weights, tiny_yolov2_coco,
)
from modelcompression_tpu.models.cfg import ConvLayer


def test_coco_config_shape():
    spec = tiny_yolov2_coco()
    convs = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert spec.region.classes == 80
    assert convs[-1].filters == 5 * (5 + 80) == 425
    names = open(coco_names_path()).read().split("\n")
    names = [n for n in names if n]
    assert len(names) == 80 and names[0] == "person"


def test_full_yolov2_coco_config_shape():
    """Full YOLOv2-COCO (darknet yolov2.cfg shape): same Darknet-19 +
    reorg backbone as the VOC variant, 80-class head, COCO anchors."""
    from modelcompression_tpu.models import yolov2_coco, yolov2_voc
    coco, voc = yolov2_coco(), yolov2_voc()
    assert coco.region.classes == 80
    cc = [l for l in coco.layers if isinstance(l, ConvLayer)]
    vc = [l for l in voc.layers if isinstance(l, ConvLayer)]
    assert cc[-1].filters == 425 and len(cc) == len(vc) == 23
    # backbone identical to the VOC variant; only the head conv differs
    assert [l.filters for l in cc[:-1]] == [l.filters for l in vc[:-1]]
    assert abs(coco.region.anchors[0] - 0.57273) < 1e-6
    # training hyperparameters are the PUBLIC yolov2.cfg's, not the VOC
    # variant's (TrainConfig.from_spec reads the cfg as the training
    # config, so these drive real training runs)
    assert coco.net.width == coco.net.height == 608
    assert coco.net.burn_in == 1000
    assert coco.net.max_batches == 500200
    assert coco.net.steps == (400000, 450000)
    # forward shape sanity at reduced resolution
    coco.net.width = coco.net.height = 64
    from modelcompression_tpu.core.precision import FAST
    from modelcompression_tpu.models.darknet import forward
    import jax.numpy as jnp
    p = init_params(coco, jax.random.key(0))
    y = forward(p, jnp.zeros((1, 64, 64, 3)), coco, FAST)
    assert y.shape == (1, 2, 2, 425)


def test_finetune_iterate_coco_80_classes(tmp_path):
    """One iterative prune->finetune->eval round with 80 classes through the
    finetune CLI. Uses the shipped COCO cfg's layer stack at reduced
    resolution (64px) so the smoke runs in CPU-seconds."""
    from modelcompression_tpu.cli import finetune

    # 80-class fixture dataset (classes read from the shipped coco.names)
    names = [n for n in open(coco_names_path()).read().split("\n") if n]
    data_cfg = make_fake_voc(str(tmp_path / "data"), n_images=4,
                             image_size=96, seed=0, classes=tuple(names))

    # shipped COCO config, reduced to 64px for speed (structure untouched)
    spec = tiny_yolov2_coco()
    spec.net.width = spec.net.height = 64
    spec.net.burn_in = 0
    cfg_path = str(tmp_path / "tiny-coco-64.cfg")
    with open(cfg_path, "w") as f:
        f.write(dump_cfg(spec))

    weights_path = str(tmp_path / "init.weights")
    params = init_params(spec, jax.random.key(0))
    save_weights(weights_path, spec, jax.tree.map(np.asarray, params),
                 seen=0)

    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = finetune.main([
        "--cfg", cfg_path, "--weights", weights_path,
        "--data", data_cfg, "--steps", "2", "--batch", "2",
        "--max-boxes", "8", "--iterate", "0.25",
        "--iterate-mode", "l1_filter",
        "--out", out, "--out-cfg", out_cfg,
    ])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(out_cfg)

    slim = load_cfg(out_cfg)
    slim_convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    orig_convs = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert slim.region.classes == 80
    assert slim_convs[-1].filters == 425          # detection conv protected
    assert slim_convs[0].filters == orig_convs[0].filters * 3 // 4

    # the written weights must load back against the written cfg
    from modelcompression_tpu.models import load_weights
    slim_params, seen = load_weights(out, slim)
    assert len(slim_params) == len(slim_convs)


def _write_model(tmp_path, num_classes=3, net=64):
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    spec_txt = tiny_region_cfg(num_classes=num_classes, width=net,
                               height=net)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, wpath, spec


def test_prune_cli_all_modes(tmp_path):
    """prune CLI: magnitude (with and without --use-pallas), global, and
    l1_filter with cfg rewrite — the reference's prune script surface."""
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import load_weights
    cfg_path, wpath, spec = _write_model(tmp_path)

    for mode, extra in (("magnitude", []), ("magnitude", ["--use-pallas"]),
                        ("global", [])):
        out = str(tmp_path / f"p_{mode}{len(extra)}.weights")
        rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                         "--mode", mode, "--sparsity", "0.5",
                         "--out", out] + extra)
        assert rc == 0
        pruned, _ = load_weights(out, spec)
        zeros = sum(float((np.asarray(p["w"]) == 0).sum())
                    for p in pruned.values())
        total = sum(np.asarray(p["w"]).size for p in pruned.values())
        assert zeros / total >= 0.45

    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--fraction", "0.5",
                     "--out", out, "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)
    slim_params, _ = load_weights(out, slim)  # loads against slimmed cfg
    convs = [l for l in slim.layers if isinstance(l, ConvLayer)]
    assert convs[0].filters == 8  # 16 * 0.5


def test_prune_cli_sweep_driver(tmp_path):
    """The reference's sparsity sweep driver (BASELINE.json:8): one command
    prunes at each point, writes per-point weights, and reports mAP."""
    from modelcompression_tpu.cli import prune
    from modelcompression_tpu.models import load_weights
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=4)
    out = str(tmp_path / "sw.weights")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "magnitude", "--sweep", "0.5,0.9",
                     "--data", data_cfg, "--batch", "2", "--out", out])
    assert rc == 0
    for pct, s in ((50, 0.5), (90, 0.9)):
        p, _ = load_weights(str(tmp_path / f"sw_{pct}.weights"), spec)
        zeros = sum(float((np.asarray(q["w"]) == 0).sum())
                    for q in p.values())
        total = sum(np.asarray(q["w"]).size for q in p.values())
        assert zeros / total >= s - 0.02

    # l1_filter sweep writes per-point cfgs too
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--sweep", "0.5",
                     "--out", str(tmp_path / "fl.weights")])
    assert rc == 0
    slim = load_cfg(str(tmp_path / "fl_50.cfg"))
    slim_p, _ = load_weights(str(tmp_path / "fl_50.weights"), slim)
    assert [l for l in slim.layers if isinstance(l, ConvLayer)][0].filters == 8


def test_train_cli_smoke(tmp_path):
    """train CLI: 2 steps on the fixture + final checkpoint written."""
    from modelcompression_tpu.cli import train as train_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=1)
    ckdir = str(tmp_path / "ck")
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "2", "--batch", "2",
                         "--max-boxes", "8", "--checkpoint-dir", ckdir])
    assert rc == 0
    from modelcompression_tpu.utils.checkpoint import latest_checkpoint
    assert latest_checkpoint(ckdir) is not None


def test_finetune_cli_full_augment_smoke(tmp_path):
    """finetune now carries the full augmentation surface the accuracy-
    recovery contract rides on (VERDICT r1 #5): cfg jitter is on by
    default via from_spec, and --mosaic/--hsv/--jitter are public flags."""
    from modelcompression_tpu.cli import finetune
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=8)
    out = str(tmp_path / "aug.weights")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8", "--mosaic", "--hsv",
                        "--jitter", "0.15", "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    # bad jitter is rejected up front
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--jitter", "0.6", "--out", out])
    assert rc == 2


def test_finetune_cli_freeze_smoke(tmp_path):
    """finetune --freeze N: the frozen backbone prefix survives a training
    step byte-identical in the written .weights (head-only transfer
    learning, pairs with --partial)."""
    from modelcompression_tpu.cli import finetune
    from modelcompression_tpu.models import load_weights, parse_cfg
    cfg_path, wpath, spec = _write_model(tmp_path)
    out = str(tmp_path / "frozen.weights")
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=9)
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "2", "--batch", "2",
                        "--max-boxes", "8", "--freeze", "1", "--out", out])
    assert rc == 0
    p0, _ = load_weights(wpath, spec)
    p1, _ = load_weights(out, spec)
    ck = sorted((k for k in p0 if k.startswith("conv")),
                key=lambda k: int(k[4:]))
    k_frozen = ck[0]
    for name, v in p1[k_frozen].items():
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(p0[k_frozen][name]))
    # a later layer trained
    k_other = ck[-1]
    assert any(
        not np.array_equal(np.asarray(p1[k_other][n]),
                           np.asarray(p0[k_other][n]))
        for n in p0[k_other])
    # freezing every conv is rejected up front
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--freeze", "99", "--out", out])
    assert rc != 0


def test_eval_cli_cluster_roundtrip(tmp_path, capsys):
    """Weight sharing on the public surface: eval --cluster-bits saves a
    standalone artifact; eval/detect --cmodel serve it with identical
    results (reconstruction is exact)."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=13)
    cm = str(tmp_path / "m.cz")
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--cluster-bits", "6", "--save-cmodel", cm])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert os.path.exists(cm)
    rc = eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                        "--batch", "2", "--cmodel", cm])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert out1.splitlines()[-1] == out2.splitlines()[-1]  # same mAP line
    # invalid combinations are rejected up front
    assert eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                          "--cmodel", cm, "--cluster-bits", "4"]) == 2
    assert eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                          "--data", data_cfg, "--save-cmodel", cm]) == 2


def test_prune_cli_bn_gamma_and_slim_train(tmp_path):
    """Network slimming surface: prune --mode bn_gamma rewrites the cfg
    like l1_filter; finetune --bn-l1 trains with the gamma penalty and
    --iterate-mode bn_gamma drives the structured loop."""
    from modelcompression_tpu.cli import finetune, prune
    from modelcompression_tpu.models import load_cfg
    cfg_path, wpath, spec = _write_model(tmp_path)
    out = str(tmp_path / "slim.weights")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "bn_gamma", "--fraction", "0.25",
                     "--out", out])
    assert rc == 0
    slim = load_cfg(str(tmp_path / "slim.cfg"))
    orig_convs = [l for l in spec.layers if hasattr(l, "filters")]
    slim_convs = [l for l in slim.layers if hasattr(l, "filters")]
    assert slim_convs[0].filters == orig_convs[0].filters * 3 // 4
    assert slim_convs[-1].filters == orig_convs[-1].filters  # protected

    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=12)
    out2 = str(tmp_path / "slimft.weights")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8", "--bn-l1", "0.01",
                        "--iterate", "0.5", "--iterate-mode", "bn_gamma",
                        "--out", out2])
    assert rc == 0
    assert os.path.exists(out2)


def test_finetune_cli_distill(tmp_path):
    """finetune --distill: knowledge-distillation fine-tune through the
    public CLI (teacher = a separate .weights, here the initial model);
    mismatched teacher heads are rejected up front."""
    from modelcompression_tpu.cli import finetune
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=11)
    out = str(tmp_path / "kd.weights")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "2", "--batch", "2",
                        "--max-boxes", "8", "--distill", wpath,
                        "--distill-weight", "2.0", "--distill-temp", "2.0",
                        "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    # distillation composes with the iterative loop (teacher stays the
    # original while the student is repacked per round)
    out2 = str(tmp_path / "kd_it.weights")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8", "--distill", wpath,
                        "--iterate", "0.5", "--out", out2])
    assert rc == 0
    assert os.path.exists(out2)
    # a teacher with a different head is rejected before training
    t4 = tmp_path / "t4"
    t4.mkdir()
    cfg4, w4, _ = _write_model(t4, num_classes=4)
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--distill", w4, "--distill-cfg", cfg4,
                        "--out", out])
    assert rc == 2


def test_finetune_cli_qat(tmp_path):
    """finetune --qat: quantization-aware fine-tune through the public
    CLI (calibrate grids, STE train, print the exported int8 model's
    mAP); hybrid --qat-layers works; --qat + --iterate is rejected
    (repack rounds would stale the calibrated grids)."""
    from modelcompression_tpu.cli import finetune
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=9)
    out = str(tmp_path / "qat.weights")
    base = ["--cfg", cfg_path, "--weights", wpath, "--data", data_cfg,
            "--steps", "1", "--batch", "2", "--max-boxes", "8",
            "--out", out]
    qm = str(tmp_path / "qat.qz")
    rc = finetune.main(base + ["--qat", "--qat-calib-images", "2",
                               "--qat-layers", "auto:16",
                               "--save-qmodel", qm])
    assert rc == 0
    assert os.path.exists(out)
    # the exported artifact serves through eval --qmodel
    assert os.path.exists(qm)
    from modelcompression_tpu.cli import eval as eval_cli
    assert eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                          "--batch", "2", "--qmodel", qm]) == 0
    rc = finetune.main(base + ["--qat", "--iterate", "0.5"])
    assert rc == 2
    assert finetune.main(base + ["--save-qmodel", qm]) == 2


def test_eval_cli_smoke(tmp_path):
    """eval CLI: fixture dataset -> per-class AP table + detection dump,
    bitmatch precision path included."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=2)
    dump = str(tmp_path / "dets")
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--precision", "bitmatch", "--dump-dir", dump])
    assert rc == 0
    import glob
    assert len(glob.glob(dump + "/*.txt")) == 3  # one file per class


def test_eval_cli_qmodel_roundtrip(tmp_path, capsys):
    """The int8 deployment-artifact loop through the public CLI:
    `eval --int8 --save-qmodel` writes one standalone .npz, a later
    `eval --qmodel` (no --weights, no calibration data) reproduces the
    mAP table exactly; the flag-combination guards reject misuse."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=11)
    qm = str(tmp_path / "model.qz")
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2", "--int8",
                        "--calib-images", "2", "--save-qmodel", qm])
    assert rc == 0
    assert os.path.exists(qm)
    saved_out = capsys.readouterr().out

    rc = eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                        "--batch", "2", "--qmodel", qm])
    assert rc == 0
    served_out = capsys.readouterr().out

    # identical quantized pytree -> identical detections -> identical AP
    # table (only the wall-clock img/s differs between runs)
    def norm(out):
        # mask every wall-clock figure: img/s AND the first-batch
        # excluded time (compile + first dispatch, run-dependent)
        out = re.sub(r"[\d.]+ img/s", "_ img/s", out)
        return re.sub(r"excluded: [\d.]+s", "excluded: _s", out)
    assert norm(served_out) == norm(saved_out)

    # guards: conflicting directions / missing prerequisites
    assert eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                          "--qmodel", qm, "--int8"]) == 2
    assert eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                          "--data", data_cfg, "--save-qmodel", qm]) == 2
    assert eval_cli.main(["--cfg", cfg_path, "--data", data_cfg]) == 2
    assert eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                          "--qmodel", qm, "--precision",
                          "bitmatch"]) == 2
    # arch guard: a different-head cfg must be rejected at load
    other_dir = tmp_path / "other"
    other_dir.mkdir()
    cfg2, _, _ = _write_model(other_dir, num_classes=2)
    assert eval_cli.main(["--cfg", cfg2, "--data", data_cfg,
                          "--qmodel", qm]) == 2


def test_detect_cli_smoke(tmp_path):
    """detect: single fixture image through the fused eval step, boxes drawn
    in source-pixel coordinates."""
    from modelcompression_tpu.cli import detect
    from modelcompression_tpu.data.fixtures import tiny_region_cfg

    root = str(tmp_path / "data")
    make_fake_voc(root, n_images=1, image_size=160, seed=3)
    img_path = root + "/images/img0000.png"

    spec_txt = tiny_region_cfg(num_classes=3, width=128, height=128)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    names = str(tmp_path / "f.names")
    open(names, "w").write("redbox\ngreenbox\nbluebox\n")

    out = str(tmp_path / "pred.png")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--image", img_path, "--out", out,
                      "--conf", "0.001", "--names", names])
    assert rc == 0
    assert os.path.exists(out)

    # int8 deployment artifact through the demo path (--qmodel)
    from modelcompression_tpu.compress import (
        quantize_from_batches, save_qmodel,
    )
    from modelcompression_tpu.models import fold_batchnorm
    rng = np.random.default_rng(4)
    q = quantize_from_batches(
        fold_batchnorm(params, spec), spec,
        [rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)])
    qm = str(tmp_path / "model.qz")
    save_qmodel(qm, q, spec)
    out_q = str(tmp_path / "pred_q.png")
    rc = detect.main(["--cfg", cfg_path, "--qmodel", qm,
                      "--image", img_path, "--out", out_q,
                      "--conf", "0.001", "--names", names])
    assert rc == 0
    assert os.path.exists(out_q)
    assert detect.main(["--cfg", cfg_path, "--image", img_path]) == 2


def test_detect_cli_deployment_preset(tmp_path):
    """detect --deployment: the measured headline NMS configuration
    (conf 0.01, K=32, class-agnostic prefilter 128 — docs/PERF.md) is
    reachable from the public demo surface (VERDICT r2 #4)."""
    from modelcompression_tpu.cli import detect
    from modelcompression_tpu.data.fixtures import tiny_region_cfg

    root = str(tmp_path / "data")
    make_fake_voc(root, n_images=1, image_size=160, seed=9)
    img_path = root + "/images/img0000.png"

    spec_txt = tiny_region_cfg(num_classes=3, width=96, height=96)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    out = str(tmp_path / "pred.png")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--image", img_path, "--out", out, "--deployment"])
    assert rc == 0
    assert os.path.exists(out)


def test_detect_cli_video(tmp_path):
    """detect --video: every frame batched through the fused step (final
    partial batch padded), annotated video written frame-for-frame."""
    import cv2

    from modelcompression_tpu.cli import detect
    from modelcompression_tpu.data.fixtures import tiny_region_cfg

    spec_txt = tiny_region_cfg(num_classes=3, width=96, height=96)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)

    # 5 synthetic frames with a solid fixture-style box, MJPG AVI
    vid = str(tmp_path / "clip.avi")
    wtr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                          (120, 80))
    assert wtr.isOpened()
    rng = np.random.default_rng(0)
    for i in range(5):  # 5 frames, batch 2 -> final partial batch padded
        frame = rng.integers(90, 130, (80, 120, 3), dtype=np.uint8)
        frame[20:60, 30 + 5 * i:80 + 5 * i] = (40, 40, 220)  # BGR red box
        wtr.write(frame)
    wtr.release()

    out = str(tmp_path / "pred.avi")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--video", vid, "--out-video", out,
                      "--batch", "2", "--conf", "0.001"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (80, 120, 3)
        n += 1
    cap.release()
    assert n == 5  # frame-for-frame, no padded rows leaked

    # missing video file is a usage error, not a traceback
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--video", str(tmp_path / "nope.avi")])
    assert rc == 2


def test_eval_cli_nms_switches(tmp_path):
    """--exact-nms and --nms-prefilter reach the pipeline through the
    public CLI surface (truncation audit + deployment prefilter)."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2, image_size=96,
                             seed=12)
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--max-det", "8", "--exact-nms"])
    assert rc == 0
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--nms-prefilter", "16"])
    assert rc == 0


def test_eval_cli_soft_and_diou_nms(tmp_path):
    """--soft-nms / --diou-nms reach the pipeline through the public CLI
    surface; invalid combinations are usage errors, not tracebacks."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2, image_size=96,
                             seed=13)
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--max-det", "8", "--soft-nms", "gaussian"])
    assert rc == 0
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2",
                        "--max-det", "8", "--diou-nms", "--exact-nms"])
    assert rc == 0
    # exclusive combinations fail fast with rc=2
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--soft-nms", "linear",
                        "--exact-nms"])
    assert rc == 2
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--soft-nms", "linear",
                        "--diou-nms"])
    assert rc == 2


def test_eval_cli_int8(tmp_path):
    """eval --int8 through the public CLI surface: full-int8 and hybrid
    (--int8-layers) runs complete; the bitmatch combination is rejected
    up front (a quantized path cannot bit-match)."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=21)
    base = ["--cfg", cfg_path, "--weights", wpath, "--data", data_cfg,
            "--batch", "2"]
    assert eval_cli.main(base + ["--int8", "--calib-images", "2"]) == 0
    assert eval_cli.main(base + ["--int8", "--calib-images", "2",
                                 "--int8-layers", "auto:16",
                                 "--calib-quantile", "0.9999"]) == 0
    assert eval_cli.main(base + ["--int8",
                                 "--precision", "bitmatch"]) == 2


def test_eval_cli_dp_sharded(tmp_path):
    """eval --dp 4: DP inference over the virtual CPU mesh through the
    public CLI surface (SURVEY.md §2.3; numeric equality of the sharded
    step is pinned by tests/test_parallel_eval.py)."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=5)
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "4", "--dp", "4"])
    assert rc == 0
    # indivisible batch is rejected up front
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "3", "--dp", "4"])
    assert rc == 2


def test_finetune_cli_dp_tp(tmp_path):
    """finetune --dp 2 --tp 2: one masked fine-tune over a (2, 2) mesh
    through the public CLI (GSPMD DP grads + TP conv-filter sharding)."""
    from modelcompression_tpu.cli import finetune
    cfg_path, wpath, spec = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=6)
    out = str(tmp_path / "tuned.weights")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "2", "--batch", "2",
                        "--max-boxes", "8", "--dp", "2", "--tp", "2",
                        "--out", out])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_help_surfaces():
    """Every public entry point (the pyproject console scripts) parses
    --help without import errors — the reference's script surface stays
    invocable (BASELINE.json:5)."""
    import pytest
    for mod in ("prune", "finetune", "eval", "train", "detect", "summary",
                "deploy", "export"):
        m = __import__(f"modelcompression_tpu.cli.{mod}",
                       fromlist=["main"])
        with pytest.raises(SystemExit) as e:
            m.main(["--help"])
        assert e.value.code == 0


def test_detect_cli_dir_mode(tmp_path):
    """detect --dir: a directory of variously-usable images runs batched
    through one fused program (batch 2 over 3 images exercises the
    padded final batch) and writes one annotated copy per image."""
    from modelcompression_tpu.cli import detect
    from modelcompression_tpu.data.fixtures import tiny_region_cfg

    root = str(tmp_path / "data")
    make_fake_voc(root, n_images=3, image_size=160, seed=6)
    img_dir = root + "/images"

    spec_txt = tiny_region_cfg(num_classes=3, width=128, height=128)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    names = str(tmp_path / "f.names")
    open(names, "w").write("redbox\ngreenbox\nbluebox\n")

    out_dir = str(tmp_path / "det")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--dir", img_dir, "--out-dir", out_dir,
                      "--batch", "2", "--conf", "0.001",
                      "--names", names])
    assert rc == 0
    written = sorted(os.listdir(out_dir))
    assert written == ["img0000.png", "img0001.png", "img0002.png"]
    # --image and --dir are mutually exclusive; neither is an error
    assert detect.main(["--cfg", cfg_path, "--weights", wpath,
                        "--image", "x.png", "--dir", img_dir]) == 2
    assert detect.main(["--cfg", cfg_path, "--weights", wpath]) == 2

    # --dp: same batched path sharded over a 'data' mesh; identical
    # annotated outputs to the single-device run above
    dp_dir = str(tmp_path / "det_dp")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--dir", img_dir, "--out-dir", dp_dir,
                      "--batch", "2", "--dp", "2", "--conf", "0.001",
                      "--names", names])
    assert rc == 0
    import cv2
    for f in written:
        a = cv2.imread(os.path.join(out_dir, f))
        b = cv2.imread(os.path.join(dp_dir, f))
        np.testing.assert_array_equal(a, b, err_msg=f)
    # invalid compositions fail loudly
    assert detect.main(["--cfg", cfg_path, "--weights", wpath,
                        "--dir", img_dir, "--out-dir", dp_dir,
                        "--batch", "3", "--dp", "2"]) == 2
    assert detect.main(["--cfg", cfg_path, "--weights", wpath,
                        "--image", os.path.join(img_dir, "img0000.png"),
                        "--dp", "2"]) == 2
    # --dp 1 is a real (1-device) mesh, not a silent alias of 0: the
    # --image mode validation applies to it exactly like --dp 2
    # (ADVICE r4)
    assert detect.main(["--cfg", cfg_path, "--weights", wpath,
                        "--image", os.path.join(img_dir, "img0000.png"),
                        "--dp", "1"]) == 2


def test_prep_calibration_validates_and_keeps_tail(tmp_path):
    """The shared calibration helper (round-2 self-review): bad
    selectors/indices fail BEFORE any device work with clean messages,
    and a non-multiple-of-8 image count keeps its tail via padding
    (chunks all fixed-size -> one XLA program) instead of dropping it."""
    import pytest

    from modelcompression_tpu.cli.common import prep_calibration
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    from modelcompression_tpu.data.voc import (
        load_list_dataset, read_data_cfg,
    )

    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=12,
                             image_size=96, seed=8)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))

    sel, chunks, n = prep_calibration(spec, samples, 12, "all")
    assert sel is None and n == 12
    assert [c.shape[0] for c in chunks] == [8, 8]  # 12 images + 4 pad
    # the tail chunk's first 4 rows are the real images 8..11
    np.testing.assert_array_equal(chunks[1][4:8], chunks[1][:4])

    with pytest.raises(ValueError, match="not conv layers"):
        prep_calibration(spec, samples, 4, "999")
    with pytest.raises(ValueError, match="selector"):
        prep_calibration(spec, samples, 4, "auto:abc")


def test_eval_cli_requires_exactly_one_source(tmp_path):
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, _ = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2,
                             image_size=96, seed=9)
    # --weights together with --qmodel would silently ignore --weights
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--qmodel", "x.qz", "--data", data_cfg])
    assert rc == 2


def test_prune_cli_lowrank_rejects_rank_zero(tmp_path):
    from modelcompression_tpu.cli import prune as prune_cli
    cfg_path, wpath, _ = _write_model(tmp_path)
    rc = prune_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--mode", "lowrank", "--rank", "0:0",
                         "--out", str(tmp_path / "o.weights")])
    assert rc == 2


def test_eval_cli_packed_qmodel_roundtrip(tmp_path):
    """eval --int8 --save-qmodel --pack writes an entropy-coded int8
    artifact; eval --qmodel serves it with the identical mAP line."""
    from modelcompression_tpu.cli import eval as eval_cli
    cfg_path, wpath, _ = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4,
                             image_size=96, seed=10)
    qm = str(tmp_path / "m.qz")
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--batch", "2", "--int8",
                        "--calib-images", "2", "--save-qmodel", qm,
                        "--pack"])
    assert rc == 0 and os.path.exists(qm)
    rc = eval_cli.main(["--cfg", cfg_path, "--data", data_cfg,
                        "--batch", "2", "--qmodel", qm])
    assert rc == 0


def _write_v3_model(tmp_path, num_classes=3, net=64):
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
    spec_txt = tiny_yolo3_cfg(num_classes=num_classes, width=net, height=net)
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "v3.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, wpath, spec


def test_train_cli_smoke_v3(tmp_path):
    """train CLI on a [yolo] multi-head spec: 2 steps through the v3
    forward + yolo loss, final checkpoint written."""
    from modelcompression_tpu.cli import train as train_cli
    cfg_path, wpath, spec = _write_v3_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=21)
    ckdir = str(tmp_path / "ck")
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "2", "--batch", "2",
                         "--max-boxes", "8", "--checkpoint-dir", ckdir])
    assert rc == 0
    from modelcompression_tpu.utils.checkpoint import latest_checkpoint
    assert latest_checkpoint(ckdir) is not None


def test_finetune_iterate_v3(tmp_path):
    """One iterative prune->finetune->eval round on the v3 fixture: the
    structured criterion must slim only the graph-prunable convs (head
    producers and the shortcut-tied pair keep full width) and the slimmed
    multi-head model must finetune + eval end to end."""
    from modelcompression_tpu.cli import finetune
    from modelcompression_tpu.models import load_weights
    cfg_path, wpath, spec = _write_v3_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=22)
    out = str(tmp_path / "slim.weights")
    out_cfg = str(tmp_path / "slim.cfg")
    rc = finetune.main([
        "--cfg", cfg_path, "--weights", wpath,
        "--data", data_cfg, "--steps", "2", "--batch", "2",
        "--max-boxes", "8", "--iterate", "0.25",
        "--iterate-mode", "l1_filter",
        "--out", out, "--out-cfg", out_cfg,
    ])
    assert rc == 0
    slim = load_cfg(out_cfg)
    assert slim.is_multi_head
    # protected: head producers (decode contract) + shortcut-tied pair
    det = 2 * (5 + 3)
    assert slim.layers[9].filters == det
    assert slim.layers[16].filters == det
    assert slim.layers[2].filters == 32 and slim.layers[5].filters == 32
    # prunable convs slimmed by 25%
    assert slim.layers[0].filters == 12
    slim_params, _ = load_weights(out, slim)
    assert len(slim_params) == len(slim.conv_indices())


def test_detect_cli_smoke_v3(tmp_path):
    """detect on a multi-head [yolo] spec: the fused program decodes both
    scales (decode_heads) and draws source-pixel boxes; the int8 qmodel
    artifact serves through the same path."""
    from modelcompression_tpu.cli import detect

    root = str(tmp_path / "data")
    make_fake_voc(root, n_images=1, image_size=160, seed=23)
    img_path = root + "/images/img0000.png"
    cfg_path, wpath, spec = _write_v3_model(tmp_path)
    names = str(tmp_path / "f.names")
    open(names, "w").write("redbox\ngreenbox\nbluebox\n")

    out = str(tmp_path / "pred.png")
    rc = detect.main(["--cfg", cfg_path, "--weights", wpath,
                      "--image", img_path, "--out", out,
                      "--conf", "0.001", "--names", names])
    assert rc == 0
    assert os.path.exists(out)

    from modelcompression_tpu.compress import (
        quantize_from_batches, save_qmodel,
    )
    from modelcompression_tpu.models import fold_batchnorm
    rng = np.random.default_rng(24)
    q = quantize_from_batches(
        fold_batchnorm(init_params(spec, jax.random.key(0)), spec), spec,
        [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)])
    qpath = str(tmp_path / "v3.qz")
    save_qmodel(qpath, q, spec)
    out_q = str(tmp_path / "pred_q.png")
    rc = detect.main(["--cfg", cfg_path, "--qmodel", qpath,
                      "--image", img_path, "--out", out_q,
                      "--conf", "0.001", "--names", names])
    assert rc == 0
    assert os.path.exists(out_q)
