"""SavedModel export (cli/export.py): the fused serving program converts
to TF, reloads, and matches the live JAX program (the CLI verifies this
itself — rc 0 means the reload-and-compare passed)."""

import os

import jax
import numpy as np
import pytest

from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import (
    fold_batchnorm, init_params, parse_cfg, save_weights,
)

tf = pytest.importorskip("tensorflow")


def _model(tmp_path, seed=0):
    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    cfg_path = str(tmp_path / "tiny.cfg")
    open(cfg_path, "w").write(txt)
    spec = parse_cfg(txt)
    params = init_params(spec, jax.random.key(seed))
    w_path = str(tmp_path / "w.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, w_path, spec, params


def test_export_savedmodel_roundtrip(tmp_path):
    from modelcompression_tpu.cli import export

    cfg_path, w_path, spec, _ = _model(tmp_path)
    out = str(tmp_path / "sm")
    rc = export.main(["--cfg", cfg_path, "--weights", w_path,
                      "--out", out, "--batch", "2", "--conf", "0.001"])
    assert rc == 0  # includes the CLI's own reload-and-compare
    assert os.path.exists(os.path.join(out, "saved_model.pb"))

    # independent serve: TF alone produces detections with the right
    # shapes and pixel-range boxes
    m = tf.saved_model.load(out)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    boxes, scores, valid, n_cand, n_any = m.serve(
        imgs, np.full((2,), 64.0, np.float32),
        np.full((2,), 64.0, np.float32))
    assert boxes.shape[:2] == (2, 3) and boxes.shape[-1] == 4
    assert scores.shape == valid.shape == boxes.shape[:3]
    assert n_cand.shape == (2, 3) and n_any.shape == (2,)

    # usage errors
    assert export.main(["--cfg", cfg_path, "--out", out]) == 2
    assert export.main(["--cfg", cfg_path, "--weights", w_path,
                        "--out", out, "--batch", "0"]) == 2


def test_export_savedmodel_yolov3(tmp_path):
    """Multi-head [yolo] specs export through the same path: decode_heads
    fuses the per-scale maps inside the one serving program, so the TF
    graph signature is identical to the v2 family's."""
    from modelcompression_tpu.cli import export
    from modelcompression_tpu.data.fixtures import tiny_yolo3_cfg
    from modelcompression_tpu.models import dump_cfg

    txt = tiny_yolo3_cfg(num_classes=3, width=64, height=64)
    spec = parse_cfg(txt)
    assert spec.is_multi_head
    cfg_path = str(tmp_path / "v3.cfg")
    open(cfg_path, "w").write(dump_cfg(spec))
    params = init_params(spec, jax.random.key(3))
    w_path = str(tmp_path / "v3.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)

    out = str(tmp_path / "sm_v3")
    rc = export.main(["--cfg", cfg_path, "--weights", w_path,
                      "--out", out, "--batch", "1", "--conf", "0.001"])
    assert rc == 0  # includes the CLI's own reload-and-compare
    m = tf.saved_model.load(out)
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    boxes, scores, valid, n_cand, n_any = m.serve(
        imgs, np.full((1,), 96.0, np.float32),
        np.full((1,), 72.0, np.float32))
    assert boxes.shape[:2] == (1, 3) and boxes.shape[-1] == 4
    assert scores.shape == valid.shape == boxes.shape[:3]


def test_export_tflite_roundtrip(tmp_path):
    """--tflite converts the SAME fused serving program to builtin-only
    TFLite ops (the CLI's own reload-and-compare gates rc 0), and the
    flatbuffer runs standalone in the stock TFLite interpreter."""
    from modelcompression_tpu.cli import export

    cfg_path, w_path, spec, _ = _model(tmp_path)
    out = str(tmp_path / "model.tflite")
    rc = export.main(["--cfg", cfg_path, "--weights", w_path,
                      "--out", out, "--tflite", "--batch", "2",
                      "--conf", "0.001", "--max-det", "8"])
    assert rc == 0  # includes the CLI's reload-and-compare vs live JAX
    assert os.path.getsize(out) > 0

    # independent serve: TFLite interpreter alone, correct shapes
    interp = tf.lite.Interpreter(model_path=out)
    interp.allocate_tensors()
    rng = np.random.default_rng(1)
    feeds = {"images": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
             "width": np.full((2,), 64.0, np.float32),
             "height": np.full((2,), 64.0, np.float32)}
    for d in interp.get_input_details():
        key = next(k for k in feeds if k in d["name"])
        interp.set_tensor(d["index"], feeds[key])
    interp.invoke()
    outs = [interp.get_tensor(d["index"])
            for d in interp.get_output_details()]
    assert len(outs) == 5
    assert outs[0].shape == (2, 3, 8, 4)  # boxes (B, C, K, 4)

    # dynamic-range quantization: still converts + runs, smaller file
    out_q = str(tmp_path / "model_dyn.tflite")
    rc = export.main(["--cfg", cfg_path, "--weights", w_path,
                      "--out", out_q, "--tflite", "--batch", "2",
                      "--tflite-quantize", "dynamic",
                      "--conf", "0.001", "--max-det", "8"])
    assert rc == 0
    assert os.path.getsize(out_q) < 0.5 * os.path.getsize(out)

    # usage errors: bf16 has no TFLite legalization; quantize flag is
    # tflite-only
    assert export.main(["--cfg", cfg_path, "--weights", w_path,
                        "--out", out, "--tflite",
                        "--precision", "fast"]) == 2
    assert export.main(["--cfg", cfg_path, "--weights", w_path,
                        "--out", out,
                        "--tflite-quantize", "dynamic"]) == 2


def test_export_tflite_rejects_qmodel(tmp_path):
    """qmodel artifacts bake bf16 hybrid float convs — TFLite has no
    bf16, so the combination is rejected up front with guidance."""
    from modelcompression_tpu.cli import export
    from modelcompression_tpu.compress import (
        quantize_from_batches, save_qmodel,
    )

    cfg_path, w_path, spec, params = _model(tmp_path, seed=1)
    rng = np.random.default_rng(2)
    q = quantize_from_batches(
        fold_batchnorm(params, spec), spec,
        [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)])
    qm = str(tmp_path / "model.qz")
    save_qmodel(qm, q, spec)
    rc = export.main(["--cfg", cfg_path, "--qmodel", qm,
                      "--out", str(tmp_path / "m.tflite"), "--tflite"])
    assert rc == 2


def test_export_qmodel(tmp_path):
    """int8 deployment artifacts export too (quantized grids baked in)."""
    from modelcompression_tpu.cli import export
    from modelcompression_tpu.compress import (
        quantize_from_batches, save_qmodel,
    )

    cfg_path, w_path, spec, params = _model(tmp_path, seed=1)
    rng = np.random.default_rng(2)
    q = quantize_from_batches(
        fold_batchnorm(params, spec), spec,
        [rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)])
    qm = str(tmp_path / "model.qz")
    save_qmodel(qm, q, spec)
    out = str(tmp_path / "sm_q")
    rc = export.main(["--cfg", cfg_path, "--qmodel", qm,
                      "--out", out, "--batch", "1", "--conf", "0.001"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "saved_model.pb"))

    # the hybrid's float convs are bf16 by construction: a 'bitmatch'
    # export of an int8 artifact would be a false claim — rejected
    rc = export.main(["--cfg", cfg_path, "--qmodel", qm,
                      "--out", out, "--precision", "bitmatch"])
    assert rc == 2
