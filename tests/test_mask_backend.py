"""Production mask-path wiring (VERDICT r1 #1).

The magnitude/global criteria have three property-tested-equal
implementations (compress/backend.py); these tests pin that (a) the
selector maps names to the exact function objects, and (b) the PUBLIC
surfaces — prune CLI and the iterative loop via the finetune CLI — call
the one-program fused path by DEFAULT (the per-shape argsort reference
path costs one remote compile per conv shape on the TPU tunnel,
ops/topk_mask.py:5-8, so defaulting to it would re-open the compile trap
the fused kernels exist to close)."""

import jax
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    DEFAULT_MASK_BACKEND, magnitude_mask_fn,
)
from modelcompression_tpu.compress import criteria
from modelcompression_tpu.data.fixtures import make_fake_voc, tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg, save_weights
from modelcompression_tpu.ops import pallas_topk, topk_mask


def test_selector_maps_backends_to_exact_functions():
    assert DEFAULT_MASK_BACKEND == "fused"
    assert magnitude_mask_fn("magnitude") is topk_mask.magnitude_masks_perlayer
    assert magnitude_mask_fn("global") is topk_mask.magnitude_masks_global
    assert magnitude_mask_fn("magnitude", "pallas") \
        is pallas_topk.pallas_magnitude_masks_perlayer
    assert magnitude_mask_fn("global", "pallas") \
        is pallas_topk.pallas_magnitude_masks_global
    assert magnitude_mask_fn("magnitude", "reference") \
        is criteria.magnitude_masks_perlayer
    assert magnitude_mask_fn("global", "reference") \
        is criteria.magnitude_masks_global
    with pytest.raises(ValueError):
        magnitude_mask_fn("l1_filter")
    with pytest.raises(ValueError):
        magnitude_mask_fn("magnitude", "cuda")


def _spy(monkeypatch, module, name):
    """Wrap ``module.name`` to record calls (the selector resolves the
    attribute at call time, so patching the module attr intercepts the
    production dispatch)."""
    calls = []
    real = getattr(module, name)

    def wrapper(*a, **kw):
        calls.append(name)
        return real(*a, **kw)

    monkeypatch.setattr(module, name, wrapper)
    return calls


def _write_model(tmp_path, net=64):
    spec_txt = tiny_region_cfg(num_classes=3, width=net, height=net)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(spec_txt)
    spec = parse_cfg(spec_txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, wpath


def test_prune_cli_defaults_to_fused_path(tmp_path, monkeypatch):
    from modelcompression_tpu.cli import prune
    cfg_path, wpath = _write_model(tmp_path)
    fused = _spy(monkeypatch, topk_mask, "magnitude_masks_perlayer")
    fused_g = _spy(monkeypatch, topk_mask, "magnitude_masks_global")
    ref = _spy(monkeypatch, criteria, "magnitude_masks_perlayer")

    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "magnitude", "--sparsity", "0.5",
                     "--out", str(tmp_path / "m.weights")])
    assert rc == 0
    assert fused and not ref

    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "global", "--sparsity", "0.5",
                     "--out", str(tmp_path / "g.weights")])
    assert rc == 0
    assert fused_g and not ref


def test_prune_cli_reference_backend_optin(tmp_path, monkeypatch):
    from modelcompression_tpu.cli import prune
    cfg_path, wpath = _write_model(tmp_path)
    fused = _spy(monkeypatch, topk_mask, "magnitude_masks_perlayer")
    ref = _spy(monkeypatch, criteria, "magnitude_masks_perlayer")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "magnitude", "--sparsity", "0.5",
                     "--mask-backend", "reference",
                     "--out", str(tmp_path / "r.weights")])
    assert rc == 0
    assert ref and not fused


def test_finetune_iterate_magnitude_uses_fused_path(tmp_path, monkeypatch):
    """The iterative loop's magnitude mode recomputes masks EVERY round —
    the exact workload the one-program path exists for. The finetune CLI
    must reach it by default (``--use-pallas`` selects the Mosaic twins)."""
    from modelcompression_tpu.cli import finetune
    cfg_path, wpath = _write_model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=4, image_size=96,
                             seed=7)
    fused = _spy(monkeypatch, topk_mask, "magnitude_masks_perlayer")
    ref = _spy(monkeypatch, criteria, "magnitude_masks_perlayer")
    rc = finetune.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", data_cfg, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8", "--iterate", "0.5",
                        "--iterate-mode", "magnitude",
                        "--out", str(tmp_path / "t.weights")])
    assert rc == 0
    assert fused and not ref
