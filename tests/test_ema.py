"""EMA weights for fine-tuning (TrainConfig.ema_decay, beyond the
reference): the jitted step folds ema = d*ema + (1-d)*params after every
update; the finetune CLI saves/evals the EMA model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)


def _setup(ema_decay, spec_seed=0, **cfg_kw):
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(spec_seed))
    cfg = TrainConfig.from_spec(spec, augment_flip=False, subdivisions=1,
                                max_boxes=5, ema_decay=ema_decay, **cfg_kw)
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx, jax.random.key(1),
                              ema=ema_decay > 0)
    step = make_train_step(spec, cfg, tx)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))
    tg = np.zeros((2, 5, 5), np.float32)
    tg[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    return spec, state, step, imgs, jnp.asarray(tg)


def test_ema_matches_host_fold():
    """After N steps, the in-program EMA equals the host-side fold of the
    per-step param snapshots (exactly the defined recurrence — weights
    AND BN running stats)."""
    d = 0.5
    spec, state, step, imgs, tg = _setup(d)
    expected = jax.tree.map(np.asarray, state["params"])  # ema_0 = params_0
    for _ in range(3):
        state, _ = step(state, imgs, tg)
        live = jax.tree.map(np.asarray, state["params"])
        expected = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                expected, live)
    got = jax.tree.map(np.asarray, state["ema_params"])
    flat_g, _ = jax.tree.flatten(got)
    flat_e, _ = jax.tree.flatten(expected)
    for g, e in zip(flat_g, flat_e):
        np.testing.assert_allclose(g, e, rtol=2e-5, atol=2e-6)
    # and the EMA genuinely differs from the live iterate
    flat_l, _ = jax.tree.flatten(jax.tree.map(np.asarray, state["params"]))
    assert any(np.max(np.abs(g - l)) > 1e-7
               for g, l in zip(flat_g, flat_l))


def test_ema_keeps_pruned_weights_zero():
    """Masked fine-tune: once-pruned weights are exactly zero on BOTH the
    live and the EMA side (0*d + 0*(1-d) = 0)."""
    spec, state, step, imgs, tg = _setup(0.9)
    k = [kk for kk in state["params"] if kk.startswith("conv")][0]
    w = np.asarray(state["params"][k]["w"])
    mask = np.ones_like(w)
    mask.reshape(-1)[::2] = 0.0
    state["weight_masks"] = {k: jnp.asarray(mask)}
    state["params"][k]["w"] = jnp.asarray(w * mask)
    state["ema_params"][k]["w"] = jnp.asarray(w * mask)
    for _ in range(2):
        state, _ = step(state, imgs, tg)
    assert np.all(np.asarray(state["params"][k]["w"])[mask == 0] == 0)
    assert np.all(np.asarray(state["ema_params"][k]["w"])[mask == 0] == 0)


def test_ema_requires_ema_state():
    spec, state, step, imgs, tg = _setup(0.9)
    del state["ema_params"]
    with pytest.raises(ValueError, match="ema=True"):
        step(state, imgs, tg)


def test_ema_state_without_decay_is_carried():
    """A state created with ema=True but trained with decay 0 carries the
    buffer untouched (resume-compat: flipping the flag later restarts the
    fold from the carried shadow)."""
    spec, state, step, imgs, tg = _setup(0.0)
    state["ema_params"] = jax.tree.map(lambda v: jnp.array(v, copy=True),
                                       state["params"])
    before = jax.tree.map(np.asarray, state["ema_params"])
    state, _ = step(state, imgs, tg)
    after = jax.tree.map(np.asarray, state["ema_params"])
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_finetune_cli_ema_smoke(tmp_path):
    """finetune --ema: the saved .weights are the EMA model (differ from
    a --ema-free run of the identical seed/steps) and remain loadable."""
    import os

    from modelcompression_tpu.cli import finetune
    from modelcompression_tpu.data.fixtures import make_fake_voc
    from modelcompression_tpu.models import load_weights, save_weights

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    cfg_path = str(tmp_path / "net.cfg")
    from modelcompression_tpu.models import dump_cfg
    open(cfg_path, "w").write(dump_cfg(spec))
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    data_cfg = make_fake_voc(str(tmp_path / "voc"), n_images=2,
                             image_size=96, seed=3)

    base = ["--cfg", cfg_path, "--weights", wpath, "--data", data_cfg,
            "--steps", "3", "--batch", "2", "--subdivisions", "1",
            "--max-boxes", "5"]
    out_ema = str(tmp_path / "ema.weights")
    out_live = str(tmp_path / "live.weights")
    assert finetune.main(base + ["--out", out_ema,
                                 "--ema", "0.8"]) == 0
    assert finetune.main(base + ["--out", out_live]) == 0
    pe, _ = load_weights(out_ema, spec)
    pl, _ = load_weights(out_live, spec)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(pe), jax.tree.leaves(pl))]
    assert max(diffs) > 0  # EMA endpoint differs from the live iterate
    assert os.path.getsize(out_ema) == os.path.getsize(out_live)

    # validation: --ema outside (0,1) and with --iterate are rejected
    assert finetune.main(base + ["--out", out_ema, "--ema", "1.5"]) == 2
    assert finetune.main(base + ["--out", out_ema, "--ema", "0.8",
                                 "--iterate", "0.5"]) == 2
