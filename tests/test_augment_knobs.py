"""Cfg-driven augmentation knobs (SURVEY.md §5.6, A.3; VERDICT r1 #2):
the [net] hue/saturation/exposure values and the [region] jitter value
must reach the jitted train step — a cfg with non-default knobs trains
with THOSE distortion ranges, not the hard-coded defaults.

[net] angle= is intentionally N/A: Darknet's detector data path applies
no rotation (angle only affects the classifier pipeline), so the parity-
faithful behavior is to parse/round-trip it (models/cfg.py) and never
apply it (documented at TrainConfig.hue)."""

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.train import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from modelcompression_tpu.train import train_step as train_step_mod


def _knobby_cfg_text():
    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    assert "hue" not in txt
    txt = txt.replace("[net]",
                      "[net]\nhue=0.25\nsaturation=2.0\nexposure=1.2\n"
                      "angle=7\n", 1)
    txt = txt.replace("jitter=.2", "jitter=.1")
    return txt


def test_from_spec_threads_cfg_knobs():
    spec = parse_cfg(_knobby_cfg_text())
    assert spec.net.hue == 0.25
    assert spec.net.saturation == 2.0
    assert spec.net.exposure == 1.2
    assert spec.net.angle == 7.0  # parsed + round-tripped, never applied
    config = TrainConfig.from_spec(spec)
    assert config.hue == 0.25
    assert config.saturation == 2.0
    assert config.exposure == 1.2
    assert config.augment_jitter == 0.1  # [region] jitter via from_spec
    # overrides still win (the CLIs' --jitter flag)
    assert TrainConfig.from_spec(spec, augment_jitter=0.0).augment_jitter \
        == 0.0


def test_train_step_applies_cfg_knobs(monkeypatch):
    """One real train step with a non-default-knob cfg: the distortion
    calls inside the jitted program must receive the cfg's ranges. The
    augment fns are called at TRACE time, so spy wrappers capture the
    exact kwargs the compiled program was built with."""
    spec = parse_cfg(_knobby_cfg_text())
    config = TrainConfig.from_spec(spec, augment_hsv=True)
    assert config.augment_jitter == 0.1

    seen_hsv = {}
    real_hsv = train_step_mod.distort_hsv

    def spy_hsv(x, rng, **kw):
        seen_hsv.update(kw)
        return real_hsv(x, rng, **kw)

    seen_jitter = {}
    real_jitter = train_step_mod.random_jitter

    def spy_jitter(x, t, rng, **kw):
        seen_jitter.update(kw)
        return real_jitter(x, t, rng, **kw)

    monkeypatch.setattr(train_step_mod, "distort_hsv", spy_hsv)
    monkeypatch.setattr(train_step_mod, "random_jitter", spy_jitter)

    params = init_params(spec, jax.random.key(0))
    tx = make_optimizer(config)
    state = TrainState.create(params, tx, jax.random.key(1))
    step_fn = make_train_step(spec, config, tx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    state, metrics = step_fn(state, images, jnp.asarray(targets))

    assert np.isfinite(float(metrics["loss"]))
    assert seen_hsv == {"hue": 0.25, "sat": 2.0, "expo": 1.2}
    assert seen_jitter == {"jitter": 0.1}
