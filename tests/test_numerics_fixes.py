"""Regression tests for the Darknet-parity findings of the round-2 core
numerics review: rescore stop-gradient, devkit +1 IoU, odd-maxpool padding
centering, .weights header guard, bias_match=0 and softmax=0 paths,
M=0 targets."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from modelcompression_tpu.evaluation.voc_map import (
    Detection, GroundTruth, class_ap,
)
from modelcompression_tpu.models.cfg import MaxPoolLayer, RegionLayer
from modelcompression_tpu.models.darknet import maxpool
from modelcompression_tpu.models.weights_io import _seen_dtype
from modelcompression_tpu.train.region_loss import region_loss


def tiny_region(**kw):
    base = dict(anchors=(1.0, 1.0, 3.0, 3.0), classes=3, num=2,
                rescore=True, thresh=0.6, object_scale=1.0,
                noobject_scale=0.0, class_scale=0.0, coord_scale=0.0)
    base.update(kw)
    return RegionLayer(**base)


def test_rescore_iou_target_is_stop_gradient():
    """With only the objectness term active (rescore target = IoU), the
    gradient must reach ONLY the objectness logit — none may leak into the
    box coordinates through the IoU 'target' (Darknet treats it as a
    constant)."""
    region = tiny_region()
    b, h, w, a, c = 1, 2, 2, 2, 3
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(0, 0.5, (b, h, w, a * (5 + c)))
                      .astype(np.float32))
    targets = np.zeros((1, 2, 5), np.float32)
    targets[0, 0] = [1, 0.3, 0.3, 0.4, 0.4]
    targets = jnp.asarray(targets)

    g = jax.grad(lambda r: region_loss(r, targets, region,
                                       jnp.asarray(10 ** 9)).loss)(raw)
    g = np.asarray(g).reshape(b, h, w, a, 5 + c)
    # coordinate slots 0..3 must receive zero gradient
    np.testing.assert_allclose(g[..., :4], 0.0, atol=1e-8)
    # objectness slot must receive a nonzero gradient at the assigned cell
    assert np.abs(g[..., 4]).max() > 0


def test_devkit_iou_convention_flips_small_box_match():
    """GT (0,0,2,2) vs det (1,0,3,2): continuous IoU = 1/3 (FP at 0.5),
    devkit +1 IoU = 0.5 (TP) — the voc_eval.py convention."""
    gts = [GroundTruth("im", (0, 0, 2, 2))]
    dets = [Detection("im", 0.9, (1, 0, 3, 2))]
    assert abs(class_ap(dets, gts, devkit_iou=True) - 1.0) < 1e-9
    assert class_ap(dets, gts, devkit_iou=False) == 0.0


def np_darknet_maxpool(x, k, s):
    """Oracle: maxpool_layer.c forward (offset -(k-1)//2, -inf OOB)."""
    h, w, c = x.shape
    pad = k - 1
    off = -(pad // 2)
    oh = (h + pad - k) // s + 1
    ow = (w + pad - k) // s + 1
    out = np.full((oh, ow, c), -np.inf, np.float32)
    for i in range(oh):
        for j in range(ow):
            for di in range(k):
                for dj in range(k):
                    y, xx = i * s + di + off, j * s + dj + off
                    if 0 <= y < h and 0 <= xx < w:
                        out[i, j] = np.maximum(out[i, j], x[y, xx])
    return out


def test_maxpool_odd_size_centers_padding():
    rng = np.random.default_rng(1)
    for k, s, hw in ((3, 1, 7), (3, 2, 9), (2, 2, 8), (2, 1, 6), (5, 2, 11)):
        x = rng.normal(0, 1, (hw, hw, 4)).astype(np.float32)
        want = np_darknet_maxpool(x, k, s)
        got = np.asarray(maxpool(jnp.asarray(x)[None],
                                 MaxPoolLayer(size=k, stride=s)))[0]
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"size={k} stride={s}")


def test_seen_dtype_transposed_format_guard():
    assert _seen_dtype(0, 1) == np.int32
    assert _seen_dtype(0, 2) == np.int64
    assert _seen_dtype(1, 0) == np.int64
    # major/minor >= 1000 marks the ancient transposed format: 4-byte seen
    assert _seen_dtype(1000, 0) == np.int32
    assert _seen_dtype(0, 1000) == np.int32


def test_region_loss_bias_match_and_softmax_variants():
    rng = np.random.default_rng(2)
    raw = jnp.asarray(rng.normal(0, 0.5, (2, 3, 3, 2 * 8)).astype(np.float32))
    targets = np.zeros((2, 3, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    targets = jnp.asarray(targets)
    seen = jnp.asarray(0)

    base = tiny_region(class_scale=1.0, coord_scale=1.0)
    for bias_match in (True, False):
        for softmax in (True, False):
            region = dataclasses.replace(base, bias_match=bias_match,
                                         softmax=softmax)
            m = region_loss(raw, targets, region, seen)
            assert np.isfinite(float(m.loss)), (bias_match, softmax)
    # the variants must actually differ (the flags do something)
    m_sm = region_loss(raw, targets, dataclasses.replace(base, softmax=True),
                       seen)
    m_ls = region_loss(raw, targets,
                       dataclasses.replace(base, softmax=False), seen)
    assert float(m_sm.loss_cls) != float(m_ls.loss_cls)


def test_pallas_mask_prunes_preexisting_zeros_at_tau_zero():
    """When the k-th smallest |w| is exactly 0.0 (re-pruning already-pruned
    weights), the Pallas mask path must still prune n_zero elements — the
    tau-1 underflow guard previously zeroed the tie budget and pruned
    NOTHING (confirmed by execution in review)."""
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    from modelcompression_tpu.models import init_params, parse_cfg
    from modelcompression_tpu.models.darknet import conv_key
    from modelcompression_tpu.ops.pallas_topk import (
        pallas_magnitude_masks_perlayer,
    )
    from modelcompression_tpu.compress.criteria import (
        magnitude_masks_perlayer,
    )

    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=32, height=32))
    params = init_params(spec, jax.random.key(0))
    # pre-zero 60% of the first conv; then ask for 50% sparsity — the
    # threshold value is exactly 0.0 in that segment
    k0 = conv_key(spec.conv_indices()[0])
    w = np.asarray(params[k0]["w"]).copy()
    flat = w.reshape(-1)
    flat[: int(0.6 * flat.size)] = 0.0
    params = dict(params, **{k0: dict(params[k0], w=jnp.asarray(w))})

    mp = pallas_magnitude_masks_perlayer(params, spec, 0.5)
    mx = magnitude_masks_perlayer(params, spec, 0.5)
    for k in mx:
        np.testing.assert_array_equal(
            np.asarray(mp[k]), np.asarray(mx[k]),
            err_msg=f"pallas mask != xla mask for {k} (tau==0 case)")
    n_pruned = int((~np.asarray(mp[k0])).sum())
    assert n_pruned == int(0.5 * flat.size)


def test_checkpoint_namedtuple_field_order(tmp_path):
    """orbax restore with a target must re-hang leaves BY NAME: a
    NamedTuple whose fields are not alphabetical flattens in field order
    while its restored dict flattens in sorted-key order — order-based
    unflattening silently permutes the optimizer state."""
    import collections
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    from modelcompression_tpu.models import parse_cfg
    from modelcompression_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    P = collections.namedtuple("P", ["zulu", "alpha"])  # non-alphabetical
    spec = parse_cfg(tiny_region_cfg(num_classes=3, width=32, height=32))
    state = {"opt": P(zulu=np.full((3,), 1.0, np.float32),
                      alpha=np.full((3,), 2.0, np.float32)),
             "step": np.asarray(7)}
    d = save_checkpoint(str(tmp_path / "ck"), 1, spec, state)
    target = {"opt": P(zulu=np.zeros((3,), np.float32),
                       alpha=np.zeros((3,), np.float32)),
              "step": np.asarray(0)}
    _, restored, _ = load_checkpoint(d, target=target)
    np.testing.assert_array_equal(np.asarray(restored["opt"].zulu),
                                  np.full((3,), 1.0))
    np.testing.assert_array_equal(np.asarray(restored["opt"].alpha),
                                  np.full((3,), 2.0))


def test_region_loss_zero_gt_slots():
    region = tiny_region(class_scale=1.0, coord_scale=1.0)
    raw = jnp.zeros((1, 2, 2, 2 * 8), jnp.float32)
    m = region_loss(raw, jnp.zeros((1, 0, 5)), region, jnp.asarray(0))
    assert np.isfinite(float(m.loss))
    assert float(m.n_gt) == 0.0
