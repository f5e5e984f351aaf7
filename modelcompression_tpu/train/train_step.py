"""Training / fine-tuning step — one jitted XLA program (SURVEY.md §3.4
rebuilt TPU-first; BASELINE.json:5 "conv forward/backward become jitted
XLA" with preprocessing fused in).

Design:

* **State** is a pure pytree (params, BN running stats inside params,
  optax opt_state, step counter, seen-images counter, PRNG key, masks).
* **The whole step** — normalize + augment (flip/mosaic/HSV) + forward with
  batch stats + region loss + backward + SGD update + mask re-apply + BN
  running-stat update — is ONE ``jax.jit``-compiled program. Nothing
  round-trips to host (the north-star's core demand).
* **Masked fine-tune**: unstructured masks multiply weights *inside* the
  loss (w_eff = w * mask), so gradients to pruned weights are exactly zero
  and the post-update re-zeroing is a no-op kept only as belt-and-braces;
  structured (channel) masks gate conv outputs post-activation
  (see compress/repack.py).
* **Parallelism** (SURVEY.md §2.3): batch sharded over the mesh 'data'
  axis, params replicated (or TP-sharded on conv channel dims over
  'model'); GSPMD inserts the gradient all-reduce over ICI. BN batch stats
  are computed inside jit, so cross-device batch statistics are a psum —
  synchronized BN for free.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from modelcompression_tpu.core.precision import Precision, FAST
from modelcompression_tpu.models.cfg import ConvLayer, NetworkSpec
from modelcompression_tpu.models.darknet import (
    BN_EPS, Params, _activate, _conv, conv_bn_act, conv_key, maxpool, reorg,
    route_part, upsample_nearest,
)
from modelcompression_tpu.models.cfg import (
    MaxPoolLayer, RegionLayer, ReorgLayer, RouteLayer, ShortcutLayer,
    UpsampleLayer, YoloLayer,
)
from modelcompression_tpu.train.yolo_loss import detection_loss
from modelcompression_tpu.data.preprocess import (
    distort_hsv, mosaic4, random_flip, random_jitter,
)
from modelcompression_tpu.compress.qat import (
    QATSpec, fake_quant, fake_quant_weight,
)
from modelcompression_tpu.compress.gmp import GMPSpec, gmp_mask_update
from modelcompression_tpu.train.distill import (
    DistillPlan, detection_distill_loss, teacher_forward,
)

BN_MOMENTUM = 0.1  # torch BatchNorm2d default (reference repo class)


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    momentum: float = 0.9
    decay: float = 5e-4
    # Darknet [net] subdivisions: the step takes the FULL effective batch
    # (cfg batch=) and scans `subdivisions` micro-batches inside the one
    # jitted program, accumulating gradients into a single SGD update —
    # so the shipped cfgs train at Darknet's effective batch and `seen`/
    # `steps=` count the same units (SURVEY.md §5.6; VERDICT r1 #3).
    # BN batch statistics are per-micro-batch, Darknet-faithful; set
    # subdivisions=1 on TPU when memory allows for big-batch sync-BN and
    # maximum MXU occupancy (identical gradients up to BN statistics).
    subdivisions: int = 1
    burn_in: int = 0
    policy: str = "steps"   # constant | steps | poly | exp | sig
    max_batches: int = 80200
    power: float = 4.0      # poly exponent / exp-gamma-ish (Darknet default)
    gamma: float = 1.0      # exp/sig decay rate
    step: int = 1           # [net] step= for the 'step' policy
    steps: Tuple[int, ...] = ()
    scales: Tuple[float, ...] = ()
    precision: Precision = FAST
    augment_flip: bool = True
    augment_mosaic: bool = False
    augment_hsv: bool = False
    # Darknet crop jitter fraction ([region] jitter=); 0 disables.
    # from_spec fills it from the cfg so the fine-tune/train surfaces
    # train with the reference's crop augmentation by default.
    augment_jitter: float = 0.0
    # Darknet [net] HSV distortion knobs (image.c random_distort_image),
    # applied when augment_hsv is on; from_spec fills them from the cfg.
    # [net] angle= is deliberately NOT implemented: Darknet's detector
    # data path (load_data_detection) never applies rotation — angle only
    # affects the classifier pipeline — so rotation augment would be a
    # parity DIVERGENCE, not a gap (SURVEY.md §5.6).
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5
    max_boxes: int = 30
    # rematerialize each conv block in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(layers) less activation HBM.
    # Off by default — full YOLOv2 at batch 64/416 fits a v5 lite without
    # it (measured); enable for larger batch/resolution configs.
    remat: bool = False
    # quantization-aware fine-tune plan (compress/qat.py): when set, the
    # selected convs train with the deployed int8 grids simulated in the
    # forward (fake-quant weights per channel, activations on the static
    # calibrated scales, straight-through gradients). Still ONE jitted
    # program — the spec only adds compile-time scalar constants.
    qat: Optional["QATSpec"] = None
    # network-slimming sparsity training (Liu et al. 2017): L1 penalty
    # bn_l1 * sum|gamma| over all BN scales, polarizing channel
    # importances toward zero before a bn_gamma structured prune
    # (compress/criteria.bn_gamma_scores_device). 0 disables.
    bn_l1: float = 0.0
    # gradual magnitude pruning (compress/gmp.py): when set, the weight
    # masks in the train state are RECOMPUTED on device inside the step on
    # the spec's cubic schedule (lax.cond-gated segmented bisection) —
    # sparsify-while-training as an alternative to prune-then-fine-tune.
    # TrainState must be created with weight_masks=gmp_init_masks(...).
    gmp: Optional["GMPSpec"] = None
    # exponential moving average of the FULL param pytree (weights AND BN
    # running stats — the modern-YOLO convention; beyond the reference,
    # which serves the last SGD iterate): ema = d*ema + (1-d)*params
    # after every update, inside the same jitted program (one fused
    # elementwise pass, no extra HBM round trips beyond the EMA buffers).
    # 0 disables. Requires TrainState.create(..., ema=True). Typical
    # decay 0.999-0.9999 for thousand-step fine-tunes. Pruned zeros stay
    # exactly zero in the EMA (both sides of the fold are zero).
    ema_decay: float = 0.0
    # freeze the first N conv layers (network order — the same counting as
    # Darknet's `.conv.N` partial-weights convention, so `--partial
    # darknet19.conv.23 --freeze 23` trains only the head on a fixed
    # backbone). Frozen convs run INFERENCE-style BN (running stats, no
    # stat updates — torch's requires_grad=False + bn.eval() idiom) with
    # stop_gradient'd weights, and their params are restored bit-identical
    # after every optimizer update (weight decay can't creep). Because the
    # frozen prefix starts at the input, NO backward flows through it at
    # all: XLA drops the prefix's dW/dX programs entirely — on the pruned
    # fine-tune step conv1's dW alone is 2.2 ms of 19.2 ms (docs/PERF.md
    # "Where the train-step time goes").
    freeze_prefix: int = 0

    @classmethod
    def from_spec(cls, spec: NetworkSpec, **overrides) -> "TrainConfig":
        """Train hyperparameters from the cfg (SURVEY.md §5.6: the Darknet
        .cfg defines training, not just architecture): LR policy, [net]
        HSV knobs, and the [region] crop jitter all default to the cfg's
        values; ``overrides`` win."""
        n = spec.net
        try:
            # both [region] and [yolo] carry a jitter= knob; multi-head
            # specs share one value across heads in every public cfg
            jitter = spec.layers[spec.head_indices()[0]].jitter
        except ValueError:  # spec without a detection head
            jitter = 0.0
        kw = dict(learning_rate=n.learning_rate, momentum=n.momentum,
                  decay=n.decay, subdivisions=n.subdivisions,
                  burn_in=n.burn_in, policy=n.policy,
                  max_batches=n.max_batches, power=n.power, gamma=n.gamma,
                  step=n.step, steps=n.steps, scales=n.scales,
                  hue=n.hue, saturation=n.saturation, exposure=n.exposure,
                  augment_jitter=jitter)
        kw.update(overrides)
        return cls(**kw)


class TrainState(dict):
    """Pytree train state (a dict so optax/jit handle it natively).

    Keys: params, opt_state, step, seen, rng, weight_masks (possibly empty
    dict), channel_masks (possibly empty dict).
    """

    @staticmethod
    def create(params: Params, tx, rng: jax.Array,
               weight_masks: Optional[Dict[str, jnp.ndarray]] = None,
               channel_masks: Optional[Dict[int, jnp.ndarray]] = None,
               copy: bool = True, seen: int = 0,
               ema: bool = False) -> "TrainState":
        """Build a fresh train state.

        ``copy=True`` (default) copies params/masks into new device
        buffers: the jitted step DONATES its input state, so aliasing the
        caller's arrays into it would invalidate them after the first step
        — a footgun every caller hit in practice. Pass copy=False only
        when the caller hands over ownership deliberately.

        ``seen``: images-seen counter carried from a loaded ``.weights``
        header — it gates the region loss's early-training prior term
        (seen < 12800), so fine-tuning a converged model must NOT restart
        it at zero."""
        if copy:
            def dup(v):
                return jnp.array(v, copy=True)
            params = jax.tree.map(dup, params)
            weight_masks = jax.tree.map(dup, dict(weight_masks or {}))
            channel_masks = jax.tree.map(dup, dict(channel_masks or {}))
        trainable, _ = split_trainable(params)
        state = TrainState(
            params=params,
            opt_state=tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
            seen=jnp.asarray(seen, jnp.int32),
            rng=rng,
            weight_masks=dict(weight_masks or {}),
            channel_masks=dict(channel_masks or {}),
        )
        if ema:  # TrainConfig.ema_decay: shadow copy of the full pytree
            state["ema_params"] = jax.tree.map(
                lambda v: jnp.array(v, copy=True), params)
        return state


def split_trainable(params: Params) -> Tuple[Params, Params]:
    """BN running mean/var are state, not trainable parameters."""
    trainable, stats = {}, {}
    for k, p in params.items():
        t = {n: v for n, v in p.items() if n not in ("mean", "var")}
        s = {n: v for n, v in p.items() if n in ("mean", "var")}
        trainable[k] = t
        stats[k] = s
    return trainable, stats


def merge_params(trainable: Params, stats: Params) -> Params:
    return {k: {**trainable[k], **stats.get(k, {})} for k in trainable}


def darknet_lr_schedule(config: TrainConfig):
    """Darknet LR policies, matching network.c get_current_rate: during
    burn-in the LR is lr * (step/burn_in)^4 and the policy is NOT applied;
    after burn-in the cfg ``policy`` takes over:

    * ``constant`` — base lr.
    * ``steps`` — scales[i] applies whenever steps[i] <= step, so a
      leading ``-1`` step (the shipped tiny-yolo convention) scales the
      base LR immediately; every (step, scale) pair is kept, including
      non-positive steps (``step >= s`` is always true for them).
    * ``step``  — lr * scale^(step//step_size) (scales[0] or 1).
    * ``poly``  — lr * (1 - step/max_batches)^power.
    * ``exp``   — lr * gamma^step.
    * ``sig``   — lr / (1 + exp(gamma*(step - step_size))).
    """
    base = config.learning_rate
    pairs = tuple(zip(config.steps, config.scales))
    policy = config.policy

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(base, jnp.float32)
        if policy == "steps":
            for s, sc in pairs:
                lr = jnp.where(step >= s, lr * sc, lr)
        elif policy == "step":
            scale = config.scales[0] if config.scales else 1.0
            lr = base * scale ** jnp.floor(step_f / max(config.step, 1))
        elif policy == "poly":
            frac = jnp.clip(step_f / config.max_batches, 0.0, 1.0)
            lr = base * (1.0 - frac) ** config.power
        elif policy == "exp":
            lr = base * config.gamma ** step_f
        elif policy == "sig":
            lr = base / (1.0 + jnp.exp(config.gamma
                                       * (step_f - config.step)))
        elif policy == "constant":
            pass
        else:
            raise ValueError(f"unsupported lr policy {policy!r}")
        if config.burn_in > 0:
            frac = jnp.minimum(step / config.burn_in, 1.0)
            lr = jnp.where(step < config.burn_in,
                           base * frac ** 4, lr)
        return lr

    return schedule


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """SGD + momentum + (decoupled) weight decay, darknet-style lr policy."""
    return optax.chain(
        optax.add_decayed_weights(config.decay),
        optax.sgd(learning_rate=darknet_lr_schedule(config),
                  momentum=config.momentum),
    )


def augment_batch(config: TrainConfig, x: jnp.ndarray, targets: jnp.ndarray,
                  keys) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The train step's augment chain on a normalized f32 batch, factored
    out so diagnostics (tools/profile_train.py) time exactly the
    production chain. ``keys`` = (k_flip, k_hsv, k_mosaic, k_jitter) — the
    caller's key-split order is part of the step's reproducibility
    contract, so the helper takes the split keys rather than re-deriving
    them."""
    k_flip, k_hsv, k_mosaic, k_jitter = keys
    # jitter BEFORE mosaic: each source image gets its own random
    # crop/stretch, so the composed tiles carry crop variety (the
    # Darknet/YOLOv4 mosaic samples per-tile crops the same way)
    if config.augment_jitter > 0:
        x, targets = random_jitter(x, targets, k_jitter,
                                   jitter=config.augment_jitter)
    if config.augment_mosaic:
        x, targets = mosaic4(x, targets, k_mosaic)
    if config.augment_flip:
        x, targets = random_flip(x, targets, k_flip)
    if config.augment_hsv:
        x = distort_hsv(x, k_hsv, hue=config.hue,
                        sat=config.saturation, expo=config.exposure)
    return x, targets


def _conv_block_train(y: jnp.ndarray, p: Dict[str, jnp.ndarray],
                      l: ConvLayer, precision: Precision):
    """One conv + (batch-stat BN | bias) + activation; returns
    (y, batch_stats_or_None)."""
    y = _conv(y, p["w"], l, precision)
    stats = None
    if l.batch_normalize:
        # ONE fused read of the conv output for both statistics: XLA
        # multi-output-fuses sum(y) and sum(y*y), where jnp.var's
        # two-pass form pays an extra full pass over every (often
        # 416²-sized) activation (measured in docs/PERF.md "Where the
        # train-step time goes"). f32 accumulation; E[x²]−µ² cancellation
        # is ≤ µ²·2⁻²³ ≈ 1e-5·var at these scales, inside BN_EPS, and
        # clamped at 0 for the near-constant-channel edge.
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=(0, 1, 2))
        var = jnp.maximum(
            jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mu), 0.0)
        stats = {"mean": mu, "var": var}
        inv = jax.lax.rsqrt(var + BN_EPS)
        y = (y - mu.astype(y.dtype)) \
            * (p["gamma"].astype(jnp.float32) * inv).astype(y.dtype) \
            + p["beta"].astype(y.dtype)
    else:
        y = y + p["bias"].astype(y.dtype)
    return _activate(y, l.activation), stats


def _forward_train(params: Params, x: jnp.ndarray, spec: NetworkSpec,
                   precision: Precision,
                   channel_masks: Dict[int, jnp.ndarray],
                   remat: bool = False,
                   qat: Optional[QATSpec] = None,
                   freeze: frozenset = frozenset(),
                   ) -> Tuple[jnp.ndarray, Dict[str, Dict[str, jnp.ndarray]]]:
    """Training forward with batch statistics; also returns the per-layer
    batch (mean, var) so the step can update running stats. With ``remat``
    every conv block is rematerialized in the backward pass
    (jax.checkpoint): one extra forward of FLOPs for O(layers) less
    activation HBM. With ``qat`` the selected convs simulate the deployed
    int8 grids (compress/qat.py): input fake-quanted on the conv's
    in_scale, weight per-channel, post-activation output on its
    out_scale — the boundary placement of ``forward_quantized``."""
    outputs = []
    heads = []  # raw f32 maps at [yolo] layers (multi-head specs)
    batch_stats: Dict[str, Dict[str, jnp.ndarray]] = {}
    y = precision.cast_in(x)
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvLayer):
            key = conv_key(i)
            p = params[key]
            q_out = None
            if qat is not None and i in qat.int8:
                p = dict(p, w=fake_quant_weight(p["w"]))
                y = fake_quant(y, qat.in_scale[i])
                q_out = qat.out_scale.get(i)

            if key in freeze:
                # frozen conv (TrainConfig.freeze_prefix): inference-style
                # BN on running stats, no batch stats, no gradient — the
                # prefix's backward programs never exist
                y = conv_bn_act(y, jax.lax.stop_gradient(p), l, precision)
                stats = None
            else:
                def blk(y_, p_, l_=l):
                    return _conv_block_train(y_, p_, l_, precision)
                if remat:
                    blk = jax.checkpoint(blk)
                y, stats = blk(y, p)
            if stats is not None:
                batch_stats[key] = stats
            if i in channel_masks:
                y = y * channel_masks[i].astype(y.dtype)[None, None, None, :]
            if q_out is not None:
                y = fake_quant(y, q_out)
        elif isinstance(l, MaxPoolLayer):
            y = maxpool(y, l)
        elif isinstance(l, RouteLayer):
            y = jnp.concatenate([route_part(outputs[a], l)
                                 for a in l.layers], axis=-1)
        elif isinstance(l, ReorgLayer):
            y = reorg(y, l.stride)
        elif isinstance(l, ShortcutLayer):
            y = _activate(y + outputs[l.from_layer], l.activation)
        elif isinstance(l, UpsampleLayer):
            y = upsample_nearest(y, l.stride)
        elif isinstance(l, YoloLayer):
            # record this scale's raw map; y passes through unchanged so
            # later routes can index past the head (models/darknet.py)
            heads.append(y.astype(jnp.float32))
        elif isinstance(l, RegionLayer):
            pass
        outputs.append(y)
    if heads:
        return tuple(heads), batch_stats
    return y.astype(jnp.float32), batch_stats


def make_train_step(spec: NetworkSpec, config: TrainConfig,
                    tx: Optional[optax.GradientTransformation] = None,
                    distill: Optional[DistillPlan] = None,
                    jit_step: bool = True):
    """Build the jitted train step.

    step(state, images_uint8 (B,H,W,3), targets (B,M,5)) -> (state, metrics)

    With ``distill`` (train/distill.py) the teacher's inference forward
    runs inside the same program on the augmented batch, and
    ``weight * distill_loss`` joins the region loss in the gradient
    (metrics gain ``loss_distill``; ``loss`` stays the region loss).
    Teacher params enter as runtime args via a host-side wrapper — they
    are not compile-time constants — and autodiff never traverses the
    teacher (its output is data to the loss).

    With ``config.subdivisions = S > 1``, B is the EFFECTIVE batch: the
    step augments the whole batch once, then scans S micro-batches of
    B/S images (``lax.scan`` keeps only one micro-batch of activations
    live), averaging gradients into ONE optimizer update — Darknet's
    subdivision semantics (one weight update per cfg ``batch=`` images,
    BN statistics per micro-batch, running stats updated per micro
    forward in order). Micro-batch s takes the strided elements
    ``{s, S+s, 2S+s, ...}`` so that under a data-sharded mesh every
    micro-batch stays evenly spread across devices (a contiguous split
    would put each micro-batch on one device and serialize DP).
    Diagnostic metrics are means over micro-batches (exactly the
    big-batch value for the /batch-normalized losses; ratio metrics like
    avg_iou become means of per-micro ratios)."""
    spec.head_indices()  # validate early: every spec has [region]/[yolo]
    tx = tx or make_optimizer(config)
    subdivisions = max(int(config.subdivisions), 1)

    conv_indices = [i for i, l in enumerate(spec.layers)
                    if isinstance(l, ConvLayer)]
    if not 0 <= config.freeze_prefix < len(conv_indices):
        raise ValueError(
            f"freeze_prefix={config.freeze_prefix} must leave at least one "
            f"trainable conv (network has {len(conv_indices)})")
    freeze_keys = frozenset(
        conv_key(i) for i in conv_indices[:config.freeze_prefix])

    def loss_fn(trainable, stats, images_f32, targets, seen, channel_masks,
                weight_masks, t_raw=None):
        params = merge_params(trainable, stats)
        if weight_masks:
            params = {
                k: (dict(p, w=p["w"] * weight_masks[k].astype(p["w"].dtype))
                    if k in weight_masks else p)
                for k, p in params.items()}
        raw, batch_stats = _forward_train(
            params, images_f32, spec, config.precision, channel_masks,
            remat=config.remat, qat=config.qat, freeze=freeze_keys)
        metrics = detection_loss(raw, targets, spec, seen)
        # aux must be a pytree: return the metrics as a plain dict
        md = metrics.as_dict()
        loss = metrics.loss
        if t_raw is not None:
            d = detection_distill_loss(raw, t_raw, spec,
                                       temp=distill.temp,
                                       coord_scale=distill.coord_scale,
                                       obj_scale=distill.obj_scale,
                                       class_scale=distill.class_scale)
            md["loss_distill"] = d
            loss = loss + distill.weight * d
        if config.bn_l1 > 0:
            # slimming sparsity penalty; gamma_l1 (the MEAN |gamma|) is
            # reported so training logs show the polarization progress
            gammas = [p["gamma"].astype(jnp.float32)
                      for p in params.values() if "gamma" in p]
            total_abs = sum(jnp.sum(jnp.abs(g)) for g in gammas)
            n = sum(g.size for g in gammas)
            md["gamma_l1"] = total_abs / max(n, 1)
            loss = loss + config.bn_l1 * total_abs
        return loss, (md, batch_stats)

    def step(state: TrainState, images: jnp.ndarray, targets: jnp.ndarray,
             t_params: Optional[Params] = None):
        rng, k_aug1, k_aug2, k_aug3, k_aug4 = jax.random.split(
            state["rng"], 5)
        if (images.dtype == jnp.uint8 and config.augment_flip
                and config.augment_jitter == 0
                and not config.augment_mosaic):
            # fine-tune fast path: flip the uint8 batch BEFORE the f32
            # normalize — the reverse+select moves 4x fewer bytes and the
            # /255 convert then fuses into the conv input chain. Flip is a
            # pure permutation+select, so this is bitwise-identical to
            # flipping after normalize (same k_aug1 stream); jitter/mosaic
            # interpolate in float and keep the general chain below.
            images_f, targets = random_flip(images, targets, k_aug1)
            x = images_f.astype(jnp.float32) / 255.0
            if config.augment_hsv:
                x = distort_hsv(x, k_aug2, hue=config.hue,
                                sat=config.saturation, expo=config.exposure)
        else:
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            x, targets = augment_batch(config, x, targets,
                                       (k_aug1, k_aug2, k_aug3, k_aug4))

        # teacher inference on the SAME augmented batch (full effective
        # batch — no grads, so its activation memory is one live layer)
        t_raw = None
        if distill is not None:
            t_raw = teacher_forward(distill, t_params, x, config.precision)

        trainable, stats = split_trainable(state["params"])
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if subdivisions == 1:
            (_, (metrics, batch_stats)), grads = grad_fn(
                trainable, stats, x, targets, state["seen"],
                state["channel_masks"], state["weight_masks"], t_raw)
            stats_updates = jax.tree.map(
                lambda bs: bs[None], batch_stats)  # (1, C) fold below
        else:
            b = x.shape[0]
            if b % subdivisions:
                raise ValueError(
                    f"effective batch {b} is not divisible by "
                    f"subdivisions={subdivisions}")
            m_sz = b // subdivisions

            def to_micro(a):
                # (B, ...) -> (S, m, ...) by STRIDE (docstring: keeps every
                # micro-batch evenly sharded over a 'data' mesh axis)
                return a.reshape(m_sz, subdivisions,
                                 *a.shape[1:]).swapaxes(0, 1)

            def body(g_acc, xt):
                xi, ti, tri = xt
                (_, (met_i, bs_i)), g_i = grad_fn(
                    trainable, stats, xi, ti, state["seen"],
                    state["channel_masks"], state["weight_masks"], tri)
                return jax.tree.map(jnp.add, g_acc, g_i), (met_i, bs_i)

            xs = (to_micro(x), to_micro(targets),
                  None if t_raw is None else to_micro(t_raw))
            g0 = jax.tree.map(jnp.zeros_like, trainable)
            g_sum, (mets, stats_updates) = jax.lax.scan(body, g0, xs)
            inv_s = 1.0 / subdivisions
            grads = jax.tree.map(lambda g: g * inv_s, g_sum)
            metrics = jax.tree.map(lambda a: jnp.mean(a, axis=0), mets)

        # frozen prefix: restore bit-identical after the update (grads are
        # exactly zero via stop_gradient, but add_decayed_weights would
        # still decay frozen weights through the optimizer)
        frozen_saved = {k: trainable[k] for k in freeze_keys}
        updates, opt_state = tx.update(grads, state["opt_state"], trainable)
        trainable = optax.apply_updates(trainable, updates)
        for k, v in frozen_saved.items():
            trainable[k] = v

        # gradual magnitude pruning: recompute the masks from the freshly
        # updated weights when the schedule fires (on-device bisection,
        # lax.cond-gated; compress/gmp.py). Grads above used the OLD
        # masks — Zhu & Gupta's ordering (prune after the update).
        weight_masks = state["weight_masks"]
        if config.gmp is not None:
            weight_masks = gmp_mask_update(config.gmp, spec, trainable,
                                           weight_masks, state["step"])

        # belt-and-braces: keep pruned weights exactly zero (with GMP this
        # is the actual application of a freshly tightened mask; momentum
        # would otherwise push pruned weights off zero)
        if weight_masks:
            for k, m in weight_masks.items():
                trainable[k]["w"] = trainable[k]["w"] * m.astype(
                    trainable[k]["w"].dtype)

        # BN running stats (torch momentum convention), one sequential
        # update per micro-batch forward in order — Darknet's pacing.
        # subdivisions == 1 folds directly (same float ops): the length-1
        # lax.scan form paid one TPU while-loop per (layer, stat) — 44
        # loop setups/step on YOLOv2 — for nothing.
        for k, bs in stats_updates.items():
            if subdivisions == 1:
                stats[k]["mean"] = (1 - BN_MOMENTUM) * stats[k]["mean"] \
                    + BN_MOMENTUM * bs["mean"][0]
                stats[k]["var"] = (1 - BN_MOMENTUM) * stats[k]["var"] \
                    + BN_MOMENTUM * bs["var"][0]
                continue

            def fold(r, s_):
                return (1 - BN_MOMENTUM) * r + BN_MOMENTUM * s_, None
            stats[k]["mean"], _ = jax.lax.scan(fold, stats[k]["mean"],
                                               bs["mean"])
            stats[k]["var"], _ = jax.lax.scan(fold, stats[k]["var"],
                                              bs["var"])

        new_params = merge_params(trainable, stats)
        new_state = TrainState(
            params=new_params,
            opt_state=opt_state,
            step=state["step"] + 1,
            seen=state["seen"] + images.shape[0],
            rng=rng,
            weight_masks=weight_masks,
            channel_masks=state["channel_masks"],
        )
        if "ema_params" in state:
            ema = state["ema_params"]
            if config.ema_decay > 0:
                d = config.ema_decay
                ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   ema, new_params)
            new_state["ema_params"] = ema
        elif config.ema_decay > 0:
            raise ValueError(
                "config.ema_decay > 0 requires a train state created "
                "with TrainState.create(..., ema=True) — there is no "
                "EMA buffer to fold into")
        out = dict(metrics)
        out["lr"] = darknet_lr_schedule(config)(state["step"])
        if config.gmp is not None:
            # achieved sparsity over the GMP-managed weights (log-visible
            # schedule progress; the target is gmp_sparsity(step))
            n_total = sum(m.size for m in weight_masks.values())
            n_kept = sum(jnp.sum(m.astype(jnp.int32))
                         for m in weight_masks.values())
            out["sparsity"] = 1.0 - n_kept / n_total
        return new_state, out

    if not jit_step:
        # diagnostics hook (tools/profile_train.py): the raw traceable fn,
        # for embedding the step inside a timing fori_loop program
        return step
    jitted = jax.jit(step, donate_argnums=(0,))
    if distill is None:
        return jitted
    # thread the teacher as a RUNTIME argument (a closure constant would
    # bake the full teacher — 200 MB for YOLOv2 — into the executable)
    t_params = jax.tree.map(jnp.asarray, distill.teacher_params)

    def step_with_teacher(state, images, targets):
        return jitted(state, images, targets, t_params)

    return step_with_teacher


def _ts_flatten(s: TrainState):
    # sorted keys: flattening must match a plain dict's ordering so that
    # checkpoint restore (which yields plain dicts) can re-hang leaves on a
    # TrainState treedef
    keys = tuple(sorted(s.keys()))
    return tuple(s[k] for k in keys), keys


jax.tree_util.register_pytree_node(
    TrainState,
    _ts_flatten,
    lambda keys, vals: TrainState(zip(keys, vals)),
)
