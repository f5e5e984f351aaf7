"""Training loop drivers (SURVEY.md §3.4 / §7.2 steps 4 & 6).

``train`` runs N steps/epochs of the jitted step with prefetched host
batches, periodic eval and checkpointing. ``iterative_prune_finetune``
implements the reference's outer loop (BASELINE.json:10):
  repeat { prune more -> fine-tune -> eval } until the target sparsity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from modelcompression_tpu.compress import (
    DEFAULT_MASK_BACKEND, channel_masks_from_keep, magnitude_mask_fn,
    repack, uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.models.cfg import NetworkSpec
from modelcompression_tpu.models.darknet import Params
from modelcompression_tpu.train.loader import BatchLoader
from modelcompression_tpu.train.distill import DistillPlan
from modelcompression_tpu.train.train_step import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from modelcompression_tpu.utils.logging import MetricsLogger
from modelcompression_tpu.utils.profiling import StepTimer


def train(state: TrainState, spec: NetworkSpec, config: TrainConfig,
          loader: BatchLoader, n_steps: int,
          logger: Optional[MetricsLogger] = None,
          eval_fn: Optional[Callable[[Params], Dict[str, float]]] = None,
          eval_every: int = 0,
          checkpoint_fn: Optional[Callable[[int, TrainState], None]] = None,
          checkpoint_every: int = 0,
          metrics_every: int = 10,
          initial_step: int = 0,
          mesh=None, tp: bool = False,
          distill: Optional[DistillPlan] = None) -> TrainState:
    """Run ``n_steps`` train steps. Returns the final state.

    Metrics stay on device and are only materialized every
    ``metrics_every`` steps: each host readback over the device link costs
    a full round-trip (~40ms-plus on a tunneled TPU), so syncing every step
    serializes the pipeline (SURVEY.md §5.7 double-buffering intent).

    ``initial_step``: the restored global step when resuming — logging,
    eval, and checkpoint cadences key off ``initial_step + i + 1`` so a
    resumed run continues the SAME step numbering and cadence phase an
    uninterrupted run would have (not a fresh 1..n_steps count that would
    duplicate JSONL step ids and shift --eval-every boundaries).

    ``mesh``: a (data[, model]) ``jax.sharding.Mesh`` — the state is
    placed on it (params TP-sharded over 'model' when ``tp``) and every
    batch is sharded on 'data'; GSPMD inserts the gradient all-reduce
    (SURVEY.md §2.3). The loader's batch size must divide the data axis.
    """
    if mesh is not None:
        from modelcompression_tpu.parallel import (
            place_train_state, shard_batch,
        )
        dp = mesh.shape.get("data", 1)
        if loader.batch_size % dp:
            raise ValueError(
                f"batch {loader.batch_size} not divisible by data-parallel "
                f"size {dp}")
        state = place_train_state(state, mesh, spec, tp=tp)
    step_fn = make_train_step(spec, config, distill=distill)
    logger = logger or MetricsLogger()
    timer = StepTimer()
    it = iter(loader)
    metrics = None
    for i in range(n_steps):
        images, targets = next(it)
        if mesh is not None:
            # one hop: device_put the RAW numpy batch with the mesh
            # sharding (jnp.asarray first would commit it to the default
            # device and pay the feed link twice)
            images, targets = shard_batch((images, targets), mesh)
        else:
            images = jnp.asarray(images)
            targets = jnp.asarray(targets)
        state, metrics = step_fn(state, images, targets)
        # global step, tracked host-side (avoids reading state["step"]
        # back every iteration); equals state["step"] because
        # initial_step is the restored step count on resume
        step = initial_step + i + 1
        last = i == n_steps - 1
        timer.tick(images.shape[0])  # host-side counters only, no sync
        sync_now = (metrics_every and step % metrics_every == 0) or last
        if sync_now:
            # float() blocks until this step's compute finished, so the
            # timer's wall clock is accurate at every sync point
            host_metrics = {k: float(v) for k, v in metrics.items()}
            host_metrics["img_per_sec"] = timer.images_per_sec
            logger.log(step, host_metrics, force=last)
        if eval_fn and eval_every and step % eval_every == 0:
            logger.log(step, eval_fn(state["params"]), prefix="eval")
        if checkpoint_fn and checkpoint_every and \
                step % checkpoint_every == 0:
            checkpoint_fn(step, state)
    return state


@dataclasses.dataclass
class IterativeRound:
    round_idx: int
    fraction: float
    spec: NetworkSpec
    params: Params
    eval_metrics: Dict[str, float]
    seen: int = 0  # cumulative images-seen after this round's fine-tune


def iterative_prune_finetune(
        spec: NetworkSpec, params: Params, config: TrainConfig,
        loader: BatchLoader,
        fractions: Sequence[float],
        steps_per_round: int,
        eval_fn: Callable[[NetworkSpec, Params], Dict[str, float]],
        mode: str = "l1_filter",
        rng: Optional[jax.Array] = None,
        logger: Optional[MetricsLogger] = None,
        repack_each_round: bool = True,
        ckpt_dir: Optional[str] = None,
        resume: bool = False,
        initial_seen: int = 0,
        mesh=None, tp: bool = False,
        mask_backend: str = DEFAULT_MASK_BACKEND,
        distill: Optional[DistillPlan] = None,
        taylor_batches: int = 8,
        tied: str = "protect") -> List[IterativeRound]:
    """The reference's iterative loop (BASELINE.json:10), TPU-first.

    ``fractions`` is the cumulative prune schedule (e.g. 0.25, 0.5, 0.75).
    For the structured modes (``l1_filter`` | ``bn_gamma`` | ``fpgm`` |
    ``taylor``) each round ranks filters of the *current* (already
    slimmed) model, prunes the incremental fraction, physically repacks,
    then fine-tunes the smaller dense network — so every round's
    training runs at the smaller model's real speed.
    For ``magnitude``/``global``/``lamp`` modes masks accumulate instead
    (weights stay dense, masked fine-tune).

    With ``ckpt_dir`` each completed round saves {params, masks} plus the
    round's (possibly slimmed) arch cfg; ``resume=True`` restores the
    latest round checkpoint and continues with the remaining fractions —
    the failure-recovery contract for multi-hour schedules (SURVEY.md
    §5.3/§5.4: "the iterative loop depends on saving after each round").

    ``mask_backend`` selects the magnitude/global mask implementation
    ('fused' one-program XLA default | 'pallas' Mosaic twins |
    'reference' per-shape argsort oracle — compress/backend.py).

    ``tied`` is the residual-graph policy for the structured modes
    (``l1_filter`` | ``bn_gamma`` | ``fpgm`` | ``taylor``): ``protect``
    (default) leaves shortcut-tied convs unpruned; ``group`` prunes each
    tied group with ONE shared keep-set ranked by group-summed scores
    (criteria.tied_group_keep_sets; taylor: group-summed gate gradients,
    taylor.taylor_scores_with_groups) — the aggressive Li et al. §4.2
    recipe that slims residual identity paths, WITH the fine-tune
    recovery this loop provides each round (exactly the accuracy-
    sensitive case the one-shot prune CLI cannot recover).
    """
    if tied not in ("protect", "group"):
        raise ValueError(f"tied must be 'protect' or 'group', got {tied!r}")
    if tied == "group" and mode not in ("l1_filter", "bn_gamma", "fpgm",
                                        "taylor"):
        raise ValueError(
            f"tied='group' composes with the structured modes "
            f"(l1_filter | bn_gamma | fpgm | taylor), not {mode!r}")
    rng = rng if rng is not None else jax.random.key(0)
    logger = logger or MetricsLogger()
    rounds: List[IterativeRound] = []
    prev_frac = 0.0
    weight_masks: Dict[str, jnp.ndarray] = {}
    start_round = 0
    seen_running = initial_seen

    if ckpt_dir and resume:
        from modelcompression_tpu.utils.checkpoint import (
            latest_checkpoint, load_checkpoint,
        )
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            spec, saved, meta = load_checkpoint(latest)
            params = {k: {n: jnp.asarray(v) for n, v in p.items()}
                      for k, p in saved["params"].items()}
            weight_masks = {k: jnp.asarray(v)
                            for k, v in saved.get("weight_masks", {}).items()}
            prev_frac = float(meta["fraction"])
            start_round = int(meta["round"]) + 1
            seen_running = int(meta.get("seen", initial_seen))
            logger.log(start_round,
                       {"resumed_fraction": prev_frac}, prefix="resume")

    for ridx, frac in enumerate(fractions):
        # split BEFORE the resume skip so a resumed run consumes the same
        # key sequence an uninterrupted run would (round i always trains
        # with split #i+1 of the seed key)
        rng, round_key = jax.random.split(rng)
        if ridx < start_round:
            continue
        if mode in ("l1_filter", "bn_gamma", "fpgm", "taylor"):
            # incremental fraction relative to remaining filters
            inc = 1.0 - (1.0 - frac) / (1.0 - prev_frac)
            if mode == "taylor":
                # Molchanov's recipe: rank by gate-gradient Taylor scores
                # measured on training batches of the CURRENT (already
                # slimmed + fine-tuned) model. The scoring batches come off
                # the shared loader stream — they are training data, and a
                # resumed run rebuilds the loader at a round boundary, so
                # the stream semantics match an uninterrupted run's.
                import itertools

                from modelcompression_tpu.compress import (
                    taylor_filter_keep_sets,
                )
                keep_sets = taylor_filter_keep_sets(
                    params, spec,
                    itertools.islice(iter(loader), taylor_batches), inc,
                    seen=seen_running, precision=config.precision,
                    tied=tied)
            else:
                keep_sets = uniform_filter_fraction_keep_sets(
                    spec, params, inc,
                    criterion={"bn_gamma": "bn_gamma",
                               "fpgm": "fpgm"}.get(mode, "l1"),
                    tied=tied)
            if repack_each_round:
                spec, params = repack(spec, params, keep_sets)
                channel_masks = {}
            else:
                channel_masks = channel_masks_from_keep(spec, keep_sets)
        elif mode in ("magnitude", "global", "lamp"):
            if mode == "lamp":
                # layer-adaptive global magnitude (compress/lamp.py):
                # one sort-based program, compiled once — round 2+ reuse
                # the executable (shapes don't change in masked modes)
                from modelcompression_tpu.compress import lamp_masks
                weight_masks = lamp_masks(params, spec, frac)
            else:
                # default 'fused': masks recompute every round, so the
                # one-program path is mandatory on a remote-compile TPU
                # (compress/backend.py; VERDICT r1 #1)
                fn = magnitude_mask_fn(mode, mask_backend)
                weight_masks = fn(params, spec, frac)
            channel_masks = {}
        else:
            raise ValueError(f"unknown mode {mode!r}")

        tx = make_optimizer(config)
        state = TrainState.create(params, tx, round_key,
                                  weight_masks=weight_masks,
                                  channel_masks=channel_masks,
                                  seen=seen_running)
        state = train(state, spec, config, loader, steps_per_round,
                      logger=logger, mesh=mesh, tp=tp, distill=distill)
        params = state["params"]
        seen_running = int(state["seen"])
        metrics = eval_fn(spec, params)
        logger.log(int(state["step"]),
                   dict(metrics, fraction=frac), prefix=f"round{ridx}")
        rounds.append(IterativeRound(ridx, frac, spec, params, metrics,
                                     seen=seen_running))
        prev_frac = frac
        if ckpt_dir:
            from modelcompression_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(
                ckpt_dir, ridx, spec,
                {"params": params, "weight_masks": weight_masks},
                extra={"round": ridx, "fraction": frac, "mode": mode,
                       "seen": seen_running,
                       "metrics": {k: float(v) for k, v in metrics.items()}})
    return rounds
