"""On-chip measurement: the YOLOv3 AND YOLOv4-tiny families through the
SAME fused serving pipeline as bench.py (letterbox -> forward ->
decode_heads over all scales -> NMS), demonstrating the second and
third detector families ride the framework's perf machinery unchanged.
(`--v4` selects the yolov4-tiny rows; yolov4-tiny's CSP grouped-route
sources prune with split-balanced keep-sets by default.)

Structured pruning on v3 is bounded by graph protection
(compress/graph.py): yolov3-tiny pruning touches 11 of 13 convs, but the
full Darknet-53 graph protects the 28 shortcut-tied convs + 3 head
producers, so a uniform 75% filter prune slims only 44 of 75 convs —
the measured pruned/unpruned ratio quantifies what the Li et al. ResNet
recipe leaves on the table for residual backbones (documented in
docs/PERF.md, "YOLOv3 family" section).

Usage: python tools/bench_v3.py [--configs name,name,...] [--skip-full]
Each config is one 20-50 s remote compile; the default list is ~6.
"""
import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from modelcompression_tpu.compress import (
    forward_quantized, int8_layers_auto, quantize_from_batches, repack,
    uniform_filter_fraction_keep_sets,
)
from modelcompression_tpu.evaluation import EvalConfig, make_eval_step
from modelcompression_tpu.models import (
    fold_batchnorm, init_params, num_conv_flops, yolov3_tiny_voc,
    yolov3_voc, yolov4_tiny_voc, yolov4_voc,
)
from modelcompression_tpu.utils.timing import (
    measure_rtt, salted_pipeline_loop, time_fn,
)

SRC = (384, 512)
INNER = 10  # pipeline steps per dispatch (dispatch-proof, as bench.py)


def host_init(spec, key):
    """init_params on the CPU backend (bench.py's trick): per-layer RNG
    programs over the tunnel take minutes for the 60M+ graphs; one bulk
    transfer of the finished tree takes seconds. The configs below
    prune/repack on host too, so only the final trees cross the link
    (the bench loop device_puts them)."""
    with jax.default_device(jax.devices("cpu")[0]):
        p = init_params(spec, key)
    return jax.tree.map(np.asarray, p)


def build_v4_configs():
    """yolov4-tiny rows: unpruned, 75%-pruned (split-balanced CSP
    sources — the default uniform path), and the pruned deployment
    config with the int8 hybrid."""
    v4 = yolov4_tiny_voc()
    p4 = host_init(v4, jax.random.key(2))
    keep = uniform_filter_fraction_keep_sets(v4, p4, 0.75)
    v4_s, p4_s = repack(v4, p4, keep)
    return {
        "v4tiny_unpruned_b64": (v4, p4, 64, dict(nms_prefilter=128), "off"),
        "v4tiny_pruned75_b64_pf128": (v4_s, p4_s, 64,
                                      dict(nms_prefilter=128), "off"),
        "v4tiny_pruned75_b64_pf128_int8auto": (
            v4_s, p4_s, 64, dict(nms_prefilter=128), "auto"),
        # peak-throughput serving point (docs/PERF.md batch scaling)
        "v4tiny_pruned75_b128_pf128_int8auto": (
            v4_s, p4_s, 128, dict(nms_prefilter=128), "auto"),
    }


def build_v4full_configs():
    """Full yolov4-voc rows (fourth family config, round 5): the
    CSPDarknet53 + SPP + PAN graph at 416. The route-back CSP stages
    tie 5 residual trunks (2/3/5/9/9 convs), so --tied group is the
    deep-prune mode here exactly as on full v3; the protect-default row
    quantifies what the Li et al. recipe leaves on the table."""
    v4 = yolov4_voc()
    p = host_init(v4, jax.random.key(3))
    keep = uniform_filter_fraction_keep_sets(v4, p, 0.75)
    s_p, p_p = repack(v4, p, keep)
    keep_g = uniform_filter_fraction_keep_sets(v4, p, 0.75, tied="group")
    s_g, p_g = repack(v4, p, keep_g)
    return {
        "v4_unpruned_b32": (v4, p, 32, {}, "off"),
        "v4_unpruned_b64_pf128": (v4, p, 64, dict(nms_prefilter=128),
                                  "off"),
        "v4_pruned75_b32": (s_p, p_p, 32, {}, "off"),
        "v4_pruned75_tied_b32": (s_g, p_g, 32, {}, "off"),
        "v4_pruned75_tied_b64_pf128": (s_g, p_g, 64,
                                       dict(nms_prefilter=128), "off"),
        "v4_pruned75_tied_b64_pf128_int8auto": (
            s_g, p_g, 64, dict(nms_prefilter=128), "auto"),
        "v4_pruned75_tied_b128_pf128": (s_g, p_g, 128,
                                        dict(nms_prefilter=128), "off"),
    }


def build_configs(skip_full: bool):
    tiny = yolov3_tiny_voc()
    p_tiny = host_init(tiny, jax.random.key(0))
    keep = uniform_filter_fraction_keep_sets(tiny, p_tiny, 0.75)
    tiny_s, p_tiny_s = repack(tiny, p_tiny, keep)

    # (name, spec, params, batch, EvalConfig overrides, int8 selector)
    configs = {
        "tiny3_unpruned_b64": (tiny, p_tiny, 64, {}, "off"),
        "tiny3_pruned75_b64": (tiny_s, p_tiny_s, 64, {}, "off"),
        "tiny3_pruned75_b64_pf128": (tiny_s, p_tiny_s, 64,
                                     dict(nms_prefilter=128), "off"),
        "tiny3_pruned75_b64_pf128_int8auto": (
            tiny_s, p_tiny_s, 64, dict(nms_prefilter=128), "auto"),
        "tiny3_pruned75_b128_pf128_int8auto": (
            tiny_s, p_tiny_s, 128, dict(nms_prefilter=128), "auto"),
    }
    if not skip_full:
        full = yolov3_voc()
        p_full = host_init(full, jax.random.key(1))
        keep_f = uniform_filter_fraction_keep_sets(full, p_full, 0.75)
        full_s, p_full_s = repack(full, p_full, keep_f)
        # --tied group: residual identity paths pruned too (72/75 convs)
        keep_g = uniform_filter_fraction_keep_sets(full, p_full, 0.75,
                                                   tied="group")
        full_g, p_full_g = repack(full, p_full, keep_g)
        configs.update({
            "v3_unpruned_b32": (full, p_full, 32, {}, "off"),
            "v3_pruned75_b32": (full_s, p_full_s, 32, {}, "off"),
            "v3_pruned75_tied_b32": (full_g, p_full_g, 32, {}, "off"),
            "v3_pruned75_tied_b64": (full_g, p_full_g, 64, {}, "off"),
        })
    return configs


def bench_train(skip_full: bool, rng, rtt):
    """--train: the v3 family's FINE-TUNE throughput (one-program
    fwd+bwd+SGD+BN step, subdivisions=1, flip on — bench.py's fine-tune
    config) for tiny3 unpruned/pruned75 and, unless skipped, the full
    yolov3-voc pruned-tied config (the measured-fastest serving graph,
    trained at its slimmed model's real speed)."""
    from modelcompression_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    tiny = yolov3_tiny_voc()
    p_tiny = host_init(tiny, jax.random.key(0))
    keep = uniform_filter_fraction_keep_sets(tiny, p_tiny, 0.75)
    tiny_s, p_tiny_s = repack(tiny, p_tiny, keep)
    configs = {
        "tiny3_unpruned_train_b64": (tiny, p_tiny, 64),
        "tiny3_pruned75_train_b64": (tiny_s, p_tiny_s, 64),
    }
    if not skip_full:
        full = yolov3_voc()
        p_full = host_init(full, jax.random.key(1))
        keep_g = uniform_filter_fraction_keep_sets(full, p_full, 0.75,
                                                   tied="group")
        full_g, p_full_g = repack(full, p_full, keep_g)
        configs["v3_pruned75_tied_train_b32"] = (full_g, p_full_g, 32)
        # full yolov4's deployment graph trained at its slimmed speed
        # (CIoU loss — the canonical keys ride the cfg)
        v4f = yolov4_voc()
        p_v4f = host_init(v4f, jax.random.key(3))
        keep_v4 = uniform_filter_fraction_keep_sets(v4f, p_v4f, 0.75,
                                                    tied="group")
        v4f_g, p_v4f_g = repack(v4f, p_v4f, keep_v4)
        configs["v4_pruned75_tied_train_b32"] = (v4f_g, p_v4f_g, 32)

    for name, (sp, pr, b) in configs.items():
        tcfg = TrainConfig.from_spec(sp, augment_flip=True,
                                     augment_jitter=0.0, subdivisions=1,
                                     max_boxes=30)
        tx = make_optimizer(tcfg)
        state = TrainState.create(jax.device_put(pr, jax.devices()[0]),
                                  tx, jax.random.key(2))
        tstep = make_train_step(sp, tcfg, tx)
        net = sp.net.height
        imgs = jnp.asarray(rng.integers(0, 255, (b, net, net, 3), np.uint8))
        tg = np.zeros((b, 30, 5), np.float32)
        tg[:, 0] = [0, 0.5, 0.5, 0.3, 0.3]
        tg = jnp.asarray(tg)
        holder = {"s": state}

        def one_step():
            s, m = tstep(holder["s"], imgs, tg)  # donates prior state
            holder["s"] = s
            return m["loss"]

        t0 = time.time()
        one_step()
        compile_s = time.time() - t0
        sec = time_fn(one_step, iters=20, windows=3, rtt=rtt)
        print(f"{name:34s}: {b / sec:8.0f} img/s ({sec * 1e3:6.2f} ms/step"
              f" fwd+bwd+SGD+BN, batch {b}; compile {compile_s:.0f}s)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--configs", default=None,
                    help="comma list; default: the standard sweep")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full yolov3 rows (62M params: ~60 s of "
                         "on-chip init + two long compiles)")
    ap.add_argument("--train", action="store_true",
                    help="measure FINE-TUNE step throughput instead of "
                         "the serving pipeline (docs/PERF.md v3 family)")
    ap.add_argument("--v4", action="store_true",
                    help="measure the yolov4-tiny rows instead of the "
                         "v3 sweep (docs/PERF.md 'YOLOv4-tiny family')")
    ap.add_argument("--v4full", action="store_true",
                    help="measure the FULL yolov4-voc rows (64M params: "
                         "~60 s of on-chip init + long compiles; "
                         "docs/PERF.md 'Full YOLOv4')")
    args = ap.parse_args()

    if args.train:
        rng = np.random.default_rng(0)
        rtt = measure_rtt()
        print(f"rtt {rtt * 1e3:.0f} ms (train mode)", file=sys.stderr)
        return bench_train(args.skip_full, rng, rtt)

    rng = np.random.default_rng(0)
    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.0f} ms | src {SRC} | inner {INNER}",
          file=sys.stderr)
    CONFIGS = (build_v4full_configs() if args.v4full
               else build_v4_configs() if args.v4
               else build_configs(args.skip_full))
    names = (args.configs.split(",") if args.configs else list(CONFIGS))

    base = EvalConfig(batch_size=64, conf_thresh=0.01, max_detections=32)
    dev = jax.devices()[0]
    results = {}
    for name in names:
        sp, pr, b, over, int8 = CONFIGS[name.strip()]
        cfg = dataclasses.replace(base, batch_size=b, **over)
        folded = fold_batchnorm(pr, sp)
        if int8 != "off":
            net = sp.net.height
            calib = [rng.uniform(0, 1, (8, net, net, 3)).astype(np.float32)]
            layers = (int8_layers_auto(sp, min_channels=64)
                      if int8 == "auto" else int8)
            folded = quantize_from_batches(folded, sp, calib,
                                           int8_layers=layers)
            cfg = dataclasses.replace(
                cfg, forward_fn=lambda q, x, s: forward_quantized(q, x, s))
        images = jax.device_put(jnp.asarray(
            rng.integers(0, 255, (b, *SRC, 3), np.uint8)), dev)
        img_w = jnp.full((b,), float(SRC[1]))
        img_h = jnp.full((b,), float(SRC[0]))
        folded = jax.device_put(folded, dev)
        step = make_eval_step(sp, cfg, src_hw=SRC)
        many = salted_pipeline_loop(step, INNER)
        t0 = time.time()
        jax.block_until_ready(many(folded, images, img_w, img_h,
                                   jnp.float32(0)))
        compile_s = time.time() - t0
        sec = time_fn(lambda salt: many(folded, images, img_w, img_h, salt),
                      iters=10, windows=3, rtt=rtt) / INNER
        gf = num_conv_flops(sp) / 1e9
        results[name] = b / sec
        print(f"{name:34s}: {b / sec:8.0f} img/s ({sec * 1e3:6.2f} ms/batch,"
              f" {gf:5.2f} GF/img, {gf * b / sec / 1e3:5.1f} TFLOPS;"
              f" compile {compile_s:.0f}s)")

    if results:
        best = max(results, key=results.get)
        print(f"best: {best} @ {results[best]:.0f} img/s")


if __name__ == "__main__":
    main()
