"""Where does the TRAIN-step time go? (VERDICT r2 weak #3)

Times cumulative stages of the fine-tune step — normalize+augment, training
forward (batch-stat BN), +region loss, +backward, and the full production
step (optimizer update + mask re-apply + BN running-stat fold) — each as
ONE dispatch-proof fori_loop program with time_fn's salted reads
(utils/timing.py; same methodology as tools/profile_pruned.py). Default:
the 75%-filter-pruned repacked model in bench.py's fine-tune config
(flip on, jitter 0, subdivisions 1, batch 64); --unpruned for the dense
model; --jitter/--hsv/--mosaic switch the augment chain on to price it.

--trace DIR additionally captures a jax.profiler perfetto trace of the
jitted production step and prints the top device ops by total time — the
train-step twin of docs/PERF.md's "Op-level trace of the pruned step".
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--unpruned", action="store_true")
    p.add_argument("--jitter", action="store_true",
                   help="augment with the cfg's crop jitter (0.3)")
    p.add_argument("--hsv", action="store_true")
    p.add_argument("--mosaic", action="store_true")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--freeze", type=int, default=0,
                   help="TrainConfig.freeze_prefix: freeze the first N "
                        "convs (prices the frozen-backbone fine-tune)")
    p.add_argument("--inner", type=int, default=10,
                   help="step iterations per dispatch (dispatch-proofing)")
    p.add_argument("--trace", default=None,
                   help="capture a perfetto trace of the jitted step into "
                        "this dir and print the top device ops")
    p.add_argument("--stages", default="aug,fwd,loss,bwd,full",
                   help="comma list (each stage is one 20-50s remote "
                        "compile)")
    return p.parse_args()


def parse_perfetto(trace_dir):
    """Aggregate device-op durations from the newest .trace.json.gz under
    trace_dir: {op name: (total_us, count)} sorted by total. Host/python
    tracks are excluded by process name when identifiable."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None, None
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", doc if isinstance(doc, list) else [])
    proc_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_name[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, n in proc_name.items()
                   if ("TPU" in n or "Device" in n or "device" in n)
                   and "Host" not in n and "host" not in n}
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if "dur" not in e or e.get("ph") not in (None, "X"):
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        a = agg[e["name"]]
        a[0] += e["dur"]
        a[1] += 1
    return (sorted(agg.items(), key=lambda kv: -kv[1][0]),
            {pid: proc_name.get(pid, "?") for pid in device_pids})


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from modelcompression_tpu.compress import (
        repack, uniform_filter_fraction_keep_sets,
    )
    from modelcompression_tpu.core.precision import FAST
    from modelcompression_tpu.models import (
        init_params, num_conv_flops, yolov2_voc,
    )
    from modelcompression_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
        merge_params, split_trainable,
    )
    from modelcompression_tpu.train.region_loss import region_loss
    from modelcompression_tpu.train.train_step import (
        _forward_train, augment_batch,
    )
    from modelcompression_tpu.utils.timing import measure_rtt, time_fn

    B, INNER = args.batch, args.inner
    spec = yolov2_voc()
    with jax.default_device(jax.devices("cpu")[0]):
        params_host = init_params(spec, jax.random.key(0))
    params = jax.device_put(jax.tree.map(np.asarray, params_host),
                            jax.devices()[0])
    if args.unpruned:
        sspec, sparams = spec, params
    else:
        keep = uniform_filter_fraction_keep_sets(spec, params, 0.75)
        sspec, sparams = repack(spec, params, keep)

    # bench.py's fine-tune measurement config (flip on, jitter 0, subdiv 1)
    tcfg = TrainConfig.from_spec(
        sspec, augment_flip=True, subdivisions=1, max_boxes=30,
        augment_jitter=(0.3 if args.jitter else 0.0),
        augment_hsv=args.hsv, augment_mosaic=args.mosaic,
        freeze_prefix=args.freeze)
    tx = make_optimizer(tcfg)
    region = sspec.region

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, 416, 416, 3), np.uint8))
    tg = np.zeros((B, 30, 5), np.float32)
    tg[:, 0] = [0, 0.5, 0.5, 0.3, 0.3]
    targets = jnp.asarray(tg)
    # PIN every program argument on the TPU: repack() hands back
    # host-resident arrays, and a jit arg living on the wrong device is
    # re-transferred on EVERY call — ~113 buffers / 13 MB per execute, which
    # measured as ~150-300 ms/call of pure dispatch and swamped the device
    # time (the production paths are unaffected: TrainState.create copies
    # onto the default device and eval paths jit fold_batchnorm outputs).
    dev = jax.devices()[0]
    sparams = jax.device_put(sparams, dev)
    targets, images = jax.device_put((targets, images), dev)
    state = TrainState.create(sparams, tx, jax.random.key(1))
    state = jax.device_put(state, dev)
    jax.block_until_ready((sparams, state))
    seen0 = jnp.zeros((), jnp.int32)  # prior term ACTIVE (bench parity)

    rtt = measure_rtt()
    print(f"rtt {rtt * 1e3:.0f} ms | batch {B} | inner {INNER} | "
          f"{'unpruned' if args.unpruned else 'pruned75'} | "
          f"aug flip={tcfg.augment_flip} jitter={tcfg.augment_jitter} "
          f"hsv={tcfg.augment_hsv} mosaic={tcfg.augment_mosaic}",
          file=sys.stderr)

    key0 = jax.random.key(7)

    def norm_aug(x8, t, i):
        """The step's input normalize + augment chain, keys per iteration —
        including the step's uint8-flip fast path when it applies."""
        ks = jax.random.split(jax.random.fold_in(key0, i), 5)
        x8 = x8 + (i % 2).astype(jnp.uint8)
        from modelcompression_tpu.data.preprocess import (
            distort_hsv, random_flip,
        )
        if (tcfg.augment_flip and tcfg.augment_jitter == 0
                and not tcfg.augment_mosaic):
            xf, t = random_flip(x8, t, ks[1])
            x = xf.astype(jnp.float32) / 255.0
            if tcfg.augment_hsv:
                x = distort_hsv(x, ks[2], hue=tcfg.hue,
                                sat=tcfg.saturation, expo=tcfg.exposure)
            return x, t
        x = x8.astype(jnp.float32) / 255.0
        return augment_batch(tcfg, x, t, (ks[1], ks[2], ks[3], ks[4]))

    from modelcompression_tpu.models.cfg import ConvLayer
    from modelcompression_tpu.models.darknet import conv_key
    conv_idx = [i for i, l in enumerate(sspec.layers)
                if isinstance(l, ConvLayer)]
    fkeys = frozenset(conv_key(i) for i in conv_idx[:args.freeze])

    def loss_fn(trainable, stats, x, t):
        p = merge_params(trainable, stats)
        raw, bstats = _forward_train(p, x, sspec, FAST, {}, freeze=fkeys)
        m = region_loss(raw, t, region, seen0)
        return m.loss, bstats

    trainable, stats = split_trainable(sparams)

    def consume(tree):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree.leaves(tree))

    programs = {}

    @jax.jit
    def p_aug(x8, t, salt):
        def body(i, acc):
            xa, ta = norm_aug(x8, t, i)
            return acc + jnp.sum(xa) + jnp.sum(ta)
        return jax.lax.fori_loop(0, INNER, body, salt)
    programs["aug"] = lambda salt: p_aug(images, targets, salt)

    @jax.jit
    def p_fwd(tr, st, x8, t, salt):
        def body(i, acc):
            xa, _ = norm_aug(x8, t, i)
            raw, bstats = _forward_train(merge_params(tr, st), xa, sspec,
                                         FAST, {}, freeze=fkeys)
            return acc + jnp.sum(raw) + consume(bstats)
        return jax.lax.fori_loop(0, INNER, body, salt)
    programs["fwd"] = lambda salt: p_fwd(trainable, stats, images, targets,
                                         salt)

    @jax.jit
    def p_loss(tr, st, x8, t, salt):
        def body(i, acc):
            xa, ta = norm_aug(x8, t, i)
            loss, bstats = loss_fn(tr, st, xa, ta)
            return acc + loss + consume(bstats)
        return jax.lax.fori_loop(0, INNER, body, salt)
    programs["loss"] = lambda salt: p_loss(trainable, stats, images,
                                           targets, salt)

    @jax.jit
    def p_bwd(tr, st, x8, t, salt):
        def body(i, acc):
            xa, ta = norm_aug(x8, t, i)
            (loss, bstats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tr, st, xa, ta)
            return acc + loss + consume(bstats) + consume(grads)
        return jax.lax.fori_loop(0, INNER, body, salt)
    programs["bwd"] = lambda salt: p_bwd(trainable, stats, images, targets,
                                         salt)

    raw_step = make_train_step(sspec, tcfg, tx, jit_step=False)

    @jax.jit
    def p_full(st0, x8, t, salt):
        def body(i, carry):
            st, acc = carry
            st2, m = raw_step(st, x8 + (i % 2).astype(jnp.uint8), t)
            return (st2, acc + m["loss"])
        _, acc = jax.lax.fori_loop(0, INNER, body, (st0, salt))
        return acc
    programs["full"] = lambda salt: p_full(state, images, targets, salt)

    gf = num_conv_flops(sspec) / 1e9
    results = {}
    for name in [s.strip() for s in args.stages.split(",") if s.strip()]:
        fn = programs[name]
        t0 = time.time()
        jax.block_until_ready(fn(jnp.float32(0)))
        compile_s = time.time() - t0
        sec = time_fn(fn, iters=5, windows=3, rtt=rtt) / INNER
        results[name] = sec
        print(f"{name:5s}: {sec * 1e3:7.2f} ms/step  "
              f"({B / sec:7.1f} img/s; compile {compile_s:.0f}s)")

    if {"fwd", "loss"} <= results.keys():
        print(f"  region loss alone: "
              f"{(results['loss'] - results['fwd']) * 1e3:6.2f} ms")
    if {"loss", "bwd"} <= results.keys():
        print(f"  backward alone:    "
              f"{(results['bwd'] - results['loss']) * 1e3:6.2f} ms")
    if {"bwd", "full", "aug"} <= results.keys():
        print(f"  update/fold/misc:  "
              f"{(results['full'] - results['bwd']) * 1e3:6.2f} ms")
    if "full" in results:
        # fwd+bwd ~= 3x fwd FLOPs (dL/dw + dL/dx per conv)
        tf = 3 * gf * B / results["full"] / 1e3
        print(f"  full step: {gf:.2f} GF/img fwd -> ~{tf:.1f} "
              f"effective TFLOPS (fwd+bwd as 3x fwd)")

    if args.trace:
        jstep = make_train_step(sspec, tcfg, tx)
        holder = {"s": TrainState.create(sparams, tx, jax.random.key(2))}
        holder["s"], m = jstep(holder["s"], images, targets)  # compile
        jax.block_until_ready(m["loss"])
        with jax.profiler.trace(args.trace, create_perfetto_trace=True):
            for _ in range(10):
                holder["s"], m = jstep(holder["s"], images, targets)
            jax.block_until_ready(m["loss"])
        top, pids = parse_perfetto(args.trace)
        if top is None:
            print(f"trace written to {args.trace} (no perfetto json found)")
        else:
            print(f"device tracks: {pids}")
            print(f"{'op':<40s} {'us/step':>9s} {'calls':>6s}")
            for name, (tot, cnt) in top[:25]:
                print(f"{name:<40.40s} {tot / 10:>9.0f} {cnt:>6d}")


if __name__ == "__main__":
    main()
