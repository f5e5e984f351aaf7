#!/usr/bin/env python
"""Reproduce the artifact-size table in docs/PERF.md ("Entropy-coded
artifacts"): full YOLOv2-VOC, 75% unstructured prune, 6-bit codebooks,
then every artifact format side by side with encode/decode timings.
Host-only (CPU pin; no device work beyond mask math, no TPU needed —
run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu on this environment).

Usage:
  python tools/bench_artifacts.py [--sparsity 0.75] [--bits 6]
      [--workdir /tmp/artifact_bench]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sparsity", type=float, default=0.75)
    p.add_argument("--bits", type=int, default=6)
    p.add_argument("--workdir", default="/tmp/artifact_bench")
    args = p.parse_args(argv)

    import jax

    from modelcompression_tpu.compress import (
        apply_masks, cluster_network, load_cmodel, magnitude_masks_perlayer,
        reconstruct, save_cmodel,
    )
    from modelcompression_tpu.models import (
        init_params, save_weights, yolov2_voc,
    )

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    os.makedirs(args.workdir, exist_ok=True)
    d = args.workdir

    spec = yolov2_voc()
    t0 = time.time()
    params = init_params(spec, jax.random.key(0))
    pruned = apply_masks(
        params, magnitude_masks_perlayer(params, spec, args.sparsity))
    np_params = jax.tree.map(np.asarray, pruned)
    print(f"init + prune {args.sparsity:.0%}: {time.time() - t0:.1f}s",
          flush=True)

    t0 = time.time()
    cmodel = cluster_network(np_params, spec, bits=args.bits)
    print(f"cluster {args.bits}-bit: {time.time() - t0:.1f}s", flush=True)
    n_w = sum(int(e["codes"].size) for e in cmodel.values()
              if "codes" in e)

    save_weights(f"{d}/w.weights", spec, np_params, seen=0)
    rows = []
    for name, kw in (("plain", {}), ("huffman", {"pack": "huffman"}),
                     ("fixed", {"pack": "fixed"})):
        path = f"{d}/{name}.npz"
        t0 = time.time()
        save_cmodel(path, cmodel, spec, **kw)
        rows.append((name, path, time.time() - t0))
    t0 = time.time()
    loaded, _ = load_cmodel(f"{d}/huffman.npz")
    t_load = time.time() - t0
    ref = reconstruct(cmodel)
    exact = all(np.array_equal(np.asarray(loaded[k][f]),
                               np.asarray(ref[k][f]))
                for k in ref for f in ref[k])

    print(f"\nn_weights = {n_w}")
    sz_w = os.path.getsize(f"{d}/w.weights")
    print(f"{'artifact':>12} {'MB':>8} {'bits/wt':>8} {'encode s':>9}")
    print(f"{'f32 .weights':>12} {sz_w / 1e6:8.2f} "
          f"{sz_w * 8 / n_w:8.3f} {'-':>9}")
    for name, path, t_enc in rows:
        sz = os.path.getsize(path)
        print(f"{name:>12} {sz / 1e6:8.2f} {sz * 8 / n_w:8.3f} "
              f"{t_enc:9.1f}")
    print(f"\npacked load+reconstruct: {t_load:.1f}s  exact={exact}")
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
