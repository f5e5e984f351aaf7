"""Weight sharing via per-layer k-means codebooks — Deep Compression's
second stage (Han et al. 2016), the framework's fourth compression axis
(prune / int8 / distill / share).

Each conv weight tensor is replaced by a tiny codebook of 2^bits shared
f32 values plus one small integer code per weight. Pruned zeros are
EXACT: when a layer contains zeros (a magnitude-pruned model), code 0 is
pinned to 0.0 and only the nonzero weights are clustered into the
remaining 2^bits - 1 slots — so weight sharing composes losslessly with
the sparsity the pruning axis produced. BN/bias vectors stay f32 (they
are a rounding error of the total size).

TPU-first shape: the codec is a HOST-side storage format. ``load_cmodel``
reconstructs a standard f32 params pytree at load time, so serving runs
the exact same jitted programs as an uncompressed model — zero runtime
cost, no custom kernels, and the artifact drops into every existing
surface (eval/detect ``--cmodel``). k-means itself is 1-D, solved with
sorted-midpoint assignment (searchsorted, O(n log k) per sweep) and
Deep Compression's linear centroid init, deterministic by construction.

Workflow::

    cmodel = cluster_network(params, spec, bits=6)
    params2 = reconstruct(cmodel)          # <= 2^6 distinct values/layer
    save_cmodel(path, cmodel, spec)        # one .npz, ~5x under .weights
    params2, spec = load_cmodel(path)      # serving

CLI surface: ``eval --cluster-bits N [--save-cmodel PATH]``,
``eval/detect --cmodel PATH``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from modelcompression_tpu.models.cfg import NetworkSpec, parse_cfg
from modelcompression_tpu.models.darknet import Params

# one clustered entry: {"codes": uintN (w.shape), "codebook": (K,) f32,
# <other param fields verbatim f32>}
CModel = Dict[str, Dict[str, np.ndarray]]


def _kmeans_1d(x: np.ndarray, k: int, iters: int = 25) -> np.ndarray:
    """Deterministic 1-D k-means: linear init over [min, max] (the init
    Deep Compression found best for weights), sorted-midpoint assignment.
    Returns the sorted (k,) centroid vector (empty clusters keep their
    position, preserving the sorted invariant)."""
    lo, hi = float(x.min()), float(x.max())
    if lo == hi:
        return np.full(k, lo, np.float32)
    c = np.linspace(lo, hi, k).astype(np.float32)
    for _ in range(iters):
        mids = (c[1:] + c[:-1]) / 2
        idx = np.searchsorted(mids, x)
        sums = np.bincount(idx, weights=x, minlength=k)
        cnts = np.bincount(idx, minlength=k)
        nz = cnts > 0
        new = c.copy()
        new[nz] = (sums[nz] / cnts[nz]).astype(np.float32)
        if np.array_equal(new, c):
            break
        c = np.sort(new)
    return c


def cluster_layer(w: np.ndarray, bits: int, iters: int = 25
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster one weight tensor into 2^bits shared values.

    Returns (codes, codebook): ``codebook[codes]`` reconstructs the
    tensor. Exact-zero weights (pruning) map to an exact 0.0 slot; only
    nonzeros are clustered. A tensor with <= 2^bits distinct values
    round-trips EXACTLY (k-means fixed point at zero inertia).
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    k = 1 << bits
    flat = np.asarray(w, np.float32).ravel()
    zeros = flat == 0.0
    has_zero = bool(zeros.any())
    vals = flat[~zeros] if has_zero else flat

    uniq = np.unique(vals)
    n_slots = k - 1 if has_zero else k
    if uniq.size <= n_slots:
        cb_nz = uniq.astype(np.float32)
    else:
        cb_nz = _kmeans_1d(vals, n_slots, iters=iters)
    codebook = (np.concatenate([[np.float32(0.0)], cb_nz])
                if has_zero else cb_nz)

    # nearest-centroid codes for the whole tensor in one pass: zeros pin
    # to slot 0; nonzeros assign within the nonzero sub-book
    mids = (cb_nz[1:] + cb_nz[:-1]) / 2
    nz_codes = np.searchsorted(mids, flat).astype(np.int64)
    codes = nz_codes + (1 if has_zero else 0)
    if has_zero:
        codes[zeros] = 0
    dtype = np.uint8 if codebook.size <= 256 else np.uint16
    return codes.astype(dtype).reshape(w.shape), codebook


def cluster_network(params: Params, spec: NetworkSpec, bits: int = 6,
                    iters: int = 25) -> CModel:
    """Cluster every conv's ``w``; all other fields (bias/BN vectors)
    pass through as f32."""
    out: CModel = {}
    for key, entry in params.items():
        e: Dict[str, np.ndarray] = {}
        for field, v in entry.items():
            v = np.asarray(v)
            if field == "w":
                codes, cb = cluster_layer(v, bits, iters=iters)
                e["codes"] = codes
                e["codebook"] = cb
            else:
                e[field] = v.astype(np.float32)
        out[key] = e
    return out


def reconstruct(cmodel: CModel) -> Params:
    """Expand codebooks back to a standard f32 params pytree (the form
    every existing forward/eval/fine-tune program consumes)."""
    import jax.numpy as jnp
    params: Params = {}
    for key, e in cmodel.items():
        entry = {f: jnp.asarray(v) for f, v in e.items()
                 if f not in ("codes", "codebook")}
        if "codes" in e:
            entry["w"] = jnp.asarray(
                e["codebook"][e["codes"].astype(np.int64)])
        params[key] = entry
    return params


def save_cmodel(path: str, cmodel: CModel, spec: NetworkSpec,
                pack: Optional[str] = None) -> None:
    """One standalone .npz artifact: codes + codebooks + f32 vectors +
    the architecture cfg (the save_qmodel convention). At 6 bits a
    YOLOv2 artifact is ~4-5x smaller than its f32 ``.weights`` before
    npz's own compression; pruned models compress further (zero codes
    are runs).

    ``pack='huffman'`` (or ``'fixed'``) additionally entropy-codes each
    code tensor — Deep Compression's stage 3 (`compress/packing.py`).
    Packed artifacts use an UNcompressed npz container so the on-disk
    size is the entropy code's own (zlib can no longer shrink a Huffman
    payload, and the remaining f32 vectors are a rounding error);
    ``load_cmodel`` detects and unpacks either format transparently.
    """
    from modelcompression_tpu.compress.packing import pack_codes
    from modelcompression_tpu.models.cfg import dump_cfg
    flat = {"__cfg__": np.array(dump_cfg(spec))}
    for key, e in cmodel.items():
        for field, v in e.items():
            if pack is not None and field == "codes":
                k = int(np.asarray(e["codebook"]).size)
                for pf, pv in pack_codes(np.asarray(v), k, pack).items():
                    flat[f"{key}/{pf}"] = pv
            else:
                flat[f"{key}/{field}"] = np.asarray(v)
    with open(path, "wb") as f:  # exact path (np would append .npz)
        (np.savez if pack is not None else np.savez_compressed)(f, **flat)


def load_cmodel(path: str, spec: Optional[NetworkSpec] = None
                ) -> Tuple[Params, NetworkSpec]:
    """Load a ``save_cmodel`` artifact and reconstruct the f32 pytree.
    With ``spec`` given, the embedded architecture must match (same
    guard as load_qmodel). Reconstruction is exact: codebook gathers
    round-trip bit-identically through npz, and the entropy codec
    (packed artifacts, `compress/packing.py`) is lossless by
    construction."""
    from modelcompression_tpu.compress.packing import unpack_codes
    from modelcompression_tpu.compress.quantize import _arch_mismatch
    with np.load(path, allow_pickle=False) as z:
        loaded_spec = parse_cfg(str(z["__cfg__"][()]))
        if spec is not None:
            diff = _arch_mismatch(spec, loaded_spec)
            if diff is not None:
                raise ValueError(
                    f"cmodel {path} was saved for a different "
                    f"architecture: {diff}")
        cmodel: CModel = {}
        for k in z.files:
            if k == "__cfg__":
                continue
            key, field = k.rsplit("/", 1)
            cmodel.setdefault(key, {})[field] = z[k]
    pack_fields = ("payload", "huff_lengths", "fixed_bits", "pack_shape")
    for key, e in cmodel.items():
        if "payload" in e:
            e["codes"] = unpack_codes(e)
            for pf in pack_fields:
                e.pop(pf, None)
    return reconstruct(cmodel), (spec if spec is not None else loaded_spec)
