"""modelcompression_tpu — a TPU-native YOLOv2 model-compression framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``AnishDelft/ModelCompression`` (a YOLOv2/Tiny-YOLOv2 pruning project; see
SURVEY.md for the full blueprint — the reference tree was empty at build time,
so parity obligations are cited as BASELINE.json:<line> throughout).

Subpackages
-----------
core        precision policy (bit-match fp32 vs fast bf16), mesh/sharding setup
models      Darknet .cfg importer, functional Darknet-19/YOLOv2/Tiny-YOLOv2
            forward pass (NHWC, jit-first), Darknet .weights codec
ops         Pallas TPU kernels (fused top-k/mask; plus the parked input-stage
            fusion) + one-program pure-XLA twins — NMS is deliberately XLA
            (top-k + IoU-matrix + scan; measured fastest, docs/PERF.md)
compress    pruning criteria (per-layer magnitude, global threshold, L1
            filter, BN-gamma slimming), mask state, structured channel
            repack + cfg rewrite; int8 PTQ/QAT, k-means weight sharing,
            entropy-coded artifacts, low-rank SVD factorization
native      host-side C++ tier (canonical-Huffman bitstream codec for
            packed artifacts; built on demand, loaded via ctypes)
train       region loss, optax train/fine-tune steps (pjit), iterative loop
evaluation  on-device anchor decode + padded NMS, VOC mAP (11pt + all-point)
data        VOC / COCO-subset pipelines, jittable letterbox/augment, fixtures
parallel    device mesh construction, sharding rules (DP + optional TP)
cli         prune / finetune / eval / train / detect entry points
            (public API mirrors the reference's scripts, BASELINE.json:5)
"""

__version__ = "0.1.0"
