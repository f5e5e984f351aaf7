"""Bit-match mode evidence (SURVEY.md §7.4.3): run the SAME fixed-weight
model + inputs through the full eval program under the BITMATCH precision
policy on the host CPU backend and on the real TPU, and report how close
the raw feature maps, decoded detections, and mAP are.

TPU fp32 HIGHEST is multi-pass MXU — near-IEEE but not guaranteed
bit-identical to the CPU's BLAS order, so this records the measured gap
(the oracle-relative bit-match demonstration until reference weights
exist, SURVEY.md §0.3)."""
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from modelcompression_tpu.core.precision import BITMATCH  # noqa: E402
from modelcompression_tpu.data.fixtures import (  # noqa: E402
    FIXTURE_CLASSES, make_fake_voc, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import (  # noqa: E402
    load_list_dataset, read_data_cfg,
)
from modelcompression_tpu.evaluation import (  # noqa: E402
    EvalConfig, evaluate,
)
from modelcompression_tpu.models import init_params, parse_cfg  # noqa
from modelcompression_tpu.models.darknet import (  # noqa: E402
    forward,
)

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
assert tpu.platform != "cpu", "no TPU visible"

spec = parse_cfg(tiny_region_cfg(num_classes=3, width=128, height=128))
with jax.default_device(cpu):
    params = init_params(spec, jax.random.key(0))
params_np = jax.tree.map(np.asarray, params)
rng = np.random.default_rng(0)
images = rng.integers(0, 255, (4, 128, 128, 3), np.uint8)

# raw forward comparison, BITMATCH policy


def run_fwd(device):
    p = jax.device_put(params_np, device)
    x = jax.device_put(images, device)

    @jax.jit
    def f(p, x):
        return forward(p, x.astype(jnp.float32) / 255.0, spec, BITMATCH)

    return np.asarray(f(p, x))


raw_cpu = run_fwd(cpu)
raw_tpu = run_fwd(tpu)
diff = np.abs(raw_cpu - raw_tpu)
rel = diff.max() / (np.abs(raw_cpu).max() + 1e-12)
bit_equal = np.array_equal(raw_cpu, raw_tpu)
print(f"raw feature map: bit-equal={bit_equal}  max abs diff="
      f"{diff.max():.3e}  max rel={rel:.3e}")

# full pipeline mAP comparison on the fixture
with tempfile.TemporaryDirectory() as td:
    data_cfg = make_fake_voc(td, n_images=8, image_size=160, seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])
    # conf low enough that the random-weight net produces detections, so
    # the comparison exercises decode+NMS+mapping, not just zeros
    cfg = EvalConfig(batch_size=4, precision=BITMATCH, fold_bn=False,
                     max_detections=20, conf_thresh=1e-4)
    results = {}
    for name, dev in (("cpu", cpu), ("tpu", tpu)):
        with jax.default_device(dev):
            res = evaluate(jax.device_put(params_np, dev), spec, samples,
                           FIXTURE_CLASSES, cfg)
        results[name] = res
        n_dets = sum(len(v) for v in res.detections.values())
        print(f"{name}: mAP@50 = {res.map50:.6f}  ({n_dets} detections)")
    print(f"mAP delta cpu vs tpu: "
          f"{abs(results['cpu'].map50 - results['tpu'].map50):.2e}")
    # detection-by-detection agreement
    max_box = max_score = 0.0
    mismatched = 0
    for cname in FIXTURE_CLASSES:
        a = sorted(results["cpu"].detections[cname],
                   key=lambda d: (d.image_id, -d.score))
        b = sorted(results["tpu"].detections[cname],
                   key=lambda d: (d.image_id, -d.score))
        if len(a) != len(b):
            mismatched += abs(len(a) - len(b))
            continue
        for da, db in zip(a, b):
            max_score = max(max_score, abs(da.score - db.score))
            max_box = max(max_box, max(abs(x - y) for x, y in
                                       zip(da.box, db.box)))
    print(f"detections: count mismatch={mismatched}, "
          f"max score diff={max_score:.3e}, max box diff={max_box:.3e} px")
