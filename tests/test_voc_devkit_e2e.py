"""VOCdevkit drop-in, end-to-end through the PUBLIC CLI surface
(BASELINE.json:7; VERDICT r1 #6): a devkit-SHAPED tree (Annotations XML +
JPEGImages + ImageSets/Main) drives ``eval --data <devkit-root>`` to a
full 20-class mAP table + devkit-format detection dumps, and
``train --data <devkit-root>`` ingests the trainval split — so the moment
real VOC lands, the headline commands need zero code changes."""

import glob
import os

import jax
import numpy as np

from modelcompression_tpu.data.fixtures import (
    make_fake_voc_devkit, tiny_region_cfg,
)
from modelcompression_tpu.data.voc import VOC_CLASSES, load_voc_devkit
from modelcompression_tpu.models import init_params, parse_cfg, save_weights


def _model20(tmp_path, net=64):
    txt = tiny_region_cfg(num_classes=20, width=net, height=net)
    cfg_path = str(tmp_path / "net20.cfg")
    open(cfg_path, "w").write(txt)
    spec = parse_cfg(txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w20.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, wpath


def test_devkit_loader_reads_fixture_tree(tmp_path):
    root = make_fake_voc_devkit(str(tmp_path / "VOCdevkit"), n_images=6,
                                image_size=96, seed=0)
    samples = load_voc_devkit(root, image_set="test")
    assert len(samples) == 6
    n_boxes = sum(len(s.labels) for s in samples)
    assert n_boxes >= 6
    # class ids map through the real VOC name list
    classes = {int(c) for s in samples for c in s.labels[:, 0]}
    assert classes <= {VOC_CLASSES.index(n)
                       for n in ("aeroplane", "bicycle", "bird")}
    # difficult flags survive the XML round trip
    assert any(s.difficult is not None and s.difficult.any()
               for s in samples)
    # boxes are normalized and inside the frame
    for s in samples:
        if len(s.labels):
            assert (s.labels[:, 1:] >= 0).all()
            assert (s.labels[:, 1:] <= 1).all()
        assert os.path.exists(s.image_path)


def test_eval_cli_on_devkit_root(tmp_path):
    """The literal headline command shape: eval --data <devkit-root>
    --dump-dir — mAP table over the 20 VOC classes + devkit-format
    per-class detection files."""
    from modelcompression_tpu.cli import eval as eval_cli
    root = make_fake_voc_devkit(str(tmp_path / "VOCdevkit"), n_images=4,
                                image_size=96, seed=1)
    cfg_path, wpath = _model20(tmp_path)
    dump = str(tmp_path / "dets")
    rc = eval_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", root, "--image-set", "test",
                        "--batch", "2", "--dump-dir", dump])
    assert rc == 0
    files = sorted(glob.glob(dump + "/comp4_det_test_*.txt"))
    assert len(files) == 20  # one per VOC class, devkit naming
    names = {os.path.basename(f)[len("comp4_det_test_"):-4] for f in files}
    assert names == set(VOC_CLASSES)


def test_train_cli_on_devkit_root(tmp_path):
    """train --data <devkit-root> ingests ImageSets/Main/trainval.txt
    (the darknet training convention when no --image-set is given)."""
    from modelcompression_tpu.cli import train as train_cli
    root = make_fake_voc_devkit(str(tmp_path / "VOCdevkit"), n_images=4,
                                image_size=96, seed=2)
    cfg_path, wpath = _model20(tmp_path)
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                        "--data", root, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8"])
    assert rc == 0
