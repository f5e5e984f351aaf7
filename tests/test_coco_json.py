"""COCO instances_*.json loading (data/coco.py) — sparse category-id
remap, iscrowd->difficult, normalized-center conversion, and the CLI
drop-in contract (eval --data instances.json)."""

import json
import os

import numpy as np
import pytest

from modelcompression_tpu.data import load_coco_json, make_fake_coco
from modelcompression_tpu.data.fixtures import FIXTURE_CLASSES


def test_load_coco_json_semantics(tmp_path):
    ann = make_fake_coco(str(tmp_path), n_images=4, image_size=128, seed=0)
    samples, names = load_coco_json(ann)
    assert names == list(FIXTURE_CLASSES)  # sorted by sparse category id
    assert len(samples) == 4
    raw = json.load(open(ann))
    by_img = {}
    for a in raw["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    cat_to_idx = {c["id"]: i for i, c in
                  enumerate(sorted(raw["categories"],
                                   key=lambda c: c["id"]))}
    for im, s in zip(raw["images"], samples):
        anns = by_img.get(im["id"], [])
        assert s.labels.shape == (len(anns), 5)
        assert s.difficult.shape == (len(anns),)
        # image files exist next to the annotation per the COCO layout
        assert os.path.exists(s.image_path)
        for a, row, diff in zip(anns, s.labels, s.difficult):
            x, y, w, h = a["bbox"]
            assert row[0] == cat_to_idx[a["category_id"]]
            np.testing.assert_allclose(
                row[1:], [(x + w / 2) / im["width"],
                          (y + h / 2) / im["height"],
                          w / im["width"], h / im["height"]], rtol=1e-6)
            assert bool(diff) == bool(a["iscrowd"])
        # loader's lazy IO really reads the image
        img = s.load_image()
        assert img.shape == (im["height"], im["width"], 3)


def test_coco_json_edge_cases(tmp_path):
    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    img_dir = tmp_path / "val2017"
    img_dir.mkdir()
    coco = {
        "images": [{"id": 5, "file_name": "a.jpg",
                    "width": 100, "height": 50}],
        "annotations": [
            # degenerate after clipping: dropped
            {"id": 1, "image_id": 5, "category_id": 9,
             "bbox": [120.0, 10.0, 30.0, 10.0], "iscrowd": 0},
            # partially outside: clipped, kept
            {"id": 2, "image_id": 5, "category_id": 9,
             "bbox": [-10.0, 0.0, 30.0, 25.0], "iscrowd": 0},
        ],
        "categories": [{"id": 9, "name": "thing"}],
    }
    path = str(ann_dir / "instances_val2017.json")
    json.dump(coco, open(path, "w"))
    samples, names = load_coco_json(path)
    assert names == ["thing"]
    (s,) = samples
    assert s.labels.shape == (1, 5)
    np.testing.assert_allclose(s.labels[0],
                               [0, 10 / 100, 12.5 / 50, 0.2, 0.5],
                               rtol=1e-6)
    # default image dir follows the <root>/<split>/ convention
    assert s.image_path == str(img_dir / "a.jpg")

    # an image with no annotations still yields an empty-label sample
    coco["images"].append({"id": 6, "file_name": "b.jpg",
                           "width": 10, "height": 10})
    json.dump(coco, open(path, "w"))
    samples, _ = load_coco_json(path)
    assert samples[1].labels.shape == (0, 5)

    # unknown category id / non-COCO file are clean errors
    coco["annotations"][0]["category_id"] = 99
    json.dump(coco, open(path, "w"))
    with pytest.raises(ValueError, match="unknown category"):
        load_coco_json(path)
    json.dump({"images": []}, open(path, "w"))
    with pytest.raises(ValueError, match="missing"):
        load_coco_json(path)


def test_eval_cli_coco_json_drop_in(tmp_path):
    """The drop-in contract: `eval --data instances_*.json` works with
    zero code changes the moment a real COCO tree lands."""
    import jax

    from modelcompression_tpu.cli import eval as eval_cli
    from modelcompression_tpu.data.fixtures import tiny_region_cfg
    from modelcompression_tpu.models import (
        init_params, parse_cfg, save_weights,
    )

    ann = make_fake_coco(str(tmp_path / "coco"), n_images=4,
                         image_size=96, seed=1)
    cfg_path = str(tmp_path / "tiny.cfg")
    open(cfg_path, "w").write(
        tiny_region_cfg(num_classes=3, width=96, height=96))
    spec = parse_cfg(open(cfg_path).read())
    params = init_params(spec, jax.random.key(0))
    w_path = str(tmp_path / "w.weights")
    save_weights(w_path, spec, jax.tree.map(np.asarray, params), seen=0)

    rc = eval_cli.main(["--cfg", cfg_path, "--weights", w_path,
                        "--data", ann, "--batch", "2"])
    assert rc == 0

    # finetune consumes the same json as its train split
    from modelcompression_tpu.cli import finetune
    rc = finetune.main(["--cfg", cfg_path, "--weights", w_path,
                        "--data", ann, "--steps", "1", "--batch", "2",
                        "--max-boxes", "8",
                        "--out", str(tmp_path / "ft.weights")])
    assert rc == 0
