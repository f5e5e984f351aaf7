"""tools/gen_anchors.py — IoU k-means anchor priors (the darknet
gen_anchors workflow). Pinned behaviors: clusters recover well-separated
shape modes, anchors come out area-sorted in cell units, and the CLI
prints a paste-able cfg line from a fixture dataset."""

import numpy as np

import sys
sys.path.insert(0, "tools")
from gen_anchors import kmeans_iou, shape_iou  # noqa: E402

from modelcompression_tpu.data.fixtures import make_fake_voc


def test_kmeans_recovers_separated_modes():
    rng = np.random.default_rng(0)
    modes = np.array([[1.0, 1.5], [4.0, 3.0], [9.0, 8.0]])
    wh = np.concatenate([
        m + rng.normal(0, 0.05, (200, 2)) for m in modes])
    anchors = kmeans_iou(wh, 3, seed=1)
    # area-sorted and close to the true modes
    areas = anchors[:, 0] * anchors[:, 1]
    assert (np.diff(areas) > 0).all()
    np.testing.assert_allclose(anchors, modes, atol=0.1)
    assert shape_iou(wh, anchors).max(1).mean() > 0.9


def test_cli_prints_cfg_line(tmp_path, capsys):
    from gen_anchors import main
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=8, image_size=96,
                             seed=0)
    assert main(["--data", data_cfg, "--num", "3"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("#")
    line = [l for l in out.splitlines() if l.startswith("anchors = ")][0]
    vals = [float(v) for v in line[len("anchors = "):].split(",") if v.strip()]
    assert len(vals) == 6
    assert all(0 < v < 13 for v in vals)  # cell units at net 416


def test_cli_pixel_mode_for_yolo_heads(tmp_path, capsys):
    """--pixels emits network-input-pixel anchors (the [yolo] convention):
    exactly 32x the cell-unit values at the default stride-32 net."""
    from gen_anchors import main
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=8, image_size=96,
                             seed=0)
    def anchors_from(argv):
        assert main(argv) == 0
        out = capsys.readouterr().out
        line = [l for l in out.splitlines()
                if l.startswith("anchors = ")][0]
        return np.asarray([float(v) for v in
                           line[len("anchors = "):].split(",") if v.strip()])

    cells = anchors_from(["--data", data_cfg, "--num", "3"])
    pix = anchors_from(["--data", data_cfg, "--num", "3", "--pixels"])
    np.testing.assert_allclose(pix, cells * 32.0, rtol=1e-4)
    assert (pix > 1).all() and (pix < 416).all()
