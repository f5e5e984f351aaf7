"""VOC/Darknet-list loader edge cases (round-2 review findings)."""


import pytest

from modelcompression_tpu.data.voc import (
    _label_path, load_voc_devkit,
)


def test_label_path_component_replace_and_fallback(tmp_path):
    # normal darknet layout: .../images/x.jpg -> .../labels/x.txt
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = str(tmp_path / "images" / "x.jpg")
    lbl = str(tmp_path / "labels" / "x.txt")
    open(lbl, "w").write("0 0.5 0.5 0.2 0.2\n")
    assert _label_path(img) == lbl

    # 'images' as a SUBSTRING of a component must not be rewritten
    d = tmp_path / "my_images_v2"
    d.mkdir()
    img2 = str(d / "y.jpg")
    sib = str(d / "y.txt")
    open(sib, "w").write("0 0.5 0.5 0.2 0.2\n")
    assert _label_path(img2) == sib

    # rewritten path missing -> sibling fallback
    d3 = tmp_path / "other" / "images"
    d3.mkdir(parents=True)
    img3 = str(d3 / "z.jpg")
    sib3 = str(d3 / "z.txt")
    open(sib3, "w").write("1 0.4 0.4 0.1 0.1\n")
    assert _label_path(img3) == sib3


def test_devkit_missing_annotations_raises(tmp_path):
    vdir = tmp_path / "VOC2007"
    (vdir / "ImageSets" / "Main").mkdir(parents=True)
    (vdir / "JPEGImages").mkdir()
    ids = vdir / "ImageSets" / "Main" / "test.txt"
    ids.write_text("000001\n000002\n")
    with pytest.raises(FileNotFoundError, match="annotation"):
        load_voc_devkit(str(tmp_path))


def test_devkit_per_class_image_set_ids(tmp_path):
    """Per-class set files are 'id flag' pairs; only the id token counts."""
    vdir = tmp_path / "VOC2007"
    (vdir / "ImageSets" / "Main").mkdir(parents=True)
    (vdir / "Annotations").mkdir()
    (vdir / "JPEGImages").mkdir()
    (vdir / "ImageSets" / "Main" / "aeroplane_test.txt").write_text(
        "000001  1\n000002 -1\n")
    xml = """<annotation><size><width>100</width><height>100</height>
    <depth>3</depth></size><object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>50</ymax>
    </bndbox></object></annotation>"""
    (vdir / "Annotations" / "000001.xml").write_text(xml)
    (vdir / "Annotations" / "000002.xml").write_text(xml)
    samples = load_voc_devkit(str(tmp_path), image_set="aeroplane_test")
    assert [s.image_id for s in samples] == ["000001", "000002"]
    assert all(len(s.labels) == 1 for s in samples)
