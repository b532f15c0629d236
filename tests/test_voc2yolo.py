"""voc2yolo converter: label math vs hand-computed values, difficult-object
filtering, and the voc_07_12 assembly layout (reference behavior:
yolov6/data/voc2yolo.py — including the fix for its images/{set} vs
images/{set}{year} mismatch, see tools/voc2yolo.py docstring)."""

import os
import os.path as osp
import sys

import conftest  # noqa: F401

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))
from voc2yolo import assemble_voc0712, convert_split, parse_voc_xml, yolo_lines  # noqa: E402

_XML = """<annotation>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  <object>
    <name>car</name><difficult>0</difficult>
    <bndbox><xmin>50</xmin><ymin>20</ymin><xmax>150</xmax><ymax>80</ymax></bndbox>
  </object>
  <object>
    <name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
  <object>
    <name>unicorn</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>
"""


def _make_voc(root, year, image_set, ids):
    os.makedirs(osp.join(root, f"VOC{year}", "ImageSets", "Main"),
                exist_ok=True)
    os.makedirs(osp.join(root, f"VOC{year}", "JPEGImages"), exist_ok=True)
    os.makedirs(osp.join(root, f"VOC{year}", "Annotations"), exist_ok=True)
    with open(osp.join(root, f"VOC{year}", "ImageSets", "Main",
                       f"{image_set}.txt"), "w") as f:
        f.write("\n".join(ids))
    for i in ids:
        with open(osp.join(root, f"VOC{year}", "JPEGImages", f"{i}.jpg"),
                  "wb") as f:
            f.write(b"\xff\xd8fakejpg")
        with open(osp.join(root, f"VOC{year}", "Annotations", f"{i}.xml"),
                  "w") as f:
            f.write(_XML)


def test_label_math_and_filtering(tmp_path):
    xml = tmp_path / "a.xml"
    xml.write_text(_XML)
    w, h, boxes = parse_voc_xml(str(xml))
    assert (w, h) == (200, 100)
    # difficult person and unknown unicorn are dropped
    assert len(boxes) == 1 and boxes[0][0] == 6  # car
    lines = yolo_lines(w, h, boxes).strip().split("\n")
    cls, cx, cy, bw, bh = lines[0].split()
    # centers carry the VOC 1-pixel origin shift, sizes don't
    assert cls == "6"
    assert abs(float(cx) - (100 - 1) / 200) < 1e-9
    assert abs(float(cy) - (50 - 1) / 100) < 1e-9
    assert abs(float(bw) - 100 / 200) < 1e-9
    assert abs(float(bh) - 60 / 100) < 1e-9


def test_convert_and_assemble(tmp_path):
    root = str(tmp_path)
    _make_voc(root, "2007", "train", ["a1", "a2"])
    _make_voc(root, "2007", "test", ["t1"])
    _make_voc(root, "2012", "train", ["b1"])
    assert convert_split(root, "2007", "train") == 2
    assert convert_split(root, "2007", "test") == 1
    assert convert_split(root, "2012", "train") == 1
    assert convert_split(root, "2012", "val") == 0  # missing split: warn only

    out = assemble_voc0712(root, link=True)
    train_imgs = sorted(os.listdir(osp.join(out, "images", "train")))
    val_imgs = sorted(os.listdir(osp.join(out, "images", "val")))
    assert train_imgs == ["a1.jpg", "a2.jpg", "b1.jpg"]
    assert val_imgs == ["t1.jpg"]
    # labels travel with images, and every label parses as YOLO rows
    for split, names in (("train", train_imgs), ("val", val_imgs)):
        for n in names:
            p = osp.join(out, "labels", split, n.replace(".jpg", ".txt"))
            rows = [r.split() for r in open(p).read().strip().split("\n")]
            assert all(len(r) == 5 for r in rows)
