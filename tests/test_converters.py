"""FAIR/SSDD format converters (reference devkits/fair_to_dota.py,
ssdd_to_dota.py, dota_to_fair.py, data_merge.py:68-104)."""
import os
import zipfile
import xml.etree.ElementTree as ET

import numpy as np

from jdet_tpu.data.devkits.converters import (
    dota_to_fair,
    dota_to_fair1m_1_5,
    fair_to_dota,
    fair_xml_to_dota_txt,
    finalize_submission,
    ssdd_to_dota,
)

FAIR_XML = """<?xml version="1.0" encoding="utf-8"?>
<annotation>
  <source><filename>12.tif</filename></source>
  <size><width>100</width><height>100</height><depth>3</depth></size>
  <objects>
    <object>
      <possibleresult><name>small car</name></possibleresult>
      <points>
        <point>10.0, 20.0</point>
        <point>30.0, 20.0</point>
        <point>30.0, 40.0</point>
        <point>10.0, 40.0</point>
        <point>10.0, 20.0</point>
      </points>
    </object>
  </objects>
</annotation>
"""

SSDD_XML = """<annotation>
  <object>
    <name>ship</name>
    <difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
    <rotated_bndbox>
      <x1>10</x1><y1>20</y1><x2>50</x2><y2>24</y2>
      <x3>48</x3><y3>60</y3><x4>8</x4><y4>56</y4>
    </rotated_bndbox>
  </object>
</annotation>
"""


def test_fair_xml_to_dota_txt(tmp_path):
    src = tmp_path / "12.xml"
    src.write_text(FAIR_XML)
    tar = tmp_path / "P0012.txt"
    fair_xml_to_dota_txt(str(src), str(tar))
    lines = tar.read_text().splitlines()
    assert lines[0].startswith("imagesource")
    assert lines[1].startswith("gsd")
    parts = lines[2].split(" ")
    assert parts[8] == "small_car" and parts[9] == "0"
    np.testing.assert_allclose(
        [float(v) for v in parts[:8]], [10, 20, 30, 20, 30, 40, 10, 40]
    )


def test_fair_to_dota_layout(tmp_path):
    import cv2

    src = tmp_path / "fair"
    (src / "images").mkdir(parents=True)
    (src / "labelXml").mkdir()
    cv2.imwrite(str(src / "images" / "12.tif"),
                np.zeros((8, 8, 3), np.uint8))
    (src / "labelXml" / "12.xml").write_text(FAIR_XML)
    out = tmp_path / "dota"
    fair_to_dota(str(src), str(out))
    assert (out / "images" / "P0012.png").exists()
    assert (out / "labelTxt" / "P0012.txt").exists()


def test_ssdd_to_dota(tmp_path):
    import cv2

    imgs = tmp_path / "JPEGImages"
    annos = tmp_path / "Annotations"
    imgs.mkdir()
    annos.mkdir()
    cv2.imwrite(str(imgs / "000001.jpg"), np.zeros((100, 200, 3), np.uint8))
    (annos / "000001.xml").write_text(SSDD_XML)
    out = tmp_path / "out"
    ssdd_to_dota(str(imgs), str(annos), str(out), resize=50, plus=True)
    txt = (out / "labelTxt" / "000001.txt").read_text().splitlines()
    vals = [float(v) for v in txt[0].split(" ")[:8]]
    # x scaled by 50/200, y by 50/100
    np.testing.assert_allclose(vals[:2], [10 * 0.25, 20 * 0.5])
    assert txt[0].split(" ")[8] == "ship"
    import cv2 as _cv2

    assert _cv2.imread(str(out / "images" / "000001.png")).shape[:2] == (50, 50)

    # plus=False expands the axis-aligned box
    out2 = tmp_path / "out2"
    ssdd_to_dota(str(imgs), str(annos), str(out2), resize=100, plus=False)
    vals2 = [
        float(v)
        for v in (out2 / "labelTxt" / "000001.txt")
        .read_text().split(" ")[:8]
    ]
    np.testing.assert_allclose(vals2, [5, 20, 5, 60, 25, 60, 25, 20])


def _submission_dir(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "small_car.txt").write_text(
        "P0012 0.9000 10.0 20.0 30.0 20.0 30.0 40.0 10.0 40.0\n"
    )
    (sub / "plane.txt").write_text(
        "P0012 0.5000 1.0 1.0 2.0 1.0 2.0 2.0 1.0 2.0\n"
        "P0034 0.7000 5.0 5.0 9.0 5.0 9.0 9.0 5.0 9.0\n"
    )
    imgs = tmp_path / "images"
    imgs.mkdir()
    for n in ("P0012.png", "P0034.png", "P0056.png"):
        (imgs / n).write_bytes(b"x")
    return sub, imgs


def test_dota_to_fair_roundtrip(tmp_path):
    sub, imgs = _submission_dir(tmp_path)
    out = tmp_path / "fair_xml"
    dota_to_fair(str(sub), str(out), str(imgs))
    # every image (even detection-less P0056) gets an xml, keyed intified
    assert sorted(os.listdir(out)) == ["12.xml", "34.xml", "56.xml"]
    root = ET.parse(out / "12.xml").getroot()
    objs = root.find("objects").findall("object")
    assert len(objs) == 2
    names = {o.find("possibleresult").find("name").text for o in objs}
    assert names == {"small car", "plane"}
    pts = objs[0].find("points").findall("point")
    assert len(pts) == 5 and pts[0].text == pts[4].text


def test_dota_to_fair1m_csv_and_finalize(tmp_path):
    sub, imgs = _submission_dir(tmp_path)
    csv = dota_to_fair1m_1_5(str(sub), str(tmp_path / "csvdir"), str(imgs),
                             "run1")
    lines = open(csv).read().splitlines()
    assert len(lines) == 3
    assert all(len(l.split(",")) == 11 for l in lines)

    z = finalize_submission(str(sub), str(tmp_path / "final"), "run1",
                            "FAIR", images_dir=str(imgs))
    with zipfile.ZipFile(z) as zf:
        names = zf.namelist()
    assert sorted(names) == ["test/12.xml", "test/34.xml", "test/56.xml"]

    z2 = finalize_submission(str(sub), str(tmp_path / "final2"), "run2",
                             "DOTA")
    with zipfile.ZipFile(z2) as zf:
        assert sorted(zf.namelist()) == ["plane.txt", "small_car.txt"]
