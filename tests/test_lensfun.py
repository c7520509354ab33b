"""Lensfun XML database parsing, matching, models (rtlensfun.cc role)."""

import numpy as np
import pytest

from art_tpu.lens import lensfun as lf

DB_XML = """<lensdatabase>
 <camera>
  <maker>TestMaker</maker>
  <model>TestMaker Alpha-1</model>
  <mount>TM mount</mount>
  <cropfactor>1.0</cropfactor>
 </camera>
 <camera>
  <maker>TestMaker</maker>
  <model>TestMaker Beta-C</model>
  <mount>TM mount</mount>
  <cropfactor>1.6</cropfactor>
 </camera>
 <lens>
  <maker>TestMaker</maker>
  <model>TestMaker TM 50mm f/1.8</model>
  <mount>TM mount</mount>
  <cropfactor>1.0</cropfactor>
  <calibration>
   <distortion model="ptlens" focal="50" a="0.01" b="-0.03" c="0.005"/>
   <tca model="poly3" focal="50" kr="1.0004" vr="-0.0002" kb="0.9996" vb="0.0002"/>
   <vignetting model="pa" focal="50" aperture="1.8" distance="1000" k1="-0.6" k2="0.2" k3="-0.05"/>
   <vignetting model="pa" focal="50" aperture="5.6" distance="1000" k1="-0.1" k2="0.0" k3="0.0"/>
  </calibration>
 </lens>
 <lens>
  <maker>TestMaker</maker>
  <model>TestMaker TM 24-70mm f/2.8 Zoom</model>
  <mount>TM mount</mount>
  <cropfactor>1.0</cropfactor>
  <calibration>
   <distortion model="poly3" focal="24" k1="0.02"/>
   <distortion model="poly3" focal="70" k1="-0.01"/>
  </calibration>
 </lens>
</lensdatabase>
"""


@pytest.fixture
def db(tmp_path):
    (tmp_path / "testmaker.xml").write_text(DB_XML)
    return lf.LensfunDB(str(tmp_path))


def test_parse_and_match(db):
    assert len(db.cameras) == 2 and len(db.lenses) == 2
    cam = db.find_camera("TestMaker", "Alpha-1")
    assert cam is not None and cam.cropfactor == 1.0
    lens = db.find_lens("TM 50mm f/1.8", cam)
    assert lens is not None and "50mm" in lens.model
    zoom = db.find_lens("TM 24-70mm f/2.8", cam)
    assert zoom is not None and "Zoom" in zoom.model
    assert db.find_lens("Unrelated 500mm catadioptric", cam) is None


def test_distortion_models(db):
    cam = db.find_camera("TestMaker", "Alpha-1")
    lens = db.find_lens("TM 50mm f/1.8", cam)
    corr = db.corrections(lens, cam, 50.0, 1.8)
    assert corr is not None and corr.kind == "spline"
    # ptlens at r=1: a + b + c + 1-a-b-c = 1
    assert np.isclose(corr.dist[-1], 1.0, atol=1e-6)
    # at r=0: 1-a-b-c
    assert np.isclose(corr.dist[0], 1.0 - 0.01 + 0.03 - 0.005, atol=1e-6)
    assert corr.ca is not None
    assert np.isclose(corr.ca[0][0], 1.0004, atol=1e-6)
    assert np.isclose(corr.ca[2][-1], 0.9996 + 0.0002, atol=1e-6)


def test_focal_interpolation(db):
    cam = db.find_camera("TestMaker", "Alpha-1")
    zoom = db.find_lens("TM 24-70mm", cam)
    c24 = db.corrections(zoom, cam, 24.0)
    c70 = db.corrections(zoom, cam, 70.0)
    c47 = db.corrections(zoom, cam, 47.0)
    # poly3 at r=1: 1 - k1 + k1 = 1; at r=0: 1 - k1
    assert np.isclose(c24.dist[0], 0.98, atol=1e-6)
    assert np.isclose(c70.dist[0], 1.01, atol=1e-6)
    k47 = 0.02 + (47.0 - 24.0) / (70.0 - 24.0) * (-0.01 - 0.02)
    assert np.isclose(c47.dist[0], 1.0 - k47, atol=1e-5)


def test_aperture_selection_and_crop_rescale(db):
    cam_ff = db.find_camera("TestMaker", "Alpha-1")
    cam_crop = db.find_camera("TestMaker", "Beta-C")
    lens = db.find_lens("TM 50mm f/1.8", cam_ff)
    wide = db.corrections(lens, cam_ff, 50.0, 1.8)
    narrow = db.corrections(lens, cam_ff, 50.0, 5.6)
    # stronger vignetting wide open: corner sf further from 1
    assert abs(1.0 - wide.vig[-1]) > abs(1.0 - narrow.vig[-1])
    # crop camera sees only the center of the image circle: corner
    # attenuation is milder than full frame
    crop = db.corrections(lens, cam_crop, 50.0, 1.8)
    assert abs(1.0 - crop.vig[-1]) < abs(1.0 - wide.vig[-1])


def test_pipeline_lfmanual(tmp_path):
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image
    from art_tpu.settings import settings

    (tmp_path / "db.xml").write_text(DB_XML)
    old = settings.lensfun_db_dir
    settings.lensfun_db_dir = str(tmp_path)
    try:
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rgb = np.broadcast_to(0.3 + 0.2 * np.sin(xx / 4.0),
                              (3, h, w)).astype(np.float32).copy()
        frame = synthesize_bayer(rgb)
        frame.exif["focal_length"] = 50.0
        frame.exif["f_number"] = 1.8
        pp = ProcParams()
        pp.lens_prof.method = "lfmanual"
        pp.lens_prof.lf_camera_make = "TestMaker"
        pp.lens_prof.lf_camera_model = "Alpha-1"
        pp.lens_prof.lf_lens = "TM 50mm f/1.8"
        pp.lens_prof.use_dist = True
        pp.lens_prof.use_vign = True
        out = np.asarray(process_image(frame, pp))
        base = np.asarray(process_image(frame, ProcParams()))
        assert np.abs(out.astype(np.float64)
                      - base.astype(np.float64)).max() > 0.02
    finally:
        settings.lensfun_db_dir = old
        lf._DB_DIR = None
