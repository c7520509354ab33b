"""User .badpixels file tests."""

import numpy as np

from art_tpu.raw.badpixfile import (badpixel_mask, find_badpixels_for,
                                    parse_badpixels_file)


def test_parse_with_offset(tmp_path):
    f = tmp_path / "X Y.badpixels"
    f.write_text("2\n10 20\n30 40\n")
    pts = parse_badpixels_file(f)
    assert pts == [(12, 22), (32, 42)]


def test_parse_plain(tmp_path):
    f = tmp_path / "X Y.badpixels"
    f.write_text("10 20\n30 40\ngarbage line\n")
    pts = parse_badpixels_file(f)
    assert pts == [(10, 20), (30, 40)]


def test_find_case_insensitive(tmp_path, monkeypatch):
    (tmp_path / "NIKON Z8.badpixels").write_text("1 1\n")
    monkeypatch.setenv("ART_TPU_DARKFRAMES", str(tmp_path))
    assert find_badpixels_for("Nikon", "z8") is not None
    assert find_badpixels_for("Canon", "R5") is None


def test_pipeline_interpolates(tmp_path, monkeypatch):
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop

    (tmp_path / "ART-TPU Synthetic.badpixels").write_text("40 30\n41 30\n")
    monkeypatch.setenv("ART_TPU_DARKFRAMES", str(tmp_path))
    frame = synthesize_bayer(np.full((3, 96, 96), 0.4), "RGGB")
    cfa = np.asarray(frame.cfa).copy()
    cfa[30, 40] = 16000.0
    cfa[30, 41] = 100.0
    frame.cfa = cfa
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    out = np.asarray(develop(frame, pp))
    flat = out[:, 60:66, 60:66].mean()
    assert np.abs(out[:, 28:34, 38:44] - flat).max() < 0.05


def test_mask_bounds():
    m = badpixel_mask([(5, 3), (100, 100)], (10, 10))
    assert m[3, 5] and m.sum() == 1
