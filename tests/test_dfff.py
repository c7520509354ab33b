"""Dark frame + flat field correction tests."""

import numpy as np

from art_tpu.io import dngwrite
from art_tpu.io.rawfile import load_raw, synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop


def _write(path, cfa):
    dngwrite.write_dng(path, np.asarray(cfa).astype(np.uint16),
                       pattern="RGGB", black=512, white=16383)


def test_dark_frame_subtraction(tmp_path):
    rng = np.random.default_rng(0)
    frame = synthesize_bayer(np.full((3, 96, 128), 0.3), "RGGB")
    # fixed-pattern offset: a bright column band in the dark frame
    dark = np.full(frame.cfa.shape, 512.0)
    dark[:, 40:48] += 900.0
    cfa_noisy = np.asarray(frame.cfa) + (dark - 512.0)
    scene = tmp_path / "scene.dng"
    dframe = tmp_path / "dark.dng"
    _write(scene, cfa_noisy)
    _write(dframe, dark)

    fr = load_raw(scene)
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    out_raw = np.asarray(develop(fr, pp))
    pp.raw.df_enabled = True
    pp.raw.df_file = str(dframe)
    out_df = np.asarray(develop(fr, pp))
    band = np.s_[:, 20:76, 41:47]
    side = np.s_[:, 20:76, 60:120]
    # without DF the band is brighter; with DF it matches the surround
    assert out_raw[band].mean() > out_raw[side].mean() + 0.02
    assert abs(out_df[band].mean() - out_df[side].mean()) < 0.015


def test_flat_field_corrects_vignette(tmp_path):
    h, w = 128, 128
    frame = synthesize_bayer(np.full((3, h, w), 0.4), "RGGB")
    yy, xx = np.mgrid[0:h, 0:w]
    r2 = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (h * h / 4 + w * w / 4)
    vign = 1.0 - 0.45 * r2  # corner falloff
    cfa_vign = 512.0 + (np.asarray(frame.cfa) - 512.0) * vign
    flat = 512.0 + 8000.0 * vign
    scene = tmp_path / "scene.dng"
    ffile = tmp_path / "flat.dng"
    _write(scene, cfa_vign)
    _write(ffile, flat)

    fr = load_raw(scene)
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    out_v = np.asarray(develop(fr, pp))
    pp.raw.ff_enabled = True
    pp.raw.ff_file = str(ffile)
    pp.raw.ff_blur_radius = 16
    out_ff = np.asarray(develop(fr, pp))
    center = np.s_[:, 56:72, 56:72]
    corner = np.s_[:, 8:20, 8:20]
    fall_v = out_v[center].mean() - out_v[corner].mean()
    fall_ff = out_ff[center].mean() - out_ff[corner].mean()
    assert fall_v > 0.05  # vignette visible without FF
    assert abs(fall_ff) < 0.35 * fall_v, (fall_v, fall_ff)


def test_df_ff_autoselect(tmp_path, monkeypatch):
    """dfmanager/ffmanager auto-select: nearest ISO/shutter dark frame and
    matching flat field found by directory scan."""
    from art_tpu.io.dngwrite import write_dng
    from art_tpu.raw import dfff_managers
    from art_tpu.settings import settings

    dfdir = tmp_path / "darkframes"
    dfdir.mkdir()
    rng = np.random.default_rng(0)
    for iso in (100, 800, 3200):
        m = (rng.normal(512, 4, size=(32, 48))).astype(np.uint16)
        write_dng(str(dfdir / f"df_iso{iso}.dng"), m, black=512,
                  white=16383)
    # tag ISO via EXIF is not written by write_dng; fall back: entries
    # carry iso=0 -> manager still returns a deterministic candidate
    monkeypatch.setattr(settings, "dark_frames_dir", str(dfdir))
    monkeypatch.setattr(settings, "flat_fields_dir", str(tmp_path / "none"))
    dfff_managers.reset()
    try:
        mgr = dfff_managers.df_manager()
        assert len(mgr.entries) == 3
        got = mgr.search("ART-TPU", "", 800, 1 / 50)
        assert got and got.endswith(".dng")
        assert dfff_managers.ff_manager().search("X", "Y") is None
    finally:
        dfff_managers.reset()
