"""ProcParams / .arp codec tests, including reference bundled profiles."""

import glob

import pytest

from art_tpu.params import KeyFile, ProcParams

REF_PROFILES = sorted(glob.glob("/root/reference/rtdata/profiles/*.arp"))


def test_defaults_match_reference():
    pp = ProcParams()
    # reference constructor defaults (procparams.cc)
    assert pp.exposure.enabled is True
    assert pp.exposure.hrmode == "Off"
    assert pp.wb.method == "Camera"
    assert pp.wb.temperature == 6504
    assert pp.tone_curve.curve_mode == "Neutral"
    assert pp.raw.bayer.method == "amaze"
    assert pp.icm.working_profile == "Rec2020"


def test_roundtrip_identity():
    pp = ProcParams()
    pp.exposure.expcomp = 1.25
    pp.tone_curve.enabled = True
    pp.tone_curve.curve = [1, 0, 0, 0.5, 0.6, 1, 1]
    text = pp.to_keyfile().dump()
    pp2 = ProcParams()
    pp2.update_from_keyfile(KeyFile.parse(text))
    assert pp2.exposure.expcomp == 1.25
    assert pp2.tone_curve.enabled is True
    assert pp2.tone_curve.curve == [1, 0, 0, 0.5, 0.6, 1, 1]


def test_partial_update_preserves_unmentioned():
    pp = ProcParams()
    pp.exposure.expcomp = 2.0
    # a keyfile mentioning only WB must not reset exposure
    kf = KeyFile.parse("[White Balance]\nTemperature=5000\n")
    pp.update_from_keyfile(kf)
    assert pp.exposure.expcomp == 2.0
    assert pp.wb.temperature == 5000


@pytest.mark.parametrize("path", REF_PROFILES)
def test_load_reference_bundled_profiles(path):
    pp = ProcParams.load(path)
    assert pp.pp_version >= 346  # all bundled profiles carry a Version


def test_film_curve_profile_values():
    path = "/root/reference/rtdata/profiles/Standard Film Curve.arp"
    pp = ProcParams.load(path)
    assert pp.tone_curve.enabled is True
    assert pp.tone_curve.curve_mode == "Neutral"
    assert pp.tone_curve.curve[0] == 1  # spline
    assert pp.exposure.hrmode == "ColorSoft"  # "Balanced" on disk
    assert pp.tone_curve.white_point == 1


def test_noise_reduction_profile_values():
    path = "/root/reference/rtdata/profiles/Noise Reduction Low.arp"
    pp = ProcParams.load(path)
    assert pp.denoise.enabled is True
    assert pp.denoise.gamma == 1.7
    assert pp.denoise.chrominance_method == 1
    assert pp.denoise.guided_chroma_strength == 100


def test_unknown_groups_preserved():
    text = "[SomeFutureTool]\nEnabled=true\nStrength=5\n"
    pp = ProcParams()
    pp.update_from_keyfile(KeyFile.parse(text))
    out = pp.to_keyfile().dump()
    assert "[SomeFutureTool]" in out
    assert "Strength=5" in out


def test_camconst_bundled_db():
    """init() must populate the store from the bundled DB (init.cc:100-110)."""
    import art_tpu
    from art_tpu.raw import camconst

    art_tpu.init()
    cc = camconst.get_instance()
    c = cc.get("Canon", "EOS 5D Mark III")
    assert c is not None
    assert c.white_levels(800) == [15180.0] * 4
    assert c.white_levels(160) == [13200.0] * 4
    assert c.dcraw_matrix()[0] == 6722.0
    assert cc.get("Nonexistent", "Camera") is None
    # breadth: the bundled DB carries the full camera set
    assert len(cc._db) > 200
    # pdaf patterns survive the bundling (pdaflinesfilter.cc consumers)
    sony = cc.get("Sony", "ILCE-7M3")
    assert sony is None or sony.pdaf() is not None


def test_cli_make_icc_and_check_lut(tmp_path):
    """--make-icc / --check-lut entry points (main-cli.cc:105-146)."""
    import os

    from art_tpu.cli import check_lut_main, make_icc_main

    out = str(tmp_path / "o.icc")
    assert make_icc_main(["-p", "ProPhoto", "-d", "X", "-o", out]) == 0
    assert os.path.getsize(out) > 500
    assert make_icc_main(["-p", "nope", "-o", str(tmp_path / "n.icc")]) == 1

    cube = tmp_path / "t.cube"
    cube.write_text("LUT_3D_SIZE 2\n" + "0 0 0\n" * 8)
    assert check_lut_main([str(cube)]) == 0
    bad = tmp_path / "bad.cube"
    bad.write_text("nonsense\n")
    assert check_lut_main([str(bad)]) == 1


def test_procparams_with_snapshots_roundtrip(tmp_path):
    """[Snapshots] sidecar sections (procparams.cc:6311): named snapshot
    params stored with group prefixes roundtrip."""
    from art_tpu.params.procparams import ProcParams, ProcParamsWithSnapshots

    obj = ProcParamsWithSnapshots()
    obj.master.exposure.enabled = True
    obj.master.exposure.expcomp = 0.5
    snap = ProcParams()
    snap.exposure.enabled = True
    snap.exposure.expcomp = -1.0
    snap.denoise.enabled = True
    obj.snapshots.append(("moody", snap))
    p = str(tmp_path / "s.arp")
    obj.save(p)

    back = ProcParamsWithSnapshots.load(p)
    assert back.master.exposure.expcomp == 0.5
    assert len(back.snapshots) == 1
    name, spp = back.snapshots[0]
    assert name == "moody"
    assert spp.exposure.expcomp == -1.0
    assert spp.denoise.enabled

    # plain ProcParams.load of the same file sees only the master
    pp = ProcParams.load(p)
    assert pp.exposure.expcomp == 0.5
