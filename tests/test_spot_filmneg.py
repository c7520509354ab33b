"""Spot removal + film negative tests."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.params.procparams import SpotEntry
from art_tpu.pipeline import develop


def test_spot_clones_source_over_target():
    rgb = np.full((3, 128, 128), 0.5)
    # dark blemish at (64, 64)
    rgb[:, 60:68, 60:68] = 0.1
    frame = synthesize_bayer(rgb, "RGGB")
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.spot.enabled = True
    pp.spot.entries = [SpotEntry(source_x=30, source_y=30,
                                 target_x=64, target_y=64,
                                 radius=10, feather=0.5, opacity=1.0)]
    out = np.asarray(develop(frame, pp))
    pp2 = ProcParams()
    pp2.icm.working_profile = "sRGB"
    base = np.asarray(develop(frame, pp2))
    # blemish region healed toward the flat 0.5 background
    spot_out = out[:, 61:67, 61:67].mean()
    spot_base = base[:, 61:67, 61:67].mean()
    bg = base[:, 28:33, 28:33].mean()
    assert abs(spot_out - bg) < 0.02, (spot_out, bg)
    assert spot_base < bg - 0.1
    # far away pixels untouched
    np.testing.assert_allclose(out[:, 100:, 100:], base[:, 100:, 100:],
                               atol=1e-5)


def test_spot_heal_adapts_to_gradient():
    """GIMP-heal (ipspot.cc:154): the Laplace fill takes its levels from
    the target's surroundings, so healing a blemish on a gradient with a
    source from a *different* brightness region still lands on the local
    gradient value — plain cloning would paste the source level."""
    h, w = 128, 160
    ramp = np.linspace(0.2, 0.8, w, dtype=np.float32)
    rgb = np.broadcast_to(ramp, (3, h, w)).copy()
    rgb[:, 58:70, 114:126] = 0.05  # blemish on the bright side
    frame = synthesize_bayer(rgb, "RGGB")
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.spot.enabled = True
    # source on the dark side (value ~0.3), target on the bright (~0.65)
    pp.spot.entries = [SpotEntry(source_x=30, source_y=64,
                                 target_x=120, target_y=64,
                                 radius=12, feather=0.4, opacity=1.0)]
    out = np.asarray(develop(frame, pp))
    pp2 = ProcParams()
    pp2.icm.working_profile = "sRGB"
    base = np.asarray(develop(frame, pp2))
    # healed center matches the local (bright) surroundings, not the
    # dark source level
    healed = out[:, 60:68, 116:124].mean()
    local = base[:, 40:50, 116:124].mean()  # same columns, clean rows
    source = base[:, 60:68, 26:34].mean()
    assert abs(healed - local) < 0.06, (healed, local)
    assert healed > source + 0.15, (healed, source)


def test_spot_arp_roundtrip(tmp_path):
    pp = ProcParams()
    pp.spot.enabled = True
    pp.spot.entries = [SpotEntry(source_x=10, source_y=20, target_x=30,
                                 target_y=40, radius=15, feather=0.25,
                                 opacity=0.8, detail=1)]
    f = tmp_path / "spots.arp"
    pp.save(f)
    pp2 = ProcParams.load(f)
    assert pp2.spot.enabled
    e = pp2.spot.entries[0]
    assert (e.source_x, e.source_y, e.target_x, e.target_y) == (10, 20, 30, 40)
    assert e.radius == 15 and abs(e.feather - 0.25) < 1e-9
    assert abs(e.opacity - 0.8) < 1e-9 and e.detail == 1


def test_film_negative_inverts():
    # darker negative regions must come out brighter than lighter ones
    rgb = np.full((3, 96, 96), 0.6)
    rgb[:, :, 48:] = 0.2  # this half is darker on the negative
    frame = synthesize_bayer(rgb, "RGGB")
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.film_negative.enabled = True
    out = np.asarray(develop(frame, pp))
    left = out[:, 20:76, 8:40].mean()
    right = out[:, 20:76, 56:88].mean()
    assert right > left + 0.1, (left, right)


def test_film_negative_with_refs():
    rgb = np.full((3, 96, 96), 0.5)
    frame = synthesize_bayer(rgb, "RGGB")
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.film_negative.enabled = True
    pp.film_negative.ref_input = [20000.0, 20000.0, 20000.0]
    pp.film_negative.ref_output = [30000.0, 30000.0, 30000.0]
    out = np.asarray(develop(frame, pp))
    assert np.isfinite(out).all()
    assert out.std() < 0.05  # flat in, flat out
