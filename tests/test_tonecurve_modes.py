"""Tone-curve mode tests (curves.h:236-356 hierarchy) + CIECAM02 oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.ops import tonecurve as tc_mod
from art_tpu.params import ProcParams

_SCURVE = [1, 0, 0, 0.2, 0.08, 0.7, 0.85, 1, 1]


def _plan(mode, curve=_SCURVE):
    pp = ProcParams()
    pp.tone_curve.enabled = True
    pp.tone_curve.curve_mode = mode
    pp.tone_curve.curve = list(curve)
    planned = tc_mod.plan(pp, {"working_profile": "Rec2020"})
    assert planned is not None
    return planned


def _image(seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.uniform(0, 1, size=(3, 96, 96)) ** 1.8 * 60000)
        .astype(np.float32))


@pytest.mark.parametrize("mode", [
    "Standard", "FilmLike", "Luminance", "WeightedStd",
    "SatAndValueBlending", "Perceptual", "Neutral"])
def test_modes_finite_and_contrast(mode):
    static, data = _plan(mode)
    rgb = _image()
    out = np.asarray(tc_mod.apply(rgb, data, static))
    assert np.isfinite(out).all()
    # an s-curve increases contrast: std of output > std of input
    assert out.std() > np.asarray(rgb).std() * 1.02


@pytest.mark.parametrize("mode,tol", [
    ("Perceptual", 300.0), ("Luminance", 300.0),
    # Neutral's D50->D65 + PQ appearance roundtrip leaves ~0.7% residual
    # chroma on pure gray (the reference's jzazbz path shares this)
    ("Neutral", 800.0)])
def test_modes_gray_stays_gray(mode, tol):
    static, data = _plan(mode)
    gray = jnp.full((3, 8, 8), 20000.0)
    out = np.asarray(tc_mod.apply(gray, data, static))
    assert np.abs(out - out.mean(axis=0)).max() < tol


def test_ciecam02_tc801_oracle():
    """CIE TC8-01 sample: XYZ (19.01, 20, 21.78), white D65-ish
    (95.05, 100, 108.88), La=318.31 -> J=41.73, C=0.1047, h=219.05."""
    from art_tpu.color.ciecam02 import ViewingConditions, xyz_to_jch

    vc = ViewingConditions(white=(95.05, 100.0, 108.88), la=318.31,
                           yb=20.0)
    j, c, h = xyz_to_jch(19.01, 20.0, 21.78, vc.constants())
    assert abs(j - 41.73) < 0.02
    assert abs(c - 0.1047) < 0.002
    assert abs(np.degrees(h) % 360 - 219.05) < 0.1


def test_ciecam02_roundtrip_in_gamut():
    from art_tpu.color.ciecam02 import (ViewingConditions, jch_to_xyz,
                                        xyz_to_jch)
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

    p2x = MATRICES_RGB_TO_XYZ["ProPhoto"]
    k = ViewingConditions(white=tuple(p2x @ np.ones(3) * 100),
                          la=20.0, yb=20.0).constants()
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0.01, 1.0, size=(3, 3000))
    xyz = (p2x @ rgb) * 100.0
    j, c, h = xyz_to_jch(xyz[0], xyz[1], xyz[2], k)
    xr, yr, zr = jch_to_xyz(j, c, h, k)
    err = np.abs(np.stack([xr, yr, zr]) - xyz).max()
    assert err < 0.05, err
