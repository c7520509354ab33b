"""Curve engine tests (reference semantics: diagonalcurves.cc/flatcurves.cc)."""

import numpy as np

from art_tpu.color.curves import (
    DCT_CATMULL_ROM,
    DCT_LINEAR,
    DCT_NURBS,
    DCT_PARAMETRIC,
    DCT_SPLINE,
    DiagonalCurve,
    FlatCurve,
)


def test_identity_detection():
    # identity diagonal -> empty
    c = DiagonalCurve([DCT_SPLINE, 0, 0, 0.5, 0.5, 1, 1])
    assert c.is_identity()
    t = np.linspace(0, 1, 11)
    np.testing.assert_allclose(c.get_val(t), t)


def test_short_list_is_identity():
    assert DiagonalCurve([0]).is_identity()
    assert DiagonalCurve([]).is_identity()


def test_linear_curve():
    c = DiagonalCurve([DCT_LINEAR, 0, 0, 0.5, 0.25, 1, 1])
    assert not c.is_identity()
    assert np.isclose(c.get_val(0.5), 0.25)
    assert np.isclose(c.get_val(0.25), 0.125)
    # clamp outside control range
    assert np.isclose(c.get_val(-0.1), 0.0)
    assert np.isclose(c.get_val(1.1), 1.0)


def test_spline_interpolates_control_points():
    pts = [DCT_SPLINE, 0, 0, 0.25, 0.15, 0.5, 0.6, 0.75, 0.8, 1, 1]
    c = DiagonalCurve(pts)
    xs = pts[1::2]
    ys = pts[2::2]
    np.testing.assert_allclose(c.get_val(np.array(xs)), ys, atol=1e-9)
    # smooth and monotone-ish between these points
    t = np.linspace(0, 1, 1001)
    v = c.get_val(t)
    assert v.min() >= 0.0 and v.max() <= 1.0 + 1e-9


def test_catmull_rom_interpolates_control_points():
    pts = [DCT_CATMULL_ROM, 0, 0, 0.11, 0.09, 0.32, 0.47, 0.66, 0.87, 1, 1]
    c = DiagonalCurve(pts)
    xs = np.array(pts[1::2])
    ys = np.array(pts[2::2])
    np.testing.assert_allclose(c.get_val(xs), ys, atol=5e-3)


def test_nurbs_endpoint_exact():
    pts = [DCT_NURBS, 0, 0, 0.4, 0.2, 0.6, 0.8, 1, 1]
    c = DiagonalCurve(pts)
    assert np.isclose(c.get_val(0.0), 0.0, atol=1e-6)
    assert np.isclose(c.get_val(1.0), 1.0, atol=1e-6)
    v = c.get_val(np.linspace(0, 1, 101))
    assert np.all(np.diff(v) >= -1e-6)  # monotone for monotone control points


def test_parametric_curve_basic():
    # shadows/lights/darks/highlights all zero -> identity
    c = DiagonalCurve([DCT_PARAMETRIC, 0.25, 0.5, 0.75, 0, 0, 0, 0])
    assert c.is_identity()
    # positive lights should brighten midtones
    c2 = DiagonalCurve([DCT_PARAMETRIC, 0.25, 0.5, 0.75, 0, 50, 0, 0])
    assert not c2.is_identity()
    assert c2.get_val(0.5) > 0.45
    assert np.isclose(c2.get_val(0.0), 0.0, atol=1e-9)


def test_lut_shape_and_endpoints():
    c = DiagonalCurve([DCT_SPLINE, 0, 0, 0.25, 0.15, 0.5, 0.6, 1, 1])
    lut = c.lut(65536)
    assert lut.shape == (65536,)
    assert lut.dtype == np.float32
    assert np.isclose(lut[0], 0.0, atol=1e-6)
    assert np.isclose(lut[-1], 1.0, atol=1e-6)


def test_flat_curve_identity():
    fc = FlatCurve([1, 0.2, 0.5, 0.35, 0.35, 0.8, 0.5, 0.35, 0.35])
    assert fc.is_identity()
    np.testing.assert_allclose(fc.get_val(np.linspace(0, 1, 5)), 0.5)


def test_flat_curve_bump():
    # single raised point, periodic
    fc = FlatCurve([1, 0.5, 0.8, 0.35, 0.35, 0.0, 0.5, 0.35, 0.35])
    assert not fc.is_identity()
    assert np.isclose(fc.get_val(0.5), 0.8, atol=1e-2)
    assert fc.get_val(0.0) < 0.6
    # periodicity: value at 0 == value at 1
    assert np.isclose(fc.get_val(0.0), fc.get_val(1.0), atol=1e-6)


def test_flat_curve_from_reference_profile():
    # Saturation curve from rtdata/profiles/Standard Film Curve.arp
    pts = [1, 0, 0.48, 0.34, 0.34999, 1, 0.48, 0.35, 0.35]
    fc = FlatCurve(pts, periodic=True)
    assert not fc.is_identity()
    v = fc.get_val(np.linspace(0, 1, 33))
    assert np.all(v >= 0.0) and np.all(v <= 1.0)
