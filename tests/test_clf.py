"""CLF (Common LUT Format) interpreter tests.

Vectors are hand-computed in numpy from the published S-2014-006 spec
formulas (NOT produced by the module under test), plus an independent
cross-check: monCurve with gamma 2.4 / offset 0.055 must reproduce the
sRGB EOTF (the spec designed it so).
"""

import gzip
import os

import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.color.clf import apply_clf, load_clf


def _write(tmp_path, body, name="t.clf", compress=False):
    doc = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<ProcessList id="x" compCLFversion="3.0">\n'
           f"{body}\n</ProcessList>\n")
    p = os.path.join(tmp_path, name)
    if compress:
        with gzip.open(p, "wb") as f:
            f.write(doc.encode())
    else:
        with open(p, "w") as f:
            f.write(doc)
    return p


def _run(path, x):
    sigs, arrays = load_clf(path)
    return np.asarray(apply_clf(jnp.asarray(x, jnp.float32), sigs, arrays))


def _rand_img(seed=0, shape=(3, 4, 5)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=shape).astype(np.float32)


def test_matrix_3x4_with_depth_scaling(tmp_path):
    # 10i output depth: matrix entries are in output scale
    body = """
  <Matrix inBitDepth="32f" outBitDepth="10i">
    <Array dim="3 4">
      1023 0 0 102.3
      0 511.5 0 0
      0 0 1023 0
    </Array>
  </Matrix>"""
    p = _write(str(tmp_path), body)
    x = _rand_img()
    out = _run(p, x)
    exp = np.stack([x[0] + 0.1, 0.5 * x[1], x[2]])
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_lut1d_linear_interp(tmp_path):
    body = """
  <LUT1D inBitDepth="32f" outBitDepth="32f">
    <Array dim="3 1">
      0.0
      0.25
      1.0
    </Array>
  </LUT1D>"""
    p = _write(str(tmp_path), body)
    x = np.full((3, 2, 2), 0.25, np.float32)
    out = _run(p, x)
    np.testing.assert_allclose(out, 0.125, atol=1e-6)  # halfway 0->0.25
    x = np.full((3, 2, 2), 0.75, np.float32)
    out = _run(p, x)
    np.testing.assert_allclose(out, 0.625, atol=1e-6)


def test_lut3d_trilinear_and_tetrahedral(tmp_path):
    # identity 2x2x2 LUT with a scaled red output
    vals = []
    for r in (0.0, 1.0):
        for g in (0.0, 1.0):
            for b in (0.0, 1.0):
                vals.append(f"{r * 0.5} {g} {b}")
    for interp in ("trilinear", "tetrahedral"):
        body = f"""
  <LUT3D inBitDepth="32f" outBitDepth="32f" interpolation="{interp}">
    <Array dim="2 2 2 3">
      {os.linesep.join(vals)}
    </Array>
  </LUT3D>"""
        p = _write(str(tmp_path), body, name=f"l3_{interp}.clf")
        x = _rand_img(1)
        out = _run(p, x)
        exp = np.stack([x[0] * 0.5, x[1], x[2]])
        np.testing.assert_allclose(out, exp, atol=1e-5)


def test_range_scale_and_clamp(tmp_path):
    body = """
  <Range inBitDepth="32f" outBitDepth="32f">
    <minInValue>0.2</minInValue>
    <maxInValue>0.8</maxInValue>
    <minOutValue>0.0</minOutValue>
    <maxOutValue>1.0</maxOutValue>
  </Range>"""
    p = _write(str(tmp_path), body)
    x = np.array([0.2, 0.5, 0.9])[None].repeat(3, 0).reshape(3, 1, 3)
    out = _run(p, x.astype(np.float32))
    exp = np.clip((x - 0.2) / 0.6, 0.0, 1.0)
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_exponent_moncurve_matches_srgb(tmp_path):
    # monCurveFwd gamma=2.4 offset=0.055 == the sRGB decode EOTF
    body = """
  <Exponent inBitDepth="32f" outBitDepth="32f" style="monCurveFwd">
    <ExponentParams exponent="2.4" offset="0.055"/>
  </Exponent>"""
    p = _write(str(tmp_path), body)
    x = np.linspace(0.0, 1.0, 64, dtype=np.float32)[None].repeat(
        3, 0).reshape(3, 8, 8)
    out = _run(p, x)
    srgb = np.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    np.testing.assert_allclose(out, srgb, atol=2e-5)
    # and monCurveRev inverts it
    body_rev = body.replace("monCurveFwd", "monCurveRev")
    p2 = _write(str(tmp_path), body_rev, name="rev.clf")
    back = _run(p2, out)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_exponent_basic(tmp_path):
    body = """
  <Exponent inBitDepth="32f" outBitDepth="32f" style="basicFwd">
    <ExponentParams exponent="2.2"/>
  </Exponent>"""
    p = _write(str(tmp_path), body)
    x = _rand_img(2)
    out = _run(p, x)
    np.testing.assert_allclose(out, x ** 2.2, atol=1e-5)


def test_log_lin_roundtrip(tmp_path):
    params = ('base="10" logSideSlope="0.3" logSideOffset="0.5" '
              'linSideSlope="1.2" linSideOffset="0.01"')
    fwd = f"""
  <Log inBitDepth="32f" outBitDepth="32f" style="linToLog">
    <LogParams {params}/>
  </Log>"""
    rev = fwd.replace("linToLog", "logToLin")
    pf = _write(str(tmp_path), fwd, name="f.clf")
    pr = _write(str(tmp_path), rev, name="r.clf")
    x = _rand_img(3) * 0.9 + 0.05
    y = _run(pf, x)
    # hand-computed: y = 0.3*log10(1.2x + 0.01) + 0.5
    exp = 0.3 * np.log10(1.2 * x + 0.01) + 0.5
    np.testing.assert_allclose(y, exp, atol=1e-5)
    back = _run(pr, y)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_log_camera_break_continuity(tmp_path):
    body = """
  <Log inBitDepth="32f" outBitDepth="32f" style="cameraLinToLog">
    <LogParams base="2" logSideSlope="0.25" logSideOffset="0.6"
     linSideSlope="1.0" linSideOffset="0.008" linSideBreak="0.005"/>
  </Log>"""
    p = _write(str(tmp_path), body)
    # continuity at the break: lin-segment value == log value there
    brk = np.full((3, 1, 1), 0.005, np.float32)
    out_brk = float(_run(p, brk)[0, 0, 0])
    log_at_brk = 0.25 * np.log2(0.005 + 0.008) + 0.6
    assert abs(out_brk - log_at_brk) < 1e-5
    # slope continuity: secant on each side of the break matches
    eps = 1e-4
    lo = float(_run(p, brk - eps)[0, 0, 0])
    hi = float(_run(p, brk + eps)[0, 0, 0])
    assert abs((out_brk - lo) - (hi - out_brk)) < 2e-3 * eps / 1e-4
    # log segment matches hand formula
    x = np.full((3, 1, 1), 0.5, np.float32)
    exp = 0.25 * np.log2(0.5 + 0.008) + 0.6
    np.testing.assert_allclose(_run(p, x), exp, atol=1e-5)


def test_asc_cdl(tmp_path):
    body = """
  <ASC_CDL inBitDepth="32f" outBitDepth="32f" style="Fwd">
    <SOPNode>
      <Slope>1.1 0.9 1.0</Slope>
      <Offset>0.05 -0.02 0.0</Offset>
      <Power>1.2 0.8 1.0</Power>
    </SOPNode>
    <SatNode><Saturation>0.8</Saturation></SatNode>
  </ASC_CDL>"""
    p = _write(str(tmp_path), body)
    x = _rand_img(4)
    out = _run(p, x)
    slope = np.array([1.1, 0.9, 1.0]).reshape(3, 1, 1)
    off = np.array([0.05, -0.02, 0.0]).reshape(3, 1, 1)
    power = np.array([1.2, 0.8, 1.0]).reshape(3, 1, 1)
    y = np.clip(x * slope + off, 0, 1) ** power
    luma = (0.2126 * y[0] + 0.7152 * y[1] + 0.0722 * y[2])[None]
    exp = np.clip(luma + 0.8 * (y - luma), 0, 1)
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_chain_and_clfz(tmp_path):
    body = """
  <Matrix inBitDepth="32f" outBitDepth="32f">
    <Array dim="3 3">0.5 0 0 0 0.5 0 0 0 0.5</Array>
  </Matrix>
  <Exponent inBitDepth="32f" outBitDepth="32f" style="basicFwd">
    <ExponentParams exponent="2.0"/>
  </Exponent>"""
    p = _write(str(tmp_path), body, name="c.clfz", compress=True)
    x = _rand_img(5)
    out = _run(p, x)
    np.testing.assert_allclose(out, (0.5 * x) ** 2, atol=1e-5)


def test_unsupported_node_rejected(tmp_path):
    p = _write(str(tmp_path), '  <Mystery inBitDepth="32f"/>')
    with pytest.raises(ValueError):
        load_clf(p)


def test_filmsim_clf_integration(tmp_path):
    """End-to-end through the filmsim op (ACESp0 conv + strength)."""
    from art_tpu.color import colorspaces as cs
    from art_tpu.ops import filmsim

    body = """
  <Matrix inBitDepth="32f" outBitDepth="32f">
    <Array dim="3 3">0.5 0 0 0 0.5 0 0 0 0.5</Array>
  </Matrix>"""
    p = _write(str(tmp_path), body)

    from art_tpu.params import ProcParams

    pp = ProcParams()
    pp.film_simulation.enabled = True
    pp.film_simulation.clut_filename = p
    pp.film_simulation.strength = 100
    ctx = {"working_profile": "Rec2020"}
    planned = filmsim.plan(pp, ctx)
    assert planned is not None
    static, data = planned
    assert static[0] == "clf"
    x = _rand_img(6) * 65535.0
    out = np.asarray(filmsim.apply(jnp.asarray(x), data, static))
    # a pure channel-scale in ACESp0 linear == 0.5x in any RGB space
    np.testing.assert_allclose(out, 0.5 * x, rtol=1e-4, atol=0.5)
    # strength blend
    pp.film_simulation.strength = 50
    static2, data2 = filmsim.plan(pp, ctx)
    out2 = np.asarray(filmsim.apply(jnp.asarray(x), data2, static2))
    np.testing.assert_allclose(out2, 0.75 * x, rtol=1e-4, atol=0.5)
