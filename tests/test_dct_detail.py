"""Block-DCT luminance detail recovery (FTblockDN.cc:1479)."""

import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.ops.dct_detail import (_DCT_F, _DCT_I, _TOTWT, STRIDE, TS,
                                    compute_detail, dct_detail_recovery,
                                    detail_mask)


def test_dct_roundtrip_fftw_scaling():
    # REDFT10 then REDFT01 with the folded 1/(2N)-per-axis norm is exact
    x = np.random.RandomState(0).randn(TS, TS).astype(np.float32)
    y = _DCT_I @ (_DCT_F @ x @ _DCT_F.T) @ _DCT_I.T
    assert np.abs(y - x).max() < 1e-3


def test_compute_detail_matches_reference_formula():
    # compute_detail(d) = ((100-d)^2 + 50(100-d))^2 * (TS/2)^2
    for d in (0.0, 50.0, 99.9):
        t = 100.0 - d
        want = ((t * t + 50.0 * t) * (TS * 0.5)) ** 2
        assert np.isclose(float(compute_detail(d)), want, rtol=1e-6)


def test_totwt_pattern_positive_and_periodic():
    assert _TOTWT.shape == (STRIDE, STRIDE)
    assert (_TOTWT > 0).all()


def test_detail_slider_extremes():
    """detail=99.9 restores nearly all residual; detail=0 almost none."""
    rng = np.random.RandomState(1)
    sig = 0.5 + 0.005 * rng.randn(160, 224).astype(np.float32)
    yin = jnp.asarray(sig)
    ydn = jnp.full((160, 224), 0.5, jnp.float32)
    hi = np.asarray(dct_detail_recovery(yin, ydn, 99.9))
    lo = np.asarray(dct_detail_recovery(yin, ydn, 0.0))
    resid = np.abs(sig - 0.5).mean()
    frac_hi = np.abs(hi - 0.5).mean() / resid
    frac_lo = np.abs(lo - 0.5).mean() / resid
    assert frac_hi > 0.8
    assert frac_lo < 0.1


def test_structure_recovered_more_than_noise():
    """Coherent texture survives the DCT filter better than white noise:
    the box-blurred |coeff| is large around the texture's frequency line
    and small for scattered noise energy."""
    rng = np.random.RandomState(2)
    H, W = 192, 256
    yy, xx = np.mgrid[0:H, 0:W]
    texture = (0.003 * np.sin(xx / 1.5) * np.sin(yy / 2.0)).astype(np.float32)
    noise = (0.003 * rng.randn(H, W)).astype(np.float32)
    ydn = jnp.full((H, W), 0.5, jnp.float32)

    out_t = np.asarray(dct_detail_recovery(ydn + texture, ydn, 60.0))
    out_n = np.asarray(dct_detail_recovery(ydn + noise, ydn, 60.0))
    c = (slice(32, -32), slice(32, -32))
    frac_t = np.abs(out_t - 0.5)[c].mean() / np.abs(texture)[c].mean()
    frac_n = np.abs(out_n - 0.5)[c].mean() / np.abs(noise)[c].mean()
    assert frac_t > 1.5 * frac_n


def test_detail_threshold_mask_shapes_and_range():
    rng = np.random.RandomState(3)
    L = jnp.asarray(rng.rand(96, 128).astype(np.float32))
    m = np.asarray(detail_mask(L, 0.5))
    assert m.shape == (96, 128)
    assert np.isfinite(m).all()
    assert m.min() >= -1e-3 and m.max() <= 1.2


def test_denoise_pipeline_uses_dct_when_detail_set():
    """ops.denoise.plan switches off the fused path and engages the DCT
    pass when LuminanceDetail > 0."""
    from art_tpu.ops import denoise as dn_op
    from art_tpu.params import ProcParams

    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 30.0
    pp.denoise.luminance_detail = 50.0
    pp.denoise.chrominance_method = 0
    static, data = dn_op.plan(pp, {"working_profile": "Rec2020",
                                   "frame": None})
    assert static[4] is True  # use_dct
    assert "lum_detail_dct" in data

    rgb = jnp.asarray(
        np.random.RandomState(4).rand(3, 128, 192).astype(np.float32) * 0.6
        + 0.2) * 65535.0
    out = np.asarray(dn_op.apply(rgb, {k: jnp.asarray(v)
                                       for k, v in data.items()}, static))
    assert out.shape == rgb.shape
    assert np.isfinite(out).all()
