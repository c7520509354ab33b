"""Demosaic kernel tests against the synthetic mosaic oracle."""

import numpy as np
import pytest

from art_tpu.core.image import bayer_color_index
from art_tpu.demosaic import demosaic


def mosaic_of(rgb, pattern):
    c, h, w = rgb.shape
    cidx = bayer_color_index(pattern, (h, w))
    return np.take_along_axis(
        rgb.reshape(3, -1), cidx.reshape(1, -1), axis=0).reshape(h, w)


def smooth_image(h=80, w=112, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.1, 0.9, size=(3, 5, 7))
    import cv2

    out = np.stack([
        cv2.resize(base[c], (w, h), interpolation=cv2.INTER_CUBIC)
        for c in range(3)
    ])
    return np.clip(out, 0.0, 1.0) * 65535.0


def edge_image(h=80, w=112):
    img = np.full((3, h, w), 0.2)
    img[:, :, w // 2:] = 0.8
    img[0, h // 2:, :] *= 0.5
    return img * 65535.0


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_rcd_reconstructs_smooth(pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, "rcd"))
    err = np.abs(out - rgb)[:, 12:-12, 12:-12] / 65535.0
    assert err.mean() < 0.002, err.mean()
    assert err.max() < 0.03, err.max()


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG"])
def test_rcd_exact_on_linear_ramp(pattern):
    h, w = 64, 96
    ramp = np.linspace(0.2, 0.8, w)[None, None, :] * np.ones((3, h, 1)) * 65535
    cfa = mosaic_of(ramp, pattern)
    out = np.asarray(demosaic(cfa, pattern, "rcd"))
    err = np.abs(out - ramp)[:, 12:-12, 12:-12] / 65535.0
    assert err.max() < 1e-4


def test_rcd_beats_bilinear_on_edges():
    rgb = edge_image()
    cfa = mosaic_of(rgb, "RGGB")
    rcd = np.asarray(demosaic(cfa, "RGGB", "rcd"))
    bil = np.asarray(demosaic(cfa, "RGGB", "fast"))
    sl = (slice(None), slice(12, -12), slice(12, -12))
    err_rcd = np.abs(rcd[sl] - rgb[sl]).mean()
    err_bil = np.abs(bil[sl] - rgb[sl]).mean()
    assert err_rcd < err_bil


def test_rcd_preserves_cfa_samples():
    rgb = smooth_image(seed=3)
    cfa = mosaic_of(rgb, "RGGB")
    out = np.asarray(demosaic(cfa, "RGGB", "rcd"))
    # green at green sites must be the raw sample
    from art_tpu.core.image import bayer_channel_masks

    mr, mg, mb = bayer_channel_masks("RGGB", cfa.shape, xp=np)
    inner = np.zeros_like(mg)
    inner[12:-12, 12:-12] = True
    np.testing.assert_allclose(out[1][mg & inner], cfa[mg & inner], rtol=1e-5)


def test_mono_passthrough():
    cfa = np.random.default_rng(0).uniform(0, 65535, (32, 32)).astype(np.float32)
    out = np.asarray(demosaic(cfa, "RGGB", "mono"))
    np.testing.assert_allclose(out[0], cfa)
    np.testing.assert_allclose(out[2], cfa)


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_amaze_reconstructs_smooth(pattern):
    rgb = smooth_image().astype(np.float32)
    cfa = mosaic_of(rgb, pattern).astype(np.float32)
    out = np.asarray(demosaic(cfa, pattern, "amaze"))
    err = np.abs(out - rgb)[:, 20:-20, 20:-20] / 65535.0
    assert err.mean() < 0.004, err.mean()


def test_amaze_beats_rcd_on_zoneplate():
    """Nyquist-frequency texture is AMaZE's specialty."""
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    zp = 0.5 + 0.45 * np.cos((xx * xx + yy * yy) * 0.05)
    rgb = (np.stack([zp * 0.8, zp, zp * 0.9]) * 65535.0).astype(np.float32)
    cfa = mosaic_of(rgb, "RGGB").astype(np.float32)
    am = np.asarray(demosaic(cfa, "RGGB", "amaze"))
    rc = np.asarray(demosaic(cfa, "RGGB", "rcd"))
    sl = (slice(None), slice(20, -20), slice(20, -20))
    assert np.abs(am[sl] - rgb[sl]).mean() < np.abs(rc[sl] - rgb[sl]).mean()


def test_amaze_exact_on_linear_ramp():
    h, w = 64, 96
    ramp = np.linspace(0.2, 0.8, w)[None, None, :] * np.ones((3, h, 1)) * 65535
    cfa = mosaic_of(ramp, "RGGB").astype(np.float32)
    out = np.asarray(demosaic(cfa, "RGGB", "amaze"))
    err = np.abs(out - ramp)[:, 20:-20, 20:-20] / 65535.0
    assert err.max() < 1e-3


def test_fast_xtrans_flat_field():
    from art_tpu.io.rawfile import synthesize_xtrans
    from art_tpu.params import ProcParams
    from art_tpu.pipeline import develop
    from art_tpu.color import colorspaces as cs

    color = np.array([0.45, 0.35, 0.55])
    rgb = np.broadcast_to(color[:, None, None], (3, 48, 48)).copy()
    frame = synthesize_xtrans(rgb)
    pp = ProcParams()
    pp.raw.xtrans.method = "fast"
    out = np.asarray(develop(frame, pp))
    got = out[:, 12:-12, 12:-12].mean(axis=(1, 2))
    np.testing.assert_allclose(got, cs.srgb_gamma(color), atol=5e-3)


def test_xtrans_gradient():
    from art_tpu.io.rawfile import synthesize_xtrans
    from art_tpu.params import ProcParams
    from art_tpu.pipeline import develop

    h, w = 64, 96
    ramp = np.linspace(0.2, 0.8, w)[None, None, :] * np.ones((3, h, 1))
    frame = synthesize_xtrans(ramp)
    out = np.asarray(develop(frame, ProcParams()))
    from art_tpu.color import colorspaces as cs

    expected = cs.srgb_gamma(ramp)
    err = np.abs(out - expected)[:, 12:-12, 12:-12]
    assert err.mean() < 0.01


@pytest.mark.parametrize("method", ["vng4", "lmmse"])
@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_vng4_lmmse_reconstruct_smooth(method, pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, method))
    err = np.abs(out - rgb)[:, 12:-12, 12:-12] / 65535.0
    # jdl's one-sided 7-tap green extrapolator (demosaic_algos.cc:403)
    # is noisier on smooth gradients than the symmetric estimators
    assert err.mean() < (0.008 if method == "jdl" else 0.004), (
        method, err.mean())
    assert err.max() < 0.06, (method, err.max())


@pytest.mark.parametrize("method", ["vng4", "lmmse"])
def test_vng4_lmmse_preserve_cfa(method):
    rgb = smooth_image(seed=3)
    cfa = mosaic_of(rgb, "RGGB")
    out = np.asarray(demosaic(cfa, "RGGB", method))
    cidx = bayer_color_index("RGGB", cfa.shape)
    got = np.take_along_axis(out.reshape(3, -1), cidx.reshape(1, -1),
                             axis=0).reshape(cfa.shape)
    assert np.allclose(got[8:-8, 8:-8], cfa[8:-8, 8:-8], atol=2.0)


def test_dual_demosaic_blends():
    # flat noisy region + sharp edge: dual should track amaze at the edge
    # and smooth toward bilinear in the flat area
    rng = np.random.default_rng(0)
    rgb = np.full((3, 128, 128), 0.4 * 65535.0)
    rgb[:, :, 64:] = 0.7 * 65535.0
    rgb += rng.normal(0, 300.0, size=rgb.shape)
    rgb = np.clip(rgb, 0, 65535)
    cfa = mosaic_of(rgb, "RGGB")
    out_dual = np.asarray(demosaic(cfa, "RGGB", "amazebilinear",
                                   dual_contrast=20.0, dual_auto=False))
    out_amaze = np.asarray(demosaic(cfa, "RGGB", "amaze"))
    out_bil = np.asarray(demosaic(cfa, "RGGB", "bilinear"))
    # near the edge: dual ~ amaze
    edge = np.s_[:, 30:98, 62:66]
    d_edge_amz = np.abs(out_dual[edge] - out_amaze[edge]).mean()
    d_edge_bil = np.abs(out_dual[edge] - out_bil[edge]).mean()
    # flat interior: dual ~ bilinear (low contrast -> flat demosaicer)
    flat = np.s_[:, 30:98, 16:48]
    d_flat_bil = np.abs(out_dual[flat] - out_bil[flat]).mean()
    d_flat_amz = np.abs(out_dual[flat] - out_amaze[flat]).mean()
    assert d_edge_amz < d_edge_bil, (d_edge_amz, d_edge_bil)
    assert d_flat_bil < d_flat_amz, (d_flat_bil, d_flat_amz)


def test_dual_contrast_zero_is_sharp_only():
    rgb = smooth_image(seed=5)
    cfa = mosaic_of(rgb, "RGGB")
    a = np.asarray(demosaic(cfa, "RGGB", "rcdbilinear",
                            dual_contrast=0.0, dual_auto=False))
    b = np.asarray(demosaic(cfa, "RGGB", "rcd"))
    assert np.array_equal(a, b)


def _xtrans_mosaic(rgb):
    from art_tpu.io.rawfile import XTRANS_CANONICAL
    pat = np.asarray(XTRANS_CANONICAL, dtype=np.int64).reshape(6, 6)
    c, h, w = rgb.shape
    cidx = pat[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    return np.take_along_axis(rgb.reshape(3, -1), cidx.reshape(1, -1),
                              axis=0).reshape(h, w), XTRANS_CANONICAL


@pytest.mark.parametrize("method", ["1-pass (medium)", "3-pass (best)"])
def test_markesteijn_smooth(method):
    rgb = smooth_image(h=96, w=120)
    cfa, pat = _xtrans_mosaic(rgb)
    out = np.asarray(demosaic(cfa, None, method, xtrans=pat))
    err = np.abs(out - rgb)[:, 12:-12, 12:-12] / 65535.0
    assert err.mean() < 0.004, (method, err.mean())
    assert err.max() < 0.08, (method, err.max())


def test_markesteijn_beats_fast_on_edges():
    rgb = edge_image(h=96, w=120)
    cfa, pat = _xtrans_mosaic(rgb)
    out_m = np.asarray(demosaic(cfa, None, "3-pass (best)", xtrans=pat))
    out_f = np.asarray(demosaic(cfa, None, "fast", xtrans=pat))
    e_m = np.abs(out_m - rgb)[:, 12:-12, 12:-12].mean()
    e_f = np.abs(out_f - rgb)[:, 12:-12, 12:-12].mean()
    assert e_m < e_f, (e_m, e_f)


def test_markesteijn_preserves_cfa():
    rgb = smooth_image(h=96, w=120, seed=2)
    cfa, pat = _xtrans_mosaic(rgb)
    out = np.asarray(demosaic(cfa, None, "1-pass (medium)", xtrans=pat))
    patm = np.asarray(pat, dtype=np.int64).reshape(6, 6)
    cidx = patm[np.arange(96)[:, None] % 6, np.arange(120)[None, :] % 6]
    got = np.take_along_axis(out.reshape(3, -1), cidx.reshape(1, -1),
                             axis=0).reshape(cfa.shape)
    assert np.allclose(got[8:-8, 8:-8], cfa[8:-8, 8:-8], atol=2.0)


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG"])
def test_igv_reconstructs_smooth(pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, "igv"))
    err = np.abs(out - rgb)[:, 12:-12, 12:-12] / 65535.0
    assert err.mean() < 0.006, err.mean()
    assert err.max() < 0.09, err.max()


def test_igv_preserves_cfa():
    rgb = smooth_image(seed=4)
    cfa = mosaic_of(rgb, "RGGB")
    out = np.asarray(demosaic(cfa, "RGGB", "igv"))
    cidx = bayer_color_index("RGGB", cfa.shape)
    got = np.take_along_axis(out.reshape(3, -1), cidx.reshape(1, -1),
                             axis=0).reshape(cfa.shape)
    assert np.allclose(got[8:-8, 8:-8], cfa[8:-8, 8:-8], atol=2.0)


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG"])
def test_dcb_reconstructs_smooth(pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, "dcb"))
    err = np.abs(out - rgb)[:, 8:-8, 8:-8] / 65535.0
    assert err.mean() < 0.004, err.mean()
    assert err.max() < 0.06, err.max()


def test_dcb_beats_bilinear_on_edges():
    rgb = edge_image()
    cfa = mosaic_of(rgb, "RGGB")
    d = np.asarray(demosaic(cfa, "RGGB", "dcb"))
    b = np.asarray(demosaic(cfa, "RGGB", "bilinear"))
    sl = (slice(None), slice(8, -8), slice(8, -8))
    assert np.abs(d[sl] - rgb[sl]).mean() < np.abs(b[sl] - rgb[sl]).mean()


def test_dcb_preserves_cfa_samples():
    from art_tpu.core.image import bayer_channel_masks

    rgb = smooth_image(seed=3)
    cfa = mosaic_of(rgb, "RGGB")
    out = np.asarray(demosaic(cfa, "RGGB", "dcb"))
    mr, mg, mb = (np.asarray(m) for m in
                  bayer_channel_masks("RGGB", cfa.shape, np))
    inner = np.zeros_like(mr)
    inner[8:-8, 8:-8] = True
    np.testing.assert_allclose(out[0][mr & inner], cfa[mr & inner],
                               rtol=1e-5)
    np.testing.assert_allclose(out[2][mb & inner], cfa[mb & inner],
                               rtol=1e-5)


def test_pixelshift_combine_exact():
    """Static scene: 4-frame combine recovers RGB exactly (no demosaic
    interpolation error), reference pixelshift.cc role."""
    import jax.numpy as jnp

    from art_tpu.demosaic.pixelshift import pixelshift_combine
    from art_tpu.io.rawfile import synthesize_pixelshift

    rgb = smooth_image(seed=5)
    fr = synthesize_pixelshift(rgb / 65535.0, black=0.0, white=65535.0,
                               cam_mul=(1.0, 1.0, 1.0))
    frames = jnp.asarray(
        np.concatenate([fr.cfa[None], fr.extra_frames]))
    out = np.asarray(pixelshift_combine(frames, "RGGB",
                                        motion_detect=False))
    np.testing.assert_allclose(out, rgb, atol=1.0)


def test_pixelshift_motion_fallback():
    """A moving object between frames must trigger the motion mask and
    fall back to single-frame demosaic (no ghost colors)."""
    import jax.numpy as jnp

    from art_tpu.demosaic.pixelshift import pixelshift_combine
    from art_tpu.io.rawfile import synthesize_pixelshift

    rgb = smooth_image(seed=6)
    fr = synthesize_pixelshift(rgb / 65535.0, black=0.0, white=65535.0,
                               cam_mul=(1.0, 1.0, 1.0))
    frames = np.concatenate([fr.cfa[None], fr.extra_frames])
    # corrupt a block in frames 1-3 (object moved after frame 0)
    frames[1:, 30:50, 40:60] *= 0.2
    out = np.asarray(pixelshift_combine(jnp.asarray(frames), "RGGB",
                                        demosaic_method="rcd"))
    ref = np.asarray(pixelshift_combine(jnp.asarray(frames), "RGGB",
                                        motion_detect=False))
    # motion area: output tracks frame-0 demosaic (bright), naive combine
    # would mix the darkened frames
    blk = (slice(None), slice(34, 46), slice(44, 56))
    assert np.abs(out[blk] - rgb[blk]).mean() < 0.5 * np.abs(
        ref[blk] - rgb[blk]).mean()


@pytest.mark.parametrize("pattern", ["RGGB", "GBRG"])
def test_ahd_reconstructs_smooth(pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, "ahd"))
    err = np.abs(out - rgb)[:, 8:-8, 8:-8] / 65535.0
    assert err.mean() < 0.004, err.mean()


def test_ahd_beats_bilinear_on_edges():
    rgb = edge_image()
    cfa = mosaic_of(rgb, "RGGB")
    a = np.asarray(demosaic(cfa, "RGGB", "ahd"))
    b = np.asarray(demosaic(cfa, "RGGB", "bilinear"))
    sl = (slice(None), slice(8, -8), slice(8, -8))
    assert np.abs(a[sl] - rgb[sl]).mean() < np.abs(b[sl] - rgb[sl]).mean()


@pytest.mark.parametrize("method", ["eahd", "hphd", "ppg", "jdl"])
@pytest.mark.parametrize("pattern", ["RGGB", "GBRG"])
def test_legacy_hd_reconstructs_smooth(method, pattern):
    rgb = smooth_image()
    cfa = mosaic_of(rgb, pattern)
    out = np.asarray(demosaic(cfa, pattern, method))
    err = np.abs(out - rgb)[:, 12:-12, 12:-12] / 65535.0
    # jdl's one-sided 7-tap green extrapolator (demosaic_algos.cc:403)
    # is noisier on smooth gradients than the symmetric estimators
    assert err.mean() < (0.008 if method == "jdl" else 0.004), (
        method, err.mean())


@pytest.mark.parametrize("method", ["eahd", "hphd", "ppg", "jdl"])
def test_legacy_hd_beats_bilinear_on_edges(method):
    rgb = edge_image()
    cfa = mosaic_of(rgb, "RGGB")
    a = np.asarray(demosaic(cfa, "RGGB", method))
    b = np.asarray(demosaic(cfa, "RGGB", "bilinear"))
    sl = (slice(None), slice(12, -12), slice(12, -12))
    assert np.abs(a[sl] - rgb[sl]).mean() < np.abs(b[sl] - rgb[sl]).mean()


def test_legacy_hd_distinct_outputs():
    """EAHD/HPHD/AHD are real distinct kernels, not aliases.

    A clean step edge is degenerate (every method votes the same
    direction), so compare on textured content where the homogeneity
    votes and smoothing stencils actually diverge.
    """
    rng = np.random.default_rng(7)
    rgb = smooth_image()
    tex = np.clip(rgb + rng.normal(0.0, 3000.0, rgb.shape), 0,
                  65535).astype(np.float32)
    cfa = mosaic_of(tex, "RGGB")
    outs = {m: np.asarray(demosaic(cfa, "RGGB", m))
            for m in ("ahd", "eahd", "hphd", "ppg", "jdl", "rcd", "igv")}
    sl = (slice(None), slice(12, -12), slice(12, -12))
    import itertools

    for m1, m2 in itertools.combinations(outs, 2):
        assert np.abs(outs[m1][sl] - outs[m2][sl]).max() > 100.0, (m1, m2)


def test_xtrans_green_vs_hex_reference():
    """Quantified divergence of the whole-plane X-Trans green variant
    vs the reference's hex-table formulation (xtrans_demosaic.cc:420):
    the oracle-selected hex candidate error bounds what Markesteijn's
    homogeneity voting could achieve; our fused green must stay within
    the demosaic noise floor of it on smooth content and nail the
    edge orientations (incl. diagonals) that motivated the hex tables.
    """
    from art_tpu.demosaic.xtrans import green_directional
    from art_tpu.io.rawfile import XTRANS_CANONICAL
    from util_xtrans_hexref import hexref_best_green

    def diag_image(h=96, w=120, anti=False):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        t = (xx - yy) if anti else (xx + yy)
        img = 0.2 + 0.6 * ((t % 24) < 12)
        return np.stack([img * 0.9, img, img * 0.8]) * 65535.0

    cases = [  # scene, fused-green mean-|err| bound (fraction of range)
        ("smooth", smooth_image(h=96, w=120), 0.010),
        ("diag", diag_image(), 0.0012),
        ("adiag", diag_image(anti=True), 0.0012),
    ]
    for name, rgb, bound in cases:
        cfa, pat = _xtrans_mosaic(rgb)
        gt = rgb[1]
        best_hex, valid = hexref_best_green(cfa, gt, pat)
        g, _, _ = green_directional(cfa.astype(np.float32), pat)
        err = np.abs(np.asarray(g, dtype=np.float64) - gt)
        ours = err[valid].mean() / 65535.0
        hexb = np.nanmean(best_hex[valid]) / 65535.0
        assert ours < bound, (name, ours, hexb)
        # divergence vs the reference formulation's best case stays
        # inside the demosaic noise floor (<1% of range)
        assert ours - hexb < 0.01, (name, ours, hexb)
