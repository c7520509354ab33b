"""Denoise tests: wavelet NR + NLMeans reduce noise, preserve structure."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def noisy_frame(sigma=400.0, seed=11):
    rng = np.random.default_rng(seed)
    rgb = np.full((3, 96, 96), 0.35)
    rgb[:, :, 48:] = 0.65  # an edge to preserve
    frame = synthesize_bayer(rgb, black=512, white=16383)
    frame.cfa = np.clip(
        frame.cfa + rng.normal(0, sigma, frame.cfa.shape), 0, 16383
    ).astype(np.float32)
    return frame


def flat_std(img):
    return img[:, 16:40, 8:40].std()


def test_wavelet_denoise_reduces_noise():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 60
    pp.denoise.chrominance = 30
    pp.denoise.chrominance_method = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert flat_std(out) < flat_std(base) * 0.7
    # edge preserved: means on both sides stay distinct
    assert out[:, 16:80, 60:90].mean() - out[:, 16:80, 8:40].mean() > 0.15


def test_nlmeans_reduces_noise_further():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 0
    pp.denoise.chrominance_method = 0
    pp.denoise.chrominance = 0
    pp.denoise.smoothing_enabled = True
    pp.denoise.smoothing_method = 0
    pp.denoise.nl_strength = 80
    pp.denoise.nl_detail = 50
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert flat_std(out) < flat_std(base)
    assert np.all(np.isfinite(out))


def test_denoise_identity_when_zero():
    frame = noisy_frame()
    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 0
    pp.denoise.chrominance = 0
    pp.denoise.chrominance_method = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    np.testing.assert_allclose(out, base, atol=0.02)


def test_fused_rgb_kernel_matches_unfused():
    """The fused gamma+YUV+wavelet kernel (interpret mode on CPU) matches
    the unfused pow/yuv path to Chebyshev-fit tolerance."""
    import jax.numpy as jnp

    from art_tpu.color.yuv import rgb_to_yuv, yuv_to_rgb
    from art_tpu.ops import denoise as dn
    from art_tpu.params import ProcParams

    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0
    static, data = dn.plan(pp, {"working_profile": "Rec2020"})
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 60000, (3, 256, 1024))
                      .astype(np.float32))
    datj = {k: jnp.asarray(v) for k, v in data.items()}
    fused = np.asarray(dn.apply(rgb, datj, static))

    x = rgb * data["ecomp"]
    xn = jnp.power(jnp.clip(x / 65535.0, 0, 1), 1.0 / data["gamma"])
    y, u, v = rgb_to_yuv(xn, data["lum_w"])
    cb = data["chroma"] + data["chroma_by"]
    cr = data["chroma"] + data["chroma_rg"]
    y2, u2, v2 = dn._wavelet_denoise_planes(
        [y, u, v], [data["lum_strength"], cb, cr],
        [data["lum_detail"], 0.0, 0.0])
    ref = yuv_to_rgb(y2, u2, v2, data["lum_w"])
    ref = jnp.power(jnp.clip(ref, 0, 1), data["gamma"]) * 65535.0 \
        / data["ecomp"]
    d = np.abs(fused - np.asarray(ref))
    # The kernel's Chebyshev gamma and jnp.power's platform lowering
    # differ by ~1e-6; the in-kernel per-tile MAD bisection amplifies
    # that into isolated ~1e-3-of-scale outliers when a histogram tie
    # flips one bisection step (the same XLA:CPU build flag flip moves
    # the unfused path itself by ~150/65535). Bound the bulk tightly
    # and the bisection outliers loosely.
    assert np.mean(d) < 0.05
    assert np.percentile(d, 99) < 1.0  # of 65535
    assert d.max() < 200.0


def test_per_tile_mad_adapts_to_local_noise():
    """The in-kernel sigma estimate (FTblockDN.cc Tile_calc / Mad()) is
    per tile: with low noise on the left tile and heavy noise on the
    right, the sentinel path denoises the right tile harder than a
    global sigma pinned to the left tile's level."""
    import jax.numpy as jnp

    from art_tpu.ops.wavelet_pallas import (TILE_X, TILE_Y,
                                            wavelet_denoise_pallas_multi)

    rng = np.random.default_rng(5)
    h, w = TILE_Y, 2 * TILE_X
    x = np.full((h, w), 0.5, np.float32)
    x[:, :TILE_X] += rng.normal(0, 0.002, (h, TILE_X))
    x[:, TILE_X:] += rng.normal(0, 0.05, (h, TILE_X))
    xs = jnp.asarray(x)[None]
    strength = jnp.asarray([2.0], jnp.float32)
    blend = jnp.asarray([0.0], jnp.float32)

    adaptive = np.asarray(wavelet_denoise_pallas_multi(
        xs, jnp.asarray([-1.0], jnp.float32), strength, blend))[0]
    pinned_low = np.asarray(wavelet_denoise_pallas_multi(
        xs, jnp.asarray([0.002], jnp.float32), strength, blend))[0]

    right = (slice(32, -32), slice(TILE_X + 64, -64))
    assert adaptive[right].std() < 0.5 * pinned_low[right].std()
    # and the left tile's sigma stays calibrated to its own low noise:
    left = (slice(32, -32), slice(64, TILE_X - 64))
    assert adaptive[left].std() < 0.002


def test_auto_chroma_scales_with_noise():
    """denoiseComputeParams AUTOMATIC: the estimate grows with injected
    chroma noise (ipdenoise.cc:800)."""
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.autos import auto_chroma_params

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:256, 0:384]
    base = 0.25 + 0.3 * (xx / 384) + 0.1 * np.sin(yy / 40)

    def est(noise):
        rgb = np.stack([base * 0.9, base, base * 0.8]).astype(np.float32)
        rgb = rgb + rng.normal(0, noise, rgb.shape).astype(np.float32)
        frame = synthesize_bayer(np.clip(rgb, 0, 1), "RGGB")
        return auto_chroma_params(frame, ProcParams())

    clean = est(0.0)
    noisy = est(0.01)
    assert clean is not None and noisy is not None
    assert noisy[0] > 2.0 * clean[0]
    # plumbed through the op planner (chrominance_method auto)
    from art_tpu.ops import denoise as dnmod

    pp = ProcParams()
    pp.denoise.enabled = True
    pp.denoise.chrominance_method = 1
    rgb = np.stack([base * 0.9, base, base * 0.8]).astype(np.float32)
    rgb = rgb + rng.normal(0, 0.01, rgb.shape).astype(np.float32)
    frame = synthesize_bayer(np.clip(rgb, 0, 1), "RGGB")
    _, data = dnmod.plan(pp, {"working_profile": "Rec2020",
                              "frame": frame})
    assert data["chroma"] > 0.1  # estimated, not the 15.0 stub
