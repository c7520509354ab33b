"""Raw preprocessing tests: hot/dead pixels, green eq, highlight recovery."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def test_hot_pixel_filter_removes_spikes():
    rng = np.random.default_rng(3)
    rgb = np.full((3, 64, 64), 0.3)
    frame = synthesize_bayer(rgb)
    cfa = frame.cfa.copy()
    ys, xs = rng.integers(10, 54, 10), rng.integers(10, 54, 10)
    cfa[ys, xs] = 16383.0
    frame.cfa = cfa
    pp = ProcParams()
    pp.raw.hotdead_enabled = True
    pp.raw.hotpixel_filter = True
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert np.abs(out - np.median(out)).mean() < \
        np.abs(base - np.median(base)).mean() * 0.2


def test_green_equilibration_balances_g1_g2():
    # synthetic G1/G2 imbalance: +4% on even-row greens
    rgb = np.full((3, 64, 64), 0.4)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    cfa = frame.cfa.copy()
    from art_tpu.core.image import bayer_channel_masks

    _, mg, _ = bayer_channel_masks("RGGB", cfa.shape, xp=np)
    even = np.zeros_like(mg)
    even[::2] = True
    cfa[mg & even] = (cfa[mg & even] - 512) * 1.04 + 512
    frame.cfa = cfa
    pp = ProcParams()
    pp.raw.bayer.green_eq_enabled = True
    pp.raw.bayer.green_eq = 100.0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # maze artifacts from G imbalance show up as checkerboard noise in G
    def checker_energy(img):
        return np.abs(np.diff(img[1], axis=0)).mean()

    assert checker_energy(out) < checker_energy(base)


def test_highlight_opposed_recovers_clipped():
    # scene with a clipped highlight disk
    rgb = np.full((3, 64, 64), 0.3)
    yy, xx = np.mgrid[0:64, 0:64]
    disk = (yy - 32) ** 2 + (xx - 32) ** 2 < 100
    rgb[0][disk] = 2.0  # red blows out
    rgb[1][disk] = 0.9
    rgb[2][disk] = 0.8
    frame = synthesize_bayer(np.clip(rgb, 0, 2.0), white=16383)
    frame.cfa = np.minimum(frame.cfa, 16383.0)  # sensor clip
    pp = ProcParams()
    pp.exposure.hrmode = "ColorSoft"
    out = develop(frame, pp)
    base_pp = ProcParams()
    base_pp.exposure.hrmode = "Off"
    base = develop(frame, base_pp)
    assert np.all(np.isfinite(out))
    # recovery must not darken unclipped area and must change the disk
    assert abs(out[:, :10, :10].mean() - base[:, :10, :10].mean()) < 0.02


def test_cfa_line_denoise_removes_banding():
    rng = np.random.default_rng(12)
    rgb = np.full((3, 64, 64), 0.4)
    frame = synthesize_bayer(rgb)
    cfa = frame.cfa.copy()
    # horizontal banding: per-row offsets
    cfa += (rng.uniform(-80, 80, (64, 1))).astype(np.float32)
    frame.cfa = np.clip(cfa, 0, 16383)
    pp = ProcParams()
    pp.raw.bayer.green_eq_enabled = True
    pp.raw.bayer.linenoise = 60.0
    pp.raw.bayer.linenoise_direction = 1
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    def row_band_energy(img):
        return img.mean(axis=2).std()
    assert row_band_energy(out) < row_band_energy(base) * 0.7


def test_ca_correct_auto_reduces_fringing():
    # radial CA: shift R outward by synthesizing scaled R
    import cv2

    h, w = 96, 96
    rng = np.random.default_rng(13)
    base_img = cv2.resize(rng.uniform(0.1, 0.9, (8, 8)), (w, h),
                          interpolation=cv2.INTER_CUBIC)
    rgb = np.stack([base_img] * 3)
    # scale the R channel slightly about the center (lateral CA)
    M = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), 0, 1.004)
    rgb_ca = rgb.copy()
    rgb_ca[0] = cv2.warpAffine(rgb[0], M, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REPLICATE)
    frame = synthesize_bayer(np.clip(rgb_ca, 0, 1))
    pp = ProcParams()
    pp.raw.ca_enabled = True
    pp.raw.ca_autocorrect = True
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # R-G misregistration must shrink
    def misreg(img):
        return np.abs(np.gradient(img[0] - img[1], axis=1)).mean()
    assert misreg(out[:, 16:-16, 16:-16]) < misreg(base[:, 16:-16, 16:-16])


def test_ca_correct_auto_captures_nonradial_shift():
    """Pure-translation CA (tilted/decentered elements): a radial model
    corrects nothing at the optical center; the reference's per-tile
    polynomial surface (CA_correct_RT.cc:746-836) captures it via the
    constant term. Synthetic: R shifted by a constant 1px."""
    import cv2

    h, w = 512, 512
    rng = np.random.default_rng(14)
    base_img = cv2.resize(rng.uniform(0.1, 0.9, (24, 24)), (w, h),
                          interpolation=cv2.INTER_CUBIC)
    rgb = np.stack([base_img] * 3)
    rgb_ca = rgb.copy()
    M = np.float32([[1, 0, 1.0], [0, 1, 0.6]])  # constant (dx=1, dy=0.6)
    rgb_ca[0] = cv2.warpAffine(rgb[0], M, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REPLICATE)
    frame = synthesize_bayer(np.clip(rgb_ca, 0, 1))
    pp = ProcParams()
    pp.raw.ca_enabled = True
    pp.raw.ca_autocorrect = True
    out = develop(frame, pp)
    base = develop(frame, ProcParams())

    def misreg(img):
        return np.abs(np.gradient(img[0] - img[1], axis=1)).mean()

    m = slice(24, -24)
    # must reduce clearly, including around the center where the radial
    # model is pinned to zero
    assert misreg(out[:, m, m]) < 0.7 * misreg(base[:, m, m])
    c = slice(h // 2 - 24, h // 2 + 24)
    assert misreg(out[:, c, c]) < 0.7 * misreg(base[:, c, c])


def test_hl_inpaint_reconstructs_hue():
    """Blown orange core: inpaint must rebuild the surround's G/R ratio
    and push brightness past the clip level (hilite_recon.cc:299 role)."""
    import jax.numpy as jnp

    from art_tpu.raw.hilite_inpaint import recover_inpaint

    h, w = 128, 128
    rgb = np.zeros((3, h, w), np.float32)
    rgb[0], rgb[1], rgb[2] = 0.9, 0.5, 0.2
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    bump = np.exp(-(((yy - 64) ** 2 + (xx - 64) ** 2)
                    / (2 * 18.0 ** 2))) * 3.0
    rgb = rgb * (0.4 + bump)[None]
    ones = np.ones(3, np.float32)
    clipv = 0.987 / 1.2 * 65535.0
    x = np.minimum(rgb * 65535.0, clipv)
    out = np.asarray(recover_inpaint(jnp.asarray(x), jnp.asarray(ones),
                                     jnp.asarray(ones)))
    ctr = (slice(60, 68), slice(60, 68))
    rat = out[1][ctr].mean() / out[0][ctr].mean()
    assert abs(rat - 0.556) < 0.08
    assert out[0, 64, 64] > x[0, 64, 64] * 1.5  # brightness extended
    edge = np.abs(out - x)[:, :8, :].max()
    assert edge < 0.01  # unclipped area untouched (f32 scale roundtrip)


def test_transform_bicubic_beats_bilinear():
    import jax.numpy as jnp

    from art_tpu.pipeline.transform import apply_transform

    th = 0.05
    data = {k: np.float32(v) for k, v in dict(
        cos=np.cos(th), sin=np.sin(th), dist=0.0, ca_r=0.0, ca_b=0.0,
        persp_h=0.0, persp_v=0.0, shear=0.0).items()}
    yy, xx = np.meshgrid(np.arange(80), np.arange(80), indexing="ij")
    f = np.sin(xx * 0.3) * np.cos(yy * 0.25)
    img = jnp.asarray(np.stack([f, f, f]).astype(np.float32))
    bi = np.asarray(apply_transform(img, data, method="bilinear"))[0]
    bc = np.asarray(apply_transform(img, data, method="bicubic"))[0]
    w2 = h2 = 80 / 2 - 0.5
    dxc = (xx - w2) * np.cos(th) - (yy - h2) * np.sin(th) + w2
    dyc = (xx - w2) * np.sin(th) + (yy - h2) * np.cos(th) + h2
    gt = np.sin(dxc * 0.3) * np.cos(dyc * 0.25)
    m = (slice(10, 70), slice(10, 70))
    assert np.abs(bc - gt)[m].mean() < 0.2 * np.abs(bi - gt)[m].mean()


def test_spot_wb_recovers_cast():
    """Spot WB on a neutral patch recovers the camera cast gains
    (RawImageSource::getSpotWB role)."""
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.raw.wb import spot_wb

    rgb = np.full((3, 128, 128), 0.5, np.float32)
    fr = synthesize_bayer(rgb, cam_mul=(1.8, 1.0, 1.4))
    res = spot_wb(fr, 40, 40, 32)
    assert abs(res["mults"][0] - 1.8) < 0.05
    assert abs(res["mults"][2] - 1.4) < 0.05
    assert 3000 < res["temp"] < 9000
