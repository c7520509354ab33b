"""Per-op tests (reference semantics checks on small images)."""

import numpy as np
import pytest

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def flat_frame(color, shape=(32, 32)):
    rgb = np.broadcast_to(np.asarray(color)[:, None, None],
                          (3,) + shape).copy()
    return synthesize_bayer(rgb)


def center(out):
    return out[:, 8:-8, 8:-8].mean(axis=(1, 2))


def test_channel_mixer_swap():
    # sRGB working space so the mixer's channel swap survives rgb2out
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.chmixer.enabled = True
    pp.chmixer.red = [0, 1000, 0]    # red output = green input
    pp.chmixer.green = [1000, 0, 0]
    pp.chmixer.blue = [0, 0, 1000]
    frame = flat_frame([0.6, 0.2, 0.4])
    base_pp = ProcParams()
    base_pp.icm.working_profile = "sRGB"
    out = center(develop(frame, pp))
    base = center(develop(frame, base_pp))
    np.testing.assert_allclose(out[0], base[1], atol=5e-3)
    np.testing.assert_allclose(out[1], base[0], atol=5e-3)
    np.testing.assert_allclose(out[2], base[2], atol=5e-3)


def test_channel_mixer_primaries_identity():
    pp = ProcParams()
    pp.chmixer.enabled = True
    pp.chmixer.mode = 1
    frame = flat_frame([0.5, 0.4, 0.3])
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    np.testing.assert_allclose(out, base, atol=5e-3)


def test_rgb_curves_single_channel():
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    pp.rgb_curves.enabled = True
    pp.rgb_curves.rcurve = [1, 0, 0, 0.5, 0.75, 1, 1]  # brighten red only
    frame = flat_frame([0.3, 0.3, 0.3])
    base_pp = ProcParams()
    base_pp.icm.working_profile = "sRGB"
    out = center(develop(frame, pp))
    base = center(develop(frame, base_pp))
    assert out[0] > base[0] + 0.02
    np.testing.assert_allclose(out[1:], base[1:], atol=3e-3)


def test_softlight_increases_contrast():
    pp = ProcParams()
    pp.softlight.enabled = True
    pp.softlight.strength = 100
    dark = center(develop(flat_frame([0.1, 0.1, 0.1]), pp))
    dark0 = center(develop(flat_frame([0.1, 0.1, 0.1]), ProcParams()))
    bright = center(develop(flat_frame([0.7, 0.7, 0.7]), pp))
    bright0 = center(develop(flat_frame([0.7, 0.7, 0.7]), ProcParams()))
    assert dark.mean() < dark0.mean()       # shadows darker
    assert bright.mean() > bright0.mean() - 1e-3  # highlights not darker


def test_black_and_white_desaturates():
    pp = ProcParams()
    pp.bw.enabled = True
    frame = flat_frame([0.6, 0.3, 0.2])
    out = center(develop(frame, pp))
    assert np.ptp(out) < 0.01  # all channels equal


def test_bw_mixer_weights():
    pp = ProcParams()
    pp.bw.enabled = True
    pp.bw.mixer_red = 100
    pp.bw.mixer_green = 0
    pp.bw.mixer_blue = 0
    red_frame = flat_frame([0.8, 0.1, 0.1])
    green_frame = flat_frame([0.1, 0.8, 0.1])
    r_out = center(develop(red_frame, pp)).mean()
    g_out = center(develop(green_frame, pp)).mean()
    assert r_out > g_out + 0.1  # red-only mix: red scene much brighter


def test_hsl_saturation_boost():
    pp = ProcParams()
    pp.hsl.enabled = True
    # raise S across all hues: flat curve at 0.8
    pp.hsl.scurve = [1, 0.0, 0.8, 0.35, 0.35, 0.5, 0.8, 0.35, 0.35]
    frame = flat_frame([0.6, 0.3, 0.3])
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    assert (out[0] - out[1]) > (base[0] - base[1]) + 0.01


def test_logenc_brightens_midgray():
    pp = ProcParams()
    pp.logenc.enabled = True
    pp.logenc.auto_gain = False
    pp.logenc.gain = 0.0
    pp.logenc.regularization = 0
    frame = flat_frame([0.18, 0.18, 0.18])
    out = center(develop(frame, pp))
    assert np.all(np.isfinite(out))
    # log encoding maps mid-gray toward target gray (18%) position in the
    # 0..1 range given blackEv -5, whiteEv 10: (0-(-5))/15 = 0.333 encoded
    assert 0.2 < out.mean() < 0.9


def test_exposure_black_point():
    pp = ProcParams()
    pp.exposure.black = 5.0
    frame = flat_frame([0.1, 0.1, 0.1])
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    assert out.mean() < base.mean()


def test_tone_equalizer_shadow_lift():
    pp = ProcParams()
    pp.tone_equalizer.enabled = True
    pp.tone_equalizer.band1 = 60  # lift shadows
    pp.tone_equalizer.regularization = 0
    dark = center(develop(flat_frame([0.03, 0.03, 0.03]), pp))
    dark0 = center(develop(flat_frame([0.03, 0.03, 0.03]), ProcParams()))
    bright = center(develop(flat_frame([0.6, 0.6, 0.6]), pp))
    bright0 = center(develop(flat_frame([0.6, 0.6, 0.6]), ProcParams()))
    assert dark.mean() > dark0.mean() + 0.01
    assert abs(bright.mean() - bright0.mean()) < 0.02


def test_dehaze_runs_and_is_finite():
    rng = np.random.default_rng(5)
    rgb = rng.uniform(0.3, 0.8, size=(3, 64, 64))  # hazy-ish (lifted blacks)
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.dehaze.enabled = True
    out = develop(frame, pp)
    assert np.all(np.isfinite(out))
    base = develop(frame, ProcParams())
    assert not np.allclose(out, base)  # it did something


def test_impulse_denoise_removes_salt():
    rng = np.random.default_rng(7)
    rgb = np.full((3, 64, 64), 0.4)
    frame = synthesize_bayer(rgb)
    # inject hot pixels into the mosaic
    cfa = frame.cfa.copy()
    ys, xs = rng.integers(10, 54, 12), rng.integers(10, 54, 12)
    cfa[ys, xs] = 16383.0
    frame.cfa = cfa
    pp = ProcParams()
    pp.impulse_denoise.enabled = True
    pp.impulse_denoise.thresh = 80
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # the impulse pass must reduce the deviation at/around hot pixels
    dev_out = np.abs(out - np.median(out)).mean()
    dev_base = np.abs(base - np.median(base)).mean()
    assert dev_out < dev_base * 0.5


def test_crop_and_resize():
    rng = np.random.default_rng(9)
    rgb = rng.uniform(0.1, 0.9, size=(3, 96, 128))
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.crop.enabled = True
    pp.crop.x, pp.crop.y, pp.crop.w, pp.crop.h = 16, 8, 80, 64
    out = develop(frame, pp)
    assert out.shape == (3, 64, 80)
    # cropped content must match the same region of the uncropped develop
    base = develop(frame, ProcParams())
    np.testing.assert_allclose(out, base[:, 8:72, 16:96], atol=1e-4)

    pp.resize.enabled = True
    pp.resize.data_specified = 0
    pp.resize.scale = 0.5
    out2 = develop(frame, pp)
    assert out2.shape == (3, 32, 40)
    # downscale roughly preserves means (resampling is pre-gamma/linear,
    # so Jensen's inequality shifts the encoded mean slightly on noise)
    np.testing.assert_allclose(out2.mean(), out.mean(), atol=0.03)


def test_gradient_darkens_one_side():
    frame = synthesize_bayer(np.full((3, 48, 64), 0.4))
    pp = ProcParams()
    pp.gradient.enabled = True
    pp.gradient.strength = 1.5
    pp.gradient.degree = 0
    out = develop(frame, pp)
    assert out[:, :10].mean() < out[:, -10:].mean() - 0.1


def test_pcvignette_darkens_corners():
    frame = synthesize_bayer(np.full((3, 48, 64), 0.4))
    pp = ProcParams()
    pp.pcvignette.enabled = True
    pp.pcvignette.strength = 2.0
    out = develop(frame, pp)
    assert out[:, :6, :6].mean() < out[:, 20:28, 28:36].mean() - 0.1


def test_film_simulation_hald_clut(tmp_path):
    # identity Hald CLUT level 4 (n=16) -> output == base; then a red-boost
    import numpy as np
    from PIL import Image

    n = 16
    b, g, r = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                          indexing="ij")
    flat = np.stack([r, g, b], axis=-1).reshape(-1, 3) / (n - 1)
    side = int(np.sqrt(n ** 3))
    img = (flat.reshape(side, side, 3) * 255 + 0.5).astype(np.uint8)
    ident = tmp_path / "identity.png"
    Image.fromarray(img).save(ident)

    frame = flat_frame([0.5, 0.35, 0.3])
    pp = ProcParams()
    pp.film_simulation.enabled = True
    pp.film_simulation.clut_filename = str(ident)
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    np.testing.assert_allclose(out, base, atol=0.01)

    # red-boosted LUT
    boosted = flat.copy()
    boosted[:, 0] = np.clip(boosted[:, 0] * 1.3, 0, 1)
    img2 = (boosted.reshape(side, side, 3) * 255 + 0.5).astype(np.uint8)
    boost = tmp_path / "boost.png"
    Image.fromarray(img2).save(boost)
    pp.film_simulation.clut_filename = str(boost)
    out2 = center(develop(frame, pp))
    assert out2[0] > base[0] + 0.02


def test_film_simulation_cube(tmp_path):
    cube = tmp_path / "test.cube"
    n = 4
    lines = ["LUT_3D_SIZE 4"]
    for b in range(n):
        for g in range(n):
            for r in range(n):
                lines.append(f"{r/(n-1):.4f} {g/(n-1):.4f} {b/(n-1):.4f}")
    cube.write_text("\n".join(lines))
    frame = flat_frame([0.4, 0.5, 0.6])
    pp = ProcParams()
    pp.film_simulation.enabled = True
    pp.film_simulation.clut_filename = str(cube)
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    np.testing.assert_allclose(out, base, atol=0.01)


def test_sharpening_rld_increases_acutance():
    rng = np.random.default_rng(4)
    rgb = np.full((3, 64, 64), 0.3)
    rgb[:, :, 32:] = 0.7
    import cv2

    soft = np.stack([cv2.GaussianBlur(c, (0, 0), 1.2) for c in rgb])
    frame = synthesize_bayer(soft)
    pp = ProcParams()
    pp.sharpening.enabled = True
    pp.sharpening.method = "rld"
    pp.sharpening.deconv_radius = 1.2
    pp.sharpening.contrast = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # edge slope must steepen
    grad_out = np.abs(np.diff(out[1, 20:44], axis=1)).max()
    grad_base = np.abs(np.diff(base[1, 20:44], axis=1)).max()
    assert grad_out > grad_base * 1.05


def test_sharpening_psf_kernel_deconvolves(tmp_path):
    """Method "psf" (rl_deconvolution_psf, ipsharpen.cc:523): RL with the
    measured kernel recovers an edge blurred by that same kernel."""
    import json

    import cv2

    k = cv2.getGaussianKernel(7, 1.1)
    kern = (k @ k.T).astype(float)
    kf = tmp_path / "psf.json"
    kf.write_text(json.dumps([list(map(float, row)) for row in kern]))

    rgb = np.full((3, 64, 64), 0.3)
    rgb[:, :, 32:] = 0.7
    soft = np.stack([cv2.filter2D(c, -1, kern) for c in rgb])
    frame = synthesize_bayer(soft)
    pp = ProcParams()
    pp.sharpening.enabled = True
    pp.sharpening.method = "psf"
    pp.sharpening.psf_kernel = str(kf)
    pp.sharpening.psf_iterations = 10
    pp.sharpening.contrast = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    grad_out = np.abs(np.diff(out[1, 20:44], axis=1)).max()
    grad_base = np.abs(np.diff(base[1, 20:44], axis=1)).max()
    assert grad_out > grad_base * 1.1
    # flat-array JSON form loads too (import_kernel second branch)
    from art_tpu.ops.sharpen import load_psf_kernel

    kf2 = tmp_path / "psf_flat.json"
    kf2.write_text(json.dumps([float(v) for v in kern.ravel()]))
    k2 = load_psf_kernel(str(kf2))
    np.testing.assert_allclose(k2, load_psf_kernel(str(kf)), atol=1e-6)
    # invalid kernels are rejected, op skipped
    bad = tmp_path / "bad.json"
    bad.write_text("[1.0, 2.0, 3.0]")  # not a square
    assert load_psf_kernel(str(bad)) is None


def test_sharpening_usm():
    rgb = np.full((3, 64, 64), 0.3)
    rgb[:, :, 32:] = 0.7
    import cv2

    soft = np.stack([cv2.GaussianBlur(c, (0, 0), 1.2) for c in rgb])
    frame = synthesize_bayer(soft)
    pp = ProcParams()
    pp.sharpening.enabled = True
    pp.sharpening.method = "usm"
    pp.sharpening.radius = 1.0
    pp.sharpening.amount = 300
    pp.sharpening.contrast = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    grad_out = np.abs(np.diff(out[1, 20:44], axis=1)).max()
    grad_base = np.abs(np.diff(base[1, 20:44], axis=1)).max()
    assert grad_out > grad_base * 1.05


def test_fattal_compresses_dynamic_range():
    rgb = np.full((3, 64, 64), 0.08)
    rgb[:, 16:48, 16:48] = 0.85  # bright center
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.fattal.enabled = True
    pp.fattal.amount = 80
    pp.fattal.threshold = 0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert np.all(np.isfinite(out))
    # dynamic range (bright/dark ratio) must shrink
    def ratio(img):
        return img[:, 24:40, 24:40].mean() / max(img[:, 2:10, 2:10].mean(),
                                                 1e-3)
    assert ratio(out) < ratio(base)


def test_defringe_reduces_color_fringes():
    # gray edge with purple fringe line
    rgb = np.full((3, 64, 64), 0.4)
    rgb[0, :, 31:33] = 0.55
    rgb[2, :, 31:33] = 0.55
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.defringe.enabled = True
    pp.defringe.radius = 2.0
    pp.defringe.threshold = 13
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # chroma spread at the fringe must drop; changes stay at the fringe
    def spread(img):
        line = img[:, 10:54, 30:34]
        return (line.max(axis=0) - line.min(axis=0)).mean()
    assert spread(out) < spread(base)
    d = np.abs(out - base).max(axis=0)
    assert d[:, :20].mean() < 1e-4


def test_lab_adjustments_brightness_chromaticity():
    frame = flat_frame([0.5, 0.35, 0.3])
    pp = ProcParams()
    pp.lab_curve.enabled = True
    pp.lab_curve.brightness = 30
    out = center(develop(frame, pp))
    base = center(develop(frame, ProcParams()))
    assert out.mean() > base.mean() + 0.02

    pp2 = ProcParams()
    pp2.lab_curve.enabled = True
    pp2.lab_curve.chromaticity = 60
    out2 = center(develop(frame, pp2))
    assert (out2[0] - out2[1]) > (base[0] - base[1]) + 0.01


def test_lab_contrast_centers_on_image_mean():
    """Contrast NURBS must center on the mean of brightness(L) — the
    reference's histogram-derived avg (get_L_curve,
    iplabadjustments.cc:93-116) — not on fixed mid-gray."""
    import jax.numpy as jnp

    from art_tpu.color import colorspaces as cs
    from art_tpu.ops import labadj

    pp = ProcParams()
    pp.lab_curve.enabled = True
    pp.lab_curve.contrast = 40
    pp.lab_curve.brightness = 20
    static, data = labadj.plan(pp, {"working_profile": "Rec2020"})
    assert static[0] == 2  # avg-family mode

    def ref_apply(rgb):
        # exact reference formula with avg from the true image mean
        work = cs.MATRICES_RGB_TO_XYZ["Rec2020"]
        x = np.asarray(rgb) / 65535.0
        xyz = np.einsum("ij,jhw->ihw", work, x)
        L, a, b = cs.xyz_to_lab(xyz[0], xyz[1], xyz[2], np)
        Ln = np.clip(L / 100.0, 0, 1)
        bl = labadj._brightness_curve(20)

        def through(v, lut):
            idx = np.clip(v, 0, 1) * (len(lut) - 1)
            i0 = idx.astype(int)
            i1 = np.minimum(i0 + 1, len(lut) - 1)
            return lut[i0] * (1 - (idx - i0)) + lut[i1] * (idx - i0)

        Lb = through(Ln, bl)
        cl = labadj._contrast_curve(40, avg=float(Lb.mean()))
        Lc = through(Lb, cl) * 100.0
        xo, yo, zo = cs.lab_to_xyz(Lc, a, b, np)
        iws = np.linalg.inv(work)
        return np.einsum("ij,jhw->ihw", iws,
                         np.stack([xo, yo, zo])) * 65535.0

    rng = np.random.default_rng(3)
    for level in (0.15, 0.4, 0.75):  # non-neutral scene means
        img = jnp.asarray(np.clip(
            rng.uniform(level - 0.1, level + 0.1, (3, 32, 48)), 0, 1)
            * 65535.0, jnp.float32)
        ours = np.asarray(labadj.apply(img, data, static))
        ref = ref_apply(img)
        assert np.abs(ours - ref).max() / 65535.0 < 2e-3, level


def test_coarse_rotation_and_flip():
    rng = np.random.default_rng(6)
    rgb = rng.uniform(0.1, 0.9, (3, 64, 96))
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.coarse.rotate = 90
    out = develop(frame, pp)
    assert out.shape == (3, 96, 64)
    base = develop(frame, ProcParams())
    np.testing.assert_allclose(out, np.rot90(base, k=1, axes=(1, 2)),
                               atol=1e-4)
    pp2 = ProcParams()
    pp2.coarse.hflip = True
    out2 = develop(frame, pp2)
    np.testing.assert_allclose(out2, base[:, :, ::-1], atol=1e-4)


def test_fine_rotation():
    rgb = np.full((3, 64, 96), 0.2)
    rgb[:, 30:34, :] = 0.8  # horizontal bright bar
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.rotate.enabled = True
    pp.rotate.degree = 10.0
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # the bar must have rotated: column profile varies along x now
    bar_rows_left = np.argmax(out[1, :, 10:20].mean(axis=1))
    bar_rows_right = np.argmax(out[1, :, 76:86].mean(axis=1))
    assert abs(int(bar_rows_left) - int(bar_rows_right)) >= 8


def test_distortion_runs():
    rng = np.random.default_rng(8)
    frame = synthesize_bayer(rng.uniform(0.1, 0.9, (3, 64, 64)))
    pp = ProcParams()
    pp.distortion.enabled = True
    pp.distortion.amount = 0.2
    out = develop(frame, pp)
    assert np.all(np.isfinite(out))
    base = develop(frame, ProcParams())
    assert not np.allclose(out, base)


def _develop_arp(rgb, arp_text):
    frame = synthesize_bayer(rgb, cam_mul=(1.0, 1.0, 1.0))
    pp = ProcParams()
    pp.apply_arp_text(arp_text)
    return develop(frame, pp), develop(frame, ProcParams())


def _detail_image(h=64, w=64, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.25, 0.65, (8, 8))
    import cv2

    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.stack([img] * 3).clip(0.05, 0.95)


def test_local_contrast_region_boosts_detail():
    """Local Contrast regions (iplocalcontrast.cc): positive contrast
    raises local variation."""
    rgb = _detail_image()
    out, base = _develop_arp(rgb, "[Local Contrast]\nEnabled=true\n"
                                  "Contrast_1=60\n")
    inner = (slice(None), slice(12, -12), slice(12, -12))

    def local_var(x):
        return np.abs(np.diff(x[1], axis=1)).mean()

    assert local_var(out[inner]) > local_var(base[inner]) * 1.05


def test_texture_boost_amplifies_texture():
    """TextureBoost (iptextureboost.cc EPD role): strength > 0 amplifies
    fine detail more than the base develop."""
    rgb = _detail_image(seed=10)
    rng = np.random.default_rng(4)
    rgb = np.clip(rgb + rng.normal(0, 0.01, rgb.shape), 0.02, 0.98)
    out, base = _develop_arp(
        rgb, "[TextureBoost]\nEnabled=true\nStrength_1=2.0\n"
             "DetailThreshold_1=0.2\n")
    inner = (slice(None), slice(12, -12), slice(12, -12))

    def fine_energy(x):
        return np.abs(np.diff(x[1], axis=0)).mean()

    assert fine_energy(out[inner]) > fine_energy(base[inner]) * 1.02


def test_film_grain_adds_noise():
    """Film grain (ipgrain.cc): enabled grain raises high-frequency
    energy on a flat field."""
    rgb = np.full((3, 64, 64), 0.4)
    out, base = _develop_arp(rgb, "[Grain]\nEnabled=true\nStrength=60\n"
                                  "ISO=800\n")
    inner = (slice(None), slice(12, -12), slice(12, -12))

    def hf(x):
        return np.abs(np.diff(x[1], axis=0)).mean()

    assert hf(out[inner]) > hf(base[inner]) * 1.5


def test_transform_autofill_removes_black_corners():
    """AutoFill (iptransform.cc getTransformAutoFill): rotation corners
    are filled by the bisected zoom."""
    rng = np.random.default_rng(2)
    rgb = rng.uniform(0.3, 0.7, size=(3, 96, 128)).astype(np.float32)
    fr = synthesize_bayer(rgb, cam_mul=(1, 1, 1))
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    pp.rotate.enabled = True
    pp.rotate.degree = 5.0
    plain = develop(fr, pp)
    pp.common_trans.autofill = True
    filled = develop(fr, pp)
    assert plain[:, :4, :4].mean() < 0.05
    assert filled[:, :4, :4].mean() > 0.2


def test_gamut_warn_cli_surface(tmp_path):
    """--gamut-warn paints out-of-proof-gamut pixels cyan in the saved
    output (gamutwarning.cc mark color (0,255,255) as a batch op)."""
    import numpy as np

    from art_tpu.cli import main as cli_main
    from art_tpu.io.dngwrite import write_dng

    # flat saturated-red patch (noise scenes demosaic to near-gray and
    # stay in every gamut) shot on a camera whose primaries ARE ProPhoto
    # (cam_xyz = XYZ->ProPhoto): deep ProPhoto red sits far outside sRGB
    from art_tpu.color import colorspaces as cs

    m = np.zeros((64, 96), np.uint16)
    m[0::2, 0::2] = 15500   # R
    m[0::2, 1::2] = 1400    # G
    m[1::2, 0::2] = 1400    # G
    m[1::2, 1::2] = 1100    # B
    m += 500
    raw = tmp_path / "g.dng"
    cam_xyz = np.linalg.inv(cs.rgb_to_xyz_matrix("ProPhoto"))
    write_dng(raw, m, black=500, white=16500, cam_xyz=cam_xyz)
    # wide (ProPhoto) output proofed against sRGB: saturated pixels
    # fall outside the proof gamut
    arp = tmp_path / "wide.arp"
    arp.write_text("[Color Management]\nOutputProfile=RTv4_Large\n")
    out = tmp_path / "g.png"
    rc = cli_main(["-o", str(out), "-n", "-Y", "--gamut-warn", "sRGB",
                   "-p", str(arp), "-c", str(raw)])
    assert rc == 0 and out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    cyan = (img[..., 0] < 8) & (img[..., 1] > 247) & (img[..., 2] > 247)
    assert cyan.any()
