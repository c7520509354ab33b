"""Region-based ops: smoothing, texture boost, local contrast, grain."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline import develop


def textured_frame(seed=2):
    rng = np.random.default_rng(seed)
    rgb = np.clip(0.4 + 0.15 * rng.standard_normal((3, 64, 64)), 0.05, 0.95)
    return synthesize_bayer(rgb)


def test_smoothing_guided_blurs():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[Smoothing]\nEnabled=true\nMode_1=0\nChannel_1=2\nRadius_1=5\n"
        "Epsilon_1=-6\nIterations_1=1\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() < base[:, 8:-8, 8:-8].std() * 0.8


def test_smoothing_gaussian_area_mask():
    frame = textured_frame()
    arp = ("[Smoothing]\nEnabled=true\nMode_1=1\nChannel_1=2\nSigma_1=6\n"
           "Iterations_1=1\nAreaMaskEnabled_1=true\n"
           "AreaMask0Type_1=rectangle\nAreaMask0X_1=-50\nAreaMask0Y_1=0\n"
           "AreaMask0Width_1=50\nAreaMask0Height_1=100\n")
    pp = ProcParams().apply_arp_text(arp)
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    # left half smoothed, right half untouched
    left_o = out[:, 10:-10, 4:24].std()
    left_b = base[:, 10:-10, 4:24].std()
    right_o = out[:, 10:-10, 40:60].std()
    right_b = base[:, 10:-10, 40:60].std()
    assert left_o < left_b * 0.9
    assert abs(right_o - right_b) < 0.01


def test_texture_boost_amplifies_detail():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[TextureBoost]\nEnabled=true\nStrength_1=2.0\n"
        "DetailThreshold_1=0.2\nIterations_1=1\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std() * 1.05


def test_local_contrast_region():
    frame = textured_frame()
    pp = ProcParams().apply_arp_text(
        "[Local Contrast]\nEnabled=true\nContrast_1=50\n")
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std()


def test_grain_adds_noise():
    rgb = np.full((3, 64, 64), 0.4)
    frame = synthesize_bayer(rgb)
    pp = ProcParams()
    pp.grain.enabled = True
    pp.grain.strength = 80
    pp.grain.iso = 1600
    out = develop(frame, pp)
    base = develop(frame, ProcParams())
    assert out[:, 8:-8, 8:-8].std() > base[:, 8:-8, 8:-8].std() + 0.002


def test_drawn_mask_modes():
    """Brush strokes (masks.cc generate_drawn_mask): additive stamp,
    intersect restriction, erase hole."""
    import jax.numpy as jnp

    from art_tpu.masks import MaskSpec, eval_mask, plan_mask

    strokes = [3, 0.3, 1, 1.0, 0.5, 0.5, 0.52, 0.5, 0.54, 0.5]
    h, w = 96, 128
    rgb = jnp.full((3, h, w), 30000.0)
    ws = jnp.asarray(np.eye(3, dtype=np.float32))

    spec = MaskSpec(drawn_enabled=True, drawn_strokes=strokes, drawn_mode=0)
    static, data = plan_mask(spec, (h, w))
    m = np.asarray(eval_mask(rgb, ws, static,
                             {k: jnp.asarray(v) for k, v in data.items()}))
    assert m[48, 64] > 0.95 and m[0, 0] < 0.05

    strokes_erase = strokes + [1, 0.15, 0, 1.0, 0.5, 0.5]
    spec = MaskSpec(drawn_enabled=True, drawn_strokes=strokes_erase,
                    drawn_mode=0)
    static, data = plan_mask(spec, (h, w))
    m = np.asarray(eval_mask(rgb, ws, static,
                             {k: jnp.asarray(v) for k, v in data.items()}))
    assert m[48, 64] < 0.05 and m[48, 72] > 0.9


def test_packed_half_list_roundtrip():
    from art_tpu.params.keyfile import pack_half_list, unpack_half_list

    v = [2, 0.25, 1, 0.75, 0.1, 0.9, 0.2, 0.8]
    out = unpack_half_list(pack_half_list(v))
    np.testing.assert_allclose(out, v, atol=2e-3)
