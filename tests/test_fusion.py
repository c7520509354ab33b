"""Pass-fusion parity: the fused raw-head (WB+cam2work -> denoise kernel)
and rgb2out-tail (work2out+TRC -> neutral tone-curve kernel) paths must
match the unfused pass-per-op pipeline (develop.py _build_run gates)."""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
import importlib

dev = importlib.import_module("art_tpu.pipeline.develop")
from art_tpu.settings import settings


def _pp(repo_profile=True):
    import os

    pp = ProcParams()
    arp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "art_tpu", "data", "profiles",
        "Standard Film Curve.arp")
    pp.apply_arp_text(open(arp).read())
    pp.denoise.enabled = True
    pp.denoise.luminance = 20.0
    pp.denoise.chrominance = 20.0
    return pp


def test_fused_passes_match_unfused():
    # 256x1024 is the minimum fused-denoise-kernel tile; both fusion
    # gates fire (denoise first stage-0 op, neutral curve last, sRGB out)
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0.02, 0.95, size=(3, 256, 1024)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    pp = _pp()

    config, _ = dev.plan(frame, pp)
    assert config.out_trc[0] == "srgb"
    names0 = [s[0] for s in config.steps if s[2] == 0]
    assert names0 and names0[0] == "denoise"

    try:
        settings.fuse_passes = True
        dev._executor.cache_clear()
        fused = np.asarray(dev.develop(frame, pp))
        settings.fuse_passes = False
        dev._executor.cache_clear()
        unfused = np.asarray(dev.develop(frame, pp))
    finally:
        settings.fuse_passes = True
        dev._executor.cache_clear()

    assert fused.shape == unfused.shape
    # identical math, different fusion boundaries: agree to f32 noise
    # (encoded [0,1] output; 1e-4 = ~0.026 of an 8-bit step)
    assert np.abs(fused - unfused).max() < 1e-3
    assert np.abs(fused - unfused).mean() < 1e-5


def test_fusion_gates_off_for_nonneutral_or_resize():
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0.02, 0.95, size=(3, 128, 128)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    pp = _pp()
    pp.resize.enabled = True
    pp.resize.allow_upscaling = False
    pp.resize.width = 64
    pp.resize.height = 64
    out = np.asarray(dev.develop(frame, pp))  # tail gate must not fire
    assert np.all(np.isfinite(out))
    assert out.max() <= 1.0 and out.min() >= 0.0
