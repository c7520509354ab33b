"""Fast-export pipeline (-q): early resize + demosaic downgrade.

Reference: ``simpleprocess.cc:89-110`` (fast_pipeline), ``:492-531``
(stage_early_resize), ``:533-549`` (adjust_procparams), ``:362-366``
(scaled crop), ``:404`` (final resize skipped when fast).
"""

import numpy as np

from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop, plan


def _frame(h=128, w=192, seed=3):
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0.1, 0.8, size=(3, h, w)).astype(np.float32)
    return synthesize_bayer(rgb, pattern="RGGB")


def test_fast_plans_early_resize():
    frame = _frame()
    pp = ProcParams()
    pp.resize.enabled = True
    pp.resize.data_specified = 0
    pp.resize.scale = 0.5
    config, data = plan(frame, pp, fast=True)
    assert config.early_resize is not None
    sh0, sw0, th, tw = config.early_resize
    assert (sh0, sw0) == (128, 192)
    assert (th, tw) == (64, 96)
    assert config.resize_to is None  # final resize skipped (is_fast)
    assert "early_rows" in data


def test_fast_without_resize_is_normal():
    frame = _frame()
    pp = ProcParams()
    config, _ = plan(frame, pp, fast=True)
    assert config.early_resize is None


def test_fast_downgrades_demosaic():
    frame = _frame()
    pp = ProcParams()
    pp.resize.enabled = True
    pp.resize.data_specified = 0
    pp.resize.scale = 0.5
    pp.raw.bayer.method = "pixelshift"
    config, _ = plan(frame, pp, fast=True)
    assert config.demosaic_method == "amaze"
    # caller's pp untouched (deepcopy semantics)
    assert pp.raw.bayer.method == "pixelshift"


def test_fast_output_close_to_normal_resize():
    frame = _frame()
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    pp.resize.enabled = True
    pp.resize.data_specified = 0
    pp.resize.scale = 0.5
    normal = develop(frame, pp)
    fast = develop(frame, pp, fast=True)
    assert fast.shape == normal.shape == (3, 64, 96)
    # resample-before vs resample-after the (neutral-ish) op chain:
    # same scene, small numeric differences away from edges
    inner = (slice(None), slice(8, -8), slice(8, -8))
    assert np.median(np.abs(fast[inner] - normal[inner])) < 0.05


def test_fast_scaled_crop():
    frame = _frame()
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    pp.resize.enabled = True
    pp.resize.data_specified = 0
    pp.resize.scale = 0.5
    pp.crop.enabled = True
    pp.crop.x, pp.crop.y, pp.crop.w, pp.crop.h = 32, 16, 96, 64
    out = develop(frame, pp, fast=True)
    # crop coords scale with the early resize (simpleprocess.cc:362-366)
    assert out.shape == (3, 32, 48)
