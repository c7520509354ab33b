"""Sigma X3F (Foveon) native decode tests.

Reference behavior boundary: dcraw.cc parse_foveon (:7899),
foveon_dp_load_raw (:3867), foveon_sd_load_raw (:3820),
foveon_decoder (:3749); ART treats the frame as a non-mosaic 3-color
image (ST_FOVEON, rawimage.cc:115; filters=0, dcraw.cc:9917) and never
runs foveon_interpolate.
"""

import numpy as np
import pytest

from art_tpu.io.rawfile import load_raw
from tests.util_x3f import write_x3f


def _smooth_rgb(h, w, lo=400, hi=3800, seed=0):
    """Smooth-ish planes: neighbor diffs bounded so every format's
    category/table range holds."""
    rng = np.random.default_rng(seed)
    base = rng.integers(lo, hi, size=(3, 1, 1))
    dy = rng.integers(-200, 201, size=(3, h, 1))
    dx = rng.integers(-200, 201, size=(3, 1, w))
    img = np.clip(base + dy + dx, 0, 4095)
    return img.astype(np.int64)


def test_x3f_true_roundtrip(tmp_path):
    rgb = _smooth_rgb(24, 36)
    p = tmp_path / "t.x3f"
    expected = write_x3f(p, rgb, fmt=30, model="DP2 Merrill")
    frame = load_raw(p)
    assert frame.pattern is None and frame.xtrans is None
    assert frame.cfa.shape == (3, 24, 36)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)
    assert frame.make.upper().startswith("SIGMA")
    assert frame.model == "DP2 Merrill"
    assert frame.iso == 200


def test_x3f_packed_roundtrip(tmp_path):
    # diff-table reach is +-512/pixel: per-row values start near 0
    rgb = _smooth_rgb(16, 20, lo=80, hi=420, seed=1) % 450
    p = tmp_path / "p.x3f"
    expected = write_x3f(p, rgb, fmt=5, model="SD10")
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_x3f_huffman_roundtrip(tmp_path):
    # w=20: rows are not 32-bit aligned (600 % 32 != 0) -> no skip words
    rgb = _smooth_rgb(12, 20, lo=80, hi=420, seed=2) % 450
    p = tmp_path / "h.x3f"
    expected = write_x3f(p, rgb, fmt=6, model="SD14")
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_x3f_huffman_sd9_row_skip_quirk(tmp_path):
    # w=16: rows consume exactly 480 bits = 15 groups -> the SD9/SD10
    # stream carries a dummy u32 between rows (dcraw model quirk)
    rgb = _smooth_rgb(10, 16, lo=80, hi=420, seed=3) % 450
    p = tmp_path / "q.x3f"
    expected = write_x3f(p, rgb, fmt=6, model="SD9")
    frame = load_raw(p)
    np.testing.assert_array_equal(frame.cfa.astype(np.uint16), expected)


def test_x3f_camconst_matrix(tmp_path):
    rgb = _smooth_rgb(8, 12, seed=4)
    p = tmp_path / "m.x3f"
    write_x3f(p, rgb, fmt=30, model="DP2 Merrill")
    frame = load_raw(p)
    # bundled camconst carries the Sigma Merrill dcraw matrix
    assert frame.cam_xyz is not None


def test_x3f_develops(tmp_path):
    """Full pipeline: X3F -> scale -> (no demosaic) -> output."""
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import develop

    rgb = _smooth_rgb(32, 48, seed=5)
    p = tmp_path / "d.x3f"
    write_x3f(p, rgb, fmt=30, model="DP2 Merrill")
    frame = load_raw(p)
    pp = ProcParams()
    out = np.asarray(develop(frame, pp))
    assert out.shape == (3, 32, 48)
    assert np.isfinite(out).all()
    assert out.max() > 0.01


def test_x3f_quattro_roundtrip(tmp_path):
    """Format 35 (Quattro, beyond-reference: dcraw has no support and
    ART needs LibRaw): 16-byte per-plane-dims prefix + TRUE structure
    (x3f_tools x3f_io.c layout); quarter-res top planes replicate 2x2
    into the (3, H, W) Foveon frame."""
    from tests.util_x3f import write_x3f_quattro

    h, w = 24, 32
    q0 = _smooth_rgb(h // 2, w // 2, seed=7)[0]
    q1 = _smooth_rgb(h // 2, w // 2, seed=8)[0]
    p2 = _smooth_rgb(h, w, seed=9)[0]
    p = tmp_path / "q.x3f"
    expected = write_x3f_quattro(p, q0, q1, p2)
    frame = load_raw(p)
    assert frame.pattern is None and frame.cfa.ndim == 3
    np.testing.assert_array_equal(frame.cfa.astype(np.int64), expected)
    assert frame.model == "sd Quattro"


def test_x3f_quattro_truncated_fails_cleanly(tmp_path):
    from tests.util_x3f import write_x3f_quattro

    h, w = 16, 16
    q0 = _smooth_rgb(h // 2, w // 2, seed=10)[0]
    q1 = _smooth_rgb(h // 2, w // 2, seed=11)[0]
    p2 = _smooth_rgb(h, w, seed=12)[0]
    p = tmp_path / "q.x3f"
    write_x3f_quattro(p, q0, q1, p2)
    data = p.read_bytes()
    t = tmp_path / "trunc.x3f"
    t.write_bytes(data[: len(data) // 3])
    try:
        load_raw(t)
    except (ValueError, RuntimeError, NotImplementedError):
        pass
