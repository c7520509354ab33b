"""Canon CR3 native decode (canon_cr3_decoder.cc / CRX lossless)."""

import numpy as np
import pytest

from util_cr3 import write_cr3

from art_tpu.io.rawfile import load_raw


def _mosaic(h, w, seed=0, lo=100, hi=3600):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(h, w)).astype(np.uint16)


def test_cr3_roundtrip(tmp_path):
    """Lossless CRX: decoded mosaic is bit-exact (crxDecodeLine paths)."""
    m = _mosaic(40, 56)
    path = write_cr3(tmp_path / "a.cr3", m)
    frame = load_raw(path)
    assert frame.pattern == "RGGB"
    assert frame.cfa.shape == (40, 56)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_cr3_roundtrip_smooth_runs(tmp_path):
    """Flat regions exercise the zero-run / repeat-run ladder
    (crxDecodeTopLine run branch + crxDecodeLine run context)."""
    m = np.full((32, 48), 2048, np.uint16)  # constant = all-runs
    m[10:20, 10:30] = 900
    m[5, :] = 2048  # keep top-line runs long
    path = write_cr3(tmp_path / "b.cr3", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_cr3_roundtrip_zero_plane(tmp_path):
    """A subplane equal to the median everywhere encodes as full-line
    runs (the no-terminator ladder case)."""
    m = _mosaic(24, 32)
    m[0::2, 0::2] = 2048  # R subplane == median (residual 0)
    path = write_cr3(tmp_path / "c.cr3", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_cr3_roundtrip_extremes(tmp_path):
    """Full-range values stress the Rice escape (>= 41 zeros -> 21-bit
    raw) and the k adaptation."""
    rng = np.random.default_rng(3)
    m = rng.integers(0, 4096, size=(24, 40)).astype(np.uint16)
    m[0, 0] = 4095
    m[0, 1] = 0
    m[1, 0] = 4095
    path = write_cr3(tmp_path / "d.cr3", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


@pytest.mark.parametrize("layout,pattern", [(0, "RGGB"), (1, "GRBG"),
                                            (2, "GBRG"), (3, "BGGR")])
def test_cr3_cfa_layouts(tmp_path, layout, pattern):
    m = _mosaic(16, 24, seed=layout)
    path = write_cr3(tmp_path / f"l{layout}.cr3", m, cfa_layout=layout)
    frame = load_raw(path)
    assert frame.pattern == pattern
    assert np.array_equal(frame.cfa.astype(np.uint16), m)


def test_cr3_metadata(tmp_path):
    """CMT1 (make/model), CMT2 (ISO), CMT3 (ColorData WB) harvested."""
    m = _mosaic(16, 24)
    path = write_cr3(tmp_path / "m.cr3", m, wb=(2.0, 1.0, 1.5),
                     model=b"Canon EOS R6-TEST")
    frame = load_raw(path)
    assert frame.make == "Canon"
    assert "R6-TEST" in frame.model
    assert frame.iso == 800.0
    assert frame.cam_mul is not None
    assert np.allclose(frame.cam_mul[:3], [2.0, 1.0, 1.5], rtol=1e-3)


def test_cr3_develops(tmp_path):
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    m = (600 + 8 * xx + 5 * yy).astype(np.uint16)
    path = write_cr3(tmp_path / "dev.cr3", m)
    out = np.asarray(process_image(load_raw(path), ProcParams()))
    assert out.shape[0] == 3
    assert float(np.mean(out)) > 0.01


# ---------------------------------------------------------------------------
# Lossy (wavelet cRAW profile) CRX — canon_cr3_decoder.cc subband/IDWT path
# ---------------------------------------------------------------------------

def test_cr3_lossy_roundtrip(tmp_path):
    """3-level 5/3 wavelet + qParam quantization reconstructs exactly the
    reference arithmetic (crxDecodeLossy* + crxIdwt53 equivalents)."""
    from util_cr3 import write_cr3_lossy
    m = _mosaic(64, 80)
    path, expected = write_cr3_lossy(tmp_path / "l.cr3", m)
    frame = load_raw(path)
    assert frame.pattern == "RGGB"
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)
    # lossy but close: quantization error bounded
    assert np.abs(frame.cfa.astype(int) - m.astype(int)).mean() < 8


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_cr3_lossy_levels(tmp_path, levels):
    """Each decomposition depth exercises its own band geometry
    (CMP1 levels byte -> 3*levels+1 FF03 subband headers)."""
    from util_cr3 import write_cr3_lossy
    m = _mosaic(48, 64, seed=levels)
    path, expected = write_cr3_lossy(tmp_path / f"v{levels}.cr3", m,
                                     levels=levels)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)


@pytest.mark.parametrize("q", [4, 6, 9, 13])
def test_cr3_lossy_qparams(tmp_path, q):
    """qParam sweep covers the qStep table across shift regimes
    (q_step_tbl >> (6 - q/6) arithmetic; q<6 with scale 0 is degenerate
    and never produced by cameras)."""
    from util_cr3 import write_cr3_lossy
    m = _mosaic(32, 48, seed=q)
    path, expected = write_cr3_lossy(tmp_path / f"q{q}.cr3", m, q_param=q)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)


def test_cr3_lossy_no_partial(tmp_path):
    """supportsPartial=0: the LL band uses the same no-ref coder as the
    detail bands (crxDecodeLineNoRefPrevLine for band 0)."""
    from util_cr3 import write_cr3_lossy
    m = _mosaic(32, 48, seed=7)
    path, expected = write_cr3_lossy(tmp_path / "np.cr3", m,
                                     supports_partial=False)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)


@pytest.mark.parametrize("layout", [0, 1, 2, 3])
def test_cr3_lossy_cfa_layouts(tmp_path, layout):
    from util_cr3 import write_cr3_lossy
    m = _mosaic(32, 32, seed=layout)
    path, expected = write_cr3_lossy(tmp_path / f"ll{layout}.cr3", m,
                                     cfa_layout=layout)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)


def test_cr3_lossy_odd_plane_dims(tmp_path):
    """Subplane dims not divisible by 2^levels stress the boundary
    extension (rowStartAddOn/colEndAddOn band geometry)."""
    from util_cr3 import write_cr3_lossy
    m = _mosaic(52, 60, seed=11)  # 26x30 subplanes, 3 levels
    path, expected = write_cr3_lossy(tmp_path / "odd.cr3", m, levels=3)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)


def test_cr3_lossy_flat(tmp_path):
    """Constant mosaic: all detail bands zero -> pure run ladders in the
    no-ref coder."""
    from util_cr3 import write_cr3_lossy
    m = np.full((32, 48), 2048, np.uint16)
    path, expected = write_cr3_lossy(tmp_path / "flat.cr3", m)
    frame = load_raw(path)
    assert np.array_equal(frame.cfa.astype(np.uint16), expected)
