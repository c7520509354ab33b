"""Malformed-input corpus over every native decode family.

The native decoder (io/native/artraw.cc) parses untrusted bytes; its
bounds guards are only real if tests hit them. For each of the 21
format families this corpus takes a valid synthetic file and feeds the
decoder systematic corruptions:

  - truncation at 8 points through the file,
  - single-byte corruption (XOR 0xFF) at positions spread over the
    header and the payload stream,
  - dimension-field blowups via corruption of the early TIFF/container
    region (covered by the header positions).

The only acceptable outcomes are a successful decode (corruption hit
dead bytes / was survivable) or a clean Python exception from the
binding — never a crash. Run under the ASan/UBSan build
(`make -C art_tpu/io/native san` + tools/sanitize_run.sh) to turn
silent out-of-bounds reads into failures too.

Reference role: dcraw's pervasive derror() convention and the WITH_SAN
build option (reference CMakeLists.txt:147).
"""

import numpy as np
import pytest

import util_3fr
import util_arw
import util_cr2
import util_cr3
import util_crw
import util_dcr
import util_iiq
import util_mrw
import util_nef
import util_orf
import util_pef
import util_qtk
import util_radc
import util_raf
import util_raf_compressed
import util_rw2
import util_srw
import util_x3f

from art_tpu.io.rawfile import load_raw
from art_tpu.io.dngwrite import write_dng

H, W = 32, 64


def _mosaic(seed, h=H, w=W, lo=100, hi=3500):
    return np.asarray(
        np.random.default_rng(seed).integers(lo, hi, size=(h, w)),
        dtype=np.uint16)


def _make_writers():
    m = _mosaic(0)
    xm = _mosaic(1, 36, 66)   # X-Trans: 6-multiple dims
    rgb = np.random.default_rng(2).integers(
        50, 3000, size=(3, H, W)).astype(np.uint16)
    return {
        "dng": lambda p: write_dng(p, _mosaic(3), pattern="RGGB"),
        "cr2": lambda p: util_cr2.write_cr2(p, m),
        "cr3": lambda p: util_cr3.write_cr3(p, m),
        "cr3_lossy": lambda p: util_cr3.write_cr3_lossy(p, m),
        "nef": lambda p: util_nef.write_nef(p, m),
        "arw_a2": lambda p: util_arw.write_arw2(p, _mosaic(4, 32, 128)),
        "arw_ll": lambda p: util_arw.write_arw_lossless(p, m),
        "rw2": lambda p: util_rw2.write_rw2(p, _mosaic(7, 32, 63)),
        "raf": lambda p: util_raf.write_raf(p, m),
        "raf_comp": lambda p: util_raf_compressed.write_raf_compressed(
            p, _mosaic(6, 12, 768, lo=100, hi=4000), bits=12),
        "orf": lambda p: util_orf.write_orf(p, m),
        "pef": lambda p: util_pef.write_pef(p, m),
        "srw": lambda p: util_srw.write_srw(p, m),
        "mrw": lambda p: util_mrw.write_mrw(p, m),
        "3fr": lambda p: util_3fr.write_3fr(p, m),
        "iiq": lambda p: util_iiq.write_iiq(p, (m & ~np.uint16(3))),
        "x3f": lambda p: util_x3f.write_x3f(p, rgb),
        "crw": lambda p: util_crw.write_crw(p, m),
        "dcr": lambda p: util_dcr.write_dcr(p, _mosaic(5, 32, 256)),
        "qtk": lambda p: util_radc.write_qktn(
            p, np.random.default_rng(8).integers(0, 32, (H, W))),
        "x3f_q": lambda p: util_x3f.write_x3f_quattro(
            p, _mosaic(10, 16, 32, hi=3000), _mosaic(11, 16, 32, hi=3000),
            _mosaic(12, 32, 64, hi=3000)),
        "kdc": lambda p: util_radc.write_kdc_radc(
            p, np.random.default_rng(9).integers(0, 32, (512, 768))),
        "qtk_100": lambda p: util_qtk.write_qtk100(p, H, W, seed=13),
        "kdc_120": lambda p: util_radc.write_kdc_dc120(
            p, np.random.default_rng(14).integers(
                0, 256, size=(976, 848)).astype(np.uint8)),
    }


WRITERS = _make_writers()


def _attempt(path):
    """Decode must return or raise cleanly — never crash the process."""
    try:
        frame = load_raw(str(path))
        # touch the pixels so lazily-materialized buffers get realized
        np.asarray(frame.cfa if frame.cfa is not None else 0).sum()
    except Exception:
        pass


@pytest.mark.parametrize("fam", sorted(WRITERS))
def test_truncation_corpus(fam, tmp_path):
    src = tmp_path / f"whole.{fam.split('_')[0]}"
    WRITERS[fam](src)
    data = src.read_bytes()
    n = len(data)
    for frac in (0.01, 0.05, 0.15, 0.3, 0.5, 0.7, 0.9, 0.99):
        cut = max(1, int(n * frac))
        p = tmp_path / f"t{cut}.{fam.split('_')[0]}"
        p.write_bytes(data[:cut])
        _attempt(p)


@pytest.mark.parametrize("fam", sorted(WRITERS))
def test_bitflip_corpus(fam, tmp_path):
    src = tmp_path / f"whole.{fam.split('_')[0]}"
    WRITERS[fam](src)
    data = bytearray(src.read_bytes())
    n = len(data)
    # header region: every 8th byte of the first 256; payload: 16 spread
    positions = list(range(0, min(256, n), 8))
    positions += [min(n - 1, 256 + (n - 256) * k // 16) for k in range(16)]
    for pos in sorted(set(positions)):
        orig = data[pos]
        data[pos] ^= 0xFF
        p = tmp_path / f"f{pos}.{fam.split('_')[0]}"
        p.write_bytes(bytes(data))
        data[pos] = orig
        _attempt(p)


@pytest.mark.parametrize("fam", sorted(WRITERS))
def test_valid_roundtrip_sanity(fam, tmp_path):
    """The corpus base files themselves must decode (guards the corpus
    against silently testing nothing)."""
    src = tmp_path / f"ok.{fam.split('_')[0]}"
    WRITERS[fam](src)
    frame = load_raw(str(src))
    assert frame.cfa is not None
