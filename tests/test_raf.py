"""Native RAF decode path (oracle: tests/util_raf.py synthetic writer)."""

import numpy as np

from art_tpu.io.rawfile import (XTRANS_CANONICAL, load_raw,
                                synthesize_xtrans)
from tests.util_raf import write_raf


def test_raf_xtrans_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    rgb = rng.uniform(0.05, 0.9, size=(3, 96, 120)).astype(np.float32)
    frame = synthesize_xtrans(rgb, black=0.0, white=15000.0)
    mosaic = np.round(frame.cfa).astype(np.uint16)
    p = str(tmp_path / "shot.raf")
    write_raf(p, mosaic, xtrans=XTRANS_CANONICAL,
              wb_grbg=(1024, 2048, 1536, 1024))
    fr = load_raw(p)
    assert fr.pattern is None
    assert fr.xtrans == XTRANS_CANONICAL
    assert fr.make == "FUJIFILM"
    assert fr.model == "X-SYNTH"
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    # WB: records are (G, R, B, G2) -> gains R=2048/1024=2, B=1.5
    np.testing.assert_allclose(fr.cam_mul[0], 2.0, rtol=1e-3)
    np.testing.assert_allclose(fr.cam_mul[2], 1.5, rtol=1e-3)
    assert fr.white[0] == 16383.0


def test_raf_bayer_fallback(tmp_path):
    rng = np.random.default_rng(3)
    mosaic = (rng.uniform(0, 12000, size=(64, 80))).astype(np.uint16)
    p = str(tmp_path / "bayer.raf")
    write_raf(p, mosaic, xtrans=None)
    fr = load_raw(p)
    assert fr.xtrans is None
    assert fr.pattern is not None and len(fr.pattern) == 4
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))


def test_raf_compressed_xtrans_roundtrip(tmp_path):
    from tests.util_raf_compressed import write_raf_compressed

    rng = np.random.default_rng(7)
    # smooth base + noise so both the Golomb fast path and escapes fire
    base = np.linspace(200, 3200, 768)[None, :] + np.linspace(0, 400, 12)[:, None]
    mosaic = (base + rng.normal(0, 60, size=(12, 768))).clip(0, 4095)
    mosaic = np.round(mosaic).astype(np.uint16)
    mosaic[3, 100] = 4095  # spikes -> raw escape codes
    mosaic[7, 500] = 0
    p = str(tmp_path / "comp.raf")
    achievable = write_raf_compressed(p, mosaic, bits=12,
                                      xtrans=XTRANS_CANONICAL)
    fr = load_raw(p)
    assert fr.xtrans == XTRANS_CANONICAL
    assert fr.white[0] == 4095.0
    np.testing.assert_array_equal(fr.cfa, achievable.astype(np.float32))
    # the schedule interpolates only lanes without sensor samples: the
    # achievable mosaic must equal the input everywhere
    np.testing.assert_array_equal(achievable, mosaic)


def test_raf_compressed_bayer_multiblock(tmp_path):
    from tests.util_raf_compressed import write_raf_compressed

    rng = np.random.default_rng(13)
    mosaic = rng.integers(0, 16384, size=(12, 1536)).astype(np.uint16)
    p = str(tmp_path / "gfx.raf")
    achievable = write_raf_compressed(p, mosaic, bits=14, xtrans=None)
    fr = load_raw(p)
    assert fr.xtrans is None
    assert fr.white[0] == 16383.0
    np.testing.assert_array_equal(fr.cfa, achievable.astype(np.float32))
    np.testing.assert_array_equal(achievable, mosaic)  # bayer: all coded


def test_raf_14bit_packed(tmp_path):
    from tests.util_raf import pack_fuji14

    rng = np.random.default_rng(5)
    mosaic = rng.integers(0, 16384, size=(24, 96)).astype(np.uint16)
    p = str(tmp_path / "packed.raf")
    write_raf(p, mosaic, xtrans=None, payload=pack_fuji14(mosaic))
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
