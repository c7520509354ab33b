"""Native NEF decode path (oracle: tests/util_nef.py synthetic writer)."""

import numpy as np
import pytest

from art_tpu.io.rawfile import load_raw
from tests.util_nef import write_nef


@pytest.mark.parametrize("bps", [12, 14])
def test_nef_roundtrip(tmp_path, bps):
    rng = np.random.default_rng(8)
    # smooth-ish mosaic (keeps diffs in-range like a real sensor ramp)
    base = rng.integers(500, (1 << bps) - 600, size=(12, 16))
    import cv2

    mosaic = cv2.resize(base.astype(np.float32), (96, 64),
                        interpolation=cv2.INTER_LINEAR)
    mosaic = (mosaic + rng.normal(0, 12, mosaic.shape)).clip(
        0, (1 << bps) - 1).astype(np.uint16)
    p = str(tmp_path / "shot.nef")
    write_nef(p, mosaic, bps=bps)
    fr = load_raw(p)
    np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
    assert fr.pattern == "RGGB"
    assert fr.white[0] == (1 << bps) - 1


def test_nef_metadata(tmp_path):
    rng = np.random.default_rng(1)
    mosaic = rng.integers(0, 4000, size=(32, 48)).astype(np.uint16)
    p = str(tmp_path / "meta.nef")
    write_nef(p, mosaic, bps=14, iso=1600, wb_rbgg=(2.2, 1.4, 1.0, 1.0),
              model="SYNTH Z9")
    fr = load_raw(p)
    assert "NIKON" in fr.make
    assert fr.model == "SYNTH Z9"
    assert fr.iso == 1600
    np.testing.assert_allclose(fr.cam_mul[0], 2.2, rtol=1e-3)
    np.testing.assert_allclose(fr.cam_mul[2], 1.4, rtol=1e-3)
