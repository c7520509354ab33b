"""Output encode matrix: (format x depth) per the reference contract.

Reference: ``imageio.h:90-96`` (savePNG 8/16, saveJPEG, saveTIFF 8/16/32f
with optional deflate), CLI ``-b``/``-t[z]`` handling
``main-cli.cc:878-887``.
"""

import numpy as np
import pytest

from art_tpu.io.imagefile import save_image

RNG = np.random.default_rng(7)
IMG = RNG.uniform(0.0, 1.0, size=(3, 40, 56)).astype(np.float32)
TAGS = {"make": "TestMake", "model": "TestModel", "iso": 320,
        "exposure_time": (1, 125), "f_number": 4.0, "focal_length": 50.0}


def _read_cv2(path):
    import cv2

    a = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    assert a is not None, path
    return a[..., ::-1]  # BGR -> RGB


@pytest.mark.parametrize("bits,uncompressed", [
    (8, False), (16, False), (16, True), (32, False), (32, True)])
def test_tiff_depths(tmp_path, bits, uncompressed):
    p = tmp_path / f"out{bits}{'u' if uncompressed else ''}.tif"
    save_image(p, IMG, bits=bits, uncompressed=uncompressed,
               exif_tags=TAGS, icc_bytes=b"\x00" * 64)
    a = _read_cv2(p)
    assert a.shape == (40, 56, 3)
    ref = np.moveaxis(IMG, 0, -1)
    if bits == 32:
        assert a.dtype == np.float32
        np.testing.assert_allclose(a, ref, atol=1e-6)
    else:
        assert a.dtype == (np.uint8 if bits == 8 else np.uint16)
        scale = 255.0 if bits == 8 else 65535.0
        tol = 0.51 / scale
        assert np.abs(a.astype(np.float64) / scale - ref).max() <= tol


def test_tiff_exif_and_icc(tmp_path):
    from PIL import Image

    p = tmp_path / "meta.tif"
    icc = b"\x12\x34" * 40
    save_image(p, IMG, bits=8, exif_tags=TAGS, icc_bytes=icc)
    im = Image.open(p)
    ex = im.getexif()
    assert ex.get(271) == "TestMake"
    assert ex.get(272) == "TestModel"
    sub = ex.get_ifd(0x8769)
    assert sub.get(34855) == 320
    assert float(sub.get(33437)) == pytest.approx(4.0)
    assert im.tag_v2[34675] == icc


@pytest.mark.parametrize("bits", [8, 16])
def test_png_depths(tmp_path, bits):
    p = tmp_path / f"out{bits}.png"
    save_image(p, IMG, bits=bits)
    a = _read_cv2(p)
    assert a.dtype == (np.uint8 if bits == 8 else np.uint16)
    scale = 255.0 if bits == 8 else 65535.0
    ref = np.moveaxis(IMG, 0, -1)
    assert np.abs(a.astype(np.float64) / scale - ref).max() <= 0.51 / scale


def test_jpeg(tmp_path):
    from PIL import Image

    p = tmp_path / "out.jpg"
    save_image(p, IMG, bits=8, quality=95)
    im = Image.open(p)
    assert im.mode == "RGB" and im.size == (56, 40)


def test_tiff_16_roundtrip_via_loader(tmp_path):
    """16-bit TIFF output is readable by our own StdImageSource loader."""
    from art_tpu.io.imagefile import load_std_image

    # smooth ramp (srgb encode/decode roundtrip tolerance)
    y = np.linspace(0.05, 0.95, 40)[None, :, None]
    img = np.broadcast_to(y, (3, 40, 56)).astype(np.float32)
    p = tmp_path / "ramp16.tif"
    save_image(p, img, bits=16)
    frame = load_std_image(p)
    assert frame.rgb.shape == (3, 40, 56)
