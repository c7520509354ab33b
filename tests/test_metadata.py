"""Metadata harvest/tunnel, embedded previews, histogram matching."""

import numpy as np
import pytest

from art_tpu.io import dngwrite
from art_tpu.io.metadata import build_exif_bytes, embedded_thumb, harvest
from art_tpu.io.rawfile import load_raw, synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop, process_image


@pytest.fixture
def dng_with_preview(tmp_path):
    rng = np.random.default_rng(3)
    h, w = 192, 256
    rgb = np.clip(np.stack([np.linspace(0.1, 0.9, w)[None, :]
                            * np.ones((h, 1))] * 3)
                  + rng.normal(0, 0.01, (3, h, w)), 0, 1)
    frame = synthesize_bayer(rgb, "RGGB")
    look = np.clip(0.5 - 0.5 * np.cos(np.pi * rgb ** 0.8), 0, 1)
    path = tmp_path / "p.dng"
    dngwrite.write_dng(path, np.asarray(frame.cfa).astype(np.uint16),
                       pattern="RGGB", black=512, white=16383,
                       preview_rgb01=look[:, ::4, ::4])
    return path, look


def test_harvest_tags(dng_with_preview):
    path, _ = dng_with_preview
    tags, previews = harvest(path)
    assert tags["make"] == "ART-TPU"
    assert tags["model"] == "Synthetic"
    assert tags["iso"] == 100
    assert previews


def test_embedded_thumb(dng_with_preview):
    path, look = dng_with_preview
    t = embedded_thumb(path)
    assert t is not None and t.shape == (3, 48, 64)
    # the preview content round-trips (JPEG-lossy)
    assert np.abs(t - look[:, ::4, ::4]).mean() < 0.03


def test_resilient_jpeg_salvage():
    # truncated JPEG (the jpeg_ijg resilient-thumbnail role): strict
    # decode fails, the salvage pass keeps the decoded scanlines
    import io as _io

    from PIL import Image

    from art_tpu.io.metadata import _decode_jpeg_resilient

    rng = np.random.default_rng(7)
    arr = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    blob = buf.getvalue()
    cut = blob[: len(blob) * 2 // 3]  # drop the tail incl. EOI
    img = _decode_jpeg_resilient(cut)
    assert img is not None and img.size == (96, 64)
    assert _decode_jpeg_resilient(b"\xff\xd8garbage") is None


def test_exif_tunnel_to_jpeg(dng_with_preview, tmp_path):
    from PIL import Image

    path, _ = dng_with_preview
    out = tmp_path / "o.jpg"
    process_image(str(path), ProcParams(), output_path=str(out))
    ex = Image.open(out).getexif()
    assert ex[271] == "ART-TPU" and ex[272] == "Synthetic"
    assert dict(ex.get_ifd(0x8769)).get(34855) == 100


def test_exif_strip_mode(dng_with_preview, tmp_path):
    from PIL import Image

    path, _ = dng_with_preview
    pp = ProcParams()
    pp.metadata.mode = 2  # strip
    out = tmp_path / "s.jpg"
    process_image(str(path), pp, output_path=str(out))
    ex = Image.open(out).getexif()
    assert 271 not in ex


def test_histogram_matching(dng_with_preview):
    path, look = dng_with_preview
    fr = load_raw(path)
    pp = ProcParams()
    pp.tone_curve.histmatching = True
    out_hm = np.asarray(develop(fr, pp))
    out_plain = np.asarray(develop(fr, ProcParams()))

    def lum(a):
        return 0.2126 * a[0] + 0.7152 * a[1] + 0.0722 * a[2]

    lk = lum(look)
    qs = (0.1, 0.3, 0.5, 0.7, 0.9)

    def qdist(img):
        li = lum(img)
        return sum(abs(float(np.quantile(li, p)) - float(np.quantile(lk, p)))
                   for p in qs)

    assert qdist(out_hm) < 0.2 * qdist(out_plain)


def test_build_exif_bytes_roundtrip(tmp_path):
    from PIL import Image

    b = build_exif_bytes({"make": "T", "model": "M", "iso": 320,
                          "exposure_time": (1, 60), "f_number": (4, 1)})
    img = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
    f = tmp_path / "e.jpg"
    img.save(f, exif=b)
    ex = Image.open(f).getexif()
    assert ex[271] == "T"
    sub = dict(ex.get_ifd(0x8769))
    et = sub[33434]
    if isinstance(et, tuple):
        et = et[0] / et[1]
    assert sub[34855] == 320 and float(et) == pytest.approx(1 / 60)


def test_thumbnail_api(tmp_path):
    """art_tpu.thumbnail: embedded preview or fast develop, bounded size
    (Thumbnail engine role, SURVEY 2.1)."""
    import numpy as np

    import art_tpu
    from art_tpu.io.dngwrite import write_dng

    rng = np.random.default_rng(1)
    mos = rng.integers(200, 16000, size=(96, 144)).astype(np.uint16)
    p = tmp_path / "t.dng"
    write_dng(str(p), mos, pattern="RGGB", black=0.0, white=16383)
    th = art_tpu.thumbnail(str(p), max_px=64)
    assert th.shape[0] == 3
    assert max(th.shape[1:]) <= 64
    assert float(th.max()) <= 1.0 and float(th.min()) >= 0.0
