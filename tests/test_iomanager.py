"""External loader/preconverter hook (reference rtengine/imgiomanager.cc)."""

import os
import stat
import sys

import numpy as np

from art_tpu.io import iomanager


def test_raw_preconverter_roundtrip(tmp_path, monkeypatch):
    """A configured ReadCommand converts an unknown raw to DNG which then
    decodes through the normal native path (cached by mtime)."""
    from art_tpu.io.dngwrite import write_dng
    from art_tpu.io.rawfile import load_raw

    # "converter": a python script that writes a known DNG
    iodir = tmp_path / "imageio"
    iodir.mkdir()
    conv = tmp_path / "conv.py"
    rng = np.random.default_rng(0)
    mosaic = rng.integers(600, 12000, size=(32, 48)).astype(np.uint16)
    np.save(str(tmp_path / "mosaic.npy"), mosaic)
    conv.write_text(f"""\
import sys
sys.path.insert(0, {repr(os.getcwd())})
import numpy as np
from art_tpu.io.dngwrite import write_dng
mosaic = np.load({repr(str(tmp_path / 'mosaic.npy'))})
write_dng(sys.argv[2], mosaic, black=512, white=16383)
""")
    (iodir / "myraw.txt").write_text(
        "[ART RAWImageIO]\n"
        f"Extension=xyz\nReadCommand={sys.executable} {conv}\n")
    fake = tmp_path / "shot.xyz"
    fake.write_bytes(b"not-a-real-raw")

    mgr = iomanager.IOManager(dirs=[str(iodir)])
    monkeypatch.setattr(iomanager, "_instance", mgr)
    try:
        fr = load_raw(str(fake))
        np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
        assert fr.filename == str(fake)
        # cache hit: second call reuses the converted file
        out1 = mgr.preconvert_raw(str(fake))
        out2 = mgr.preconvert_raw(str(fake))
        assert out1 == out2 and os.path.isfile(out1)
    finally:
        iomanager.reset()


def test_iomanager_config_parse(tmp_path):
    iodir = tmp_path / "imageio"
    iodir.mkdir()
    (iodir / "exr.txt").write_text(
        "[ART ImageIO]\nExtension=exr\nReadCommand=exr2tiff\n"
        "WriteCommand=tiff2exr\nLabel=OpenEXR\n")
    mgr = iomanager.IOManager(dirs=[str(iodir)])
    assert "exr" in mgr.loaders
    assert "exr" in mgr.savers


def test_shipped_pnm_preconverter(tmp_path, monkeypatch):
    """The SHIPPED example converter (tools/preconverters/pnm_to_dng.py)
    carries a 16-bit PGM mosaic into the native pipeline end-to-end."""
    from art_tpu.io.rawfile import load_raw

    rng = np.random.default_rng(1)
    mosaic = rng.integers(100, 15000, size=(24, 40)).astype(np.uint16)
    pgm = tmp_path / "frame.pgm"
    pgm.write_bytes(b"P5\n40 24\n65535\n"
                    + mosaic.astype(">u2").tobytes())

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "preconverters",
        "pnm_to_dng.py")
    iodir = tmp_path / "imageio"
    iodir.mkdir()
    (iodir / "pnm.txt").write_text(
        "[ART RAWImageIO]\n"
        f"Extension=pgm\nReadCommand={sys.executable} {script}\n")
    mgr = iomanager.IOManager(dirs=[str(iodir)])
    monkeypatch.setattr(iomanager, "_instance", mgr)
    try:
        fr = load_raw(str(pgm))
        np.testing.assert_array_equal(fr.cfa, mosaic.astype(np.float32))
        assert fr.pattern == "RGGB"
    finally:
        iomanager.reset()
