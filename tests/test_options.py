"""App-level Options tier (reference rtgui/options.{h,cc} KeyFile)."""

import numpy as np

from art_tpu.options import Options, load_options
from art_tpu.params.keyfile import KeyFile


def test_options_keyfile_roundtrip(tmp_path):
    o = Options()
    o.format = "png"
    o.jpeg_quality = 80
    o.tiff_bits = 32
    o.def_prof_raw = "My Default"
    o.dark_frames_path = "/data/darks"
    o.cluts_directory = "/data/cluts"
    o.parse_extensions = ("dng", "nef")
    p = tmp_path / "options"
    o.save(p)
    o2 = Options.from_keyfile(KeyFile.load(p))
    assert o2.format == "png" and o2.jpeg_quality == 80
    assert o2.tiff_bits == 32
    assert o2.def_prof_raw == "My Default"
    assert o2.dark_frames_path == "/data/darks"
    assert o2.parse_extensions == ("dng", "nef")


def test_options_reference_keys_and_settings(tmp_path):
    """An ART-format options file loads with the reference group/key
    names and forwards engine fields into Settings
    (Options::readFromFile -> rtSettings)."""
    (tmp_path / "options").write_text(
        "[General]\nVerbose=false\nDarkFramesPath=/d/darks\n"
        "FlatFieldsPath=/d/flats\n"
        "[Profiles]\nRawDefault=Auto-Matched Curve\nImgDefault=Neutral\n"
        "[Output]\nFormat=tif\nTiffBps=32\nTiffFloat=true\n"
        "[Color Management]\nClutsDirectory=/d/cluts\n"
        "[Fast Export]\nfastexport_resize_width=800\n"
        "fastexport_resize_height=600\n"
    )

    class FakeSettings:
        verbose = False
        dark_frames_dir = None
        flat_fields_dir = None
        cluts_dir = None
        lensfun_db_dir = None

    s = FakeSettings()
    o = load_options(str(tmp_path / "options"), settings=s)
    assert o.format == "tif" and o.tiff_bits == 32 and o.tiff_float
    assert o.def_prof_raw == "Auto-Matched Curve"
    assert o.fast_export_resize_width == 800
    assert s.dark_frames_dir == "/d/darks"
    assert s.flat_fields_dir == "/d/flats"
    assert s.cluts_dir == "/d/cluts"
    # restore the module cache to defaults for other tests
    load_options(path="/nonexistent/options", settings=FakeSettings())


def test_cli_output_format_from_options(tmp_path, monkeypatch):
    """With no format flag, the CLI default comes from Output/Format
    (main-cli falls back to options.saveFormat)."""
    from art_tpu.cli import main as cli_main
    from art_tpu.io.dngwrite import write_dng

    cfg = tmp_path / "cfg"
    cfg.mkdir()
    (cfg / "options").write_text("[Output]\nFormat=png\nPngBps=16\n")
    monkeypatch.setenv("ART_TPU_CONFIG_DIR", str(cfg))

    rng = np.random.default_rng(7)
    m = (rng.uniform(0.05, 0.9, (32, 48)) * 16000 + 500).astype(np.uint16)
    raw = tmp_path / "x.dng"
    write_dng(raw, m, black=500, white=16500)
    rc = cli_main(["-o", str(tmp_path), "-Y", "-c", str(raw)])
    assert rc == 0
    out = tmp_path / "x.png"
    assert out.exists()
    import cv2

    img = cv2.imread(str(out), cv2.IMREAD_UNCHANGED)
    # PngBps=16 from the options tier (RGB48 PNG)
    assert img.dtype == np.uint16
    # defaults restored for later tests
    from art_tpu.options import load_options as _lo

    monkeypatch.delenv("ART_TPU_CONFIG_DIR")
    _lo(path="/nonexistent/options")


def test_cli_fast_export_bounds_resize(tmp_path, monkeypatch):
    """-q force-enables resize bounded by the Options fast-export
    dimensions (fastexport.cc adjust_fast_params)."""
    from art_tpu.cli import _adjust_fast_params, compose_params
    from art_tpu.options import load_options as _lo

    cfg = tmp_path / "cfg"
    cfg.mkdir()
    (cfg / "options").write_text(
        "[Fast Export]\nfastexport_resize_width=640\n"
        "fastexport_resize_height=480\n")
    _lo(path=str(cfg / "options"))
    from art_tpu.params import ProcParams

    pp = ProcParams()
    assert not pp.resize.enabled
    _adjust_fast_params(pp)
    assert pp.resize.enabled
    assert pp.resize.width == 640 and pp.resize.height == 480
    pp2 = ProcParams()
    pp2.resize.enabled = True
    pp2.resize.width = 320
    pp2.resize.height = 9999
    _adjust_fast_params(pp2)
    assert pp2.resize.width == 320 and pp2.resize.height == 480
    _lo(path="/nonexistent/options")
