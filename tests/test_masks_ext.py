"""External/linked masks (masks.cc:922-1035, 806-906) and gamut warning
(gamutwarning.cc)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from art_tpu.masks import (MaskSpec, build_mask_registry, eval_mask,
                           plan_mask)

WS = np.asarray(
    [[0.4124, 0.3576, 0.1805],
     [0.2126, 0.7152, 0.0722],
     [0.0193, 0.1192, 0.9505]], np.float32)
MAXVAL = 65535.0


def _rgb(h=40, w=64, v=0.4):
    return jnp.full((3, h, w), v * MAXVAL, jnp.float32)


def test_external_mask_file(tmp_path):
    from PIL import Image

    mfile = tmp_path / "m.png"
    a = np.zeros((20, 32), np.uint8)
    a[:, 16:] = 255
    Image.fromarray(a, "L").save(mfile)

    m = MaskSpec(external_enabled=True, external_filename=str(mfile))
    static, data = plan_mask(m, (40, 64))
    out = np.asarray(eval_mask(_rgb(), jnp.asarray(WS), static,
                               {k: jnp.asarray(v) if isinstance(v, np.ndarray)
                                else v for k, v in data.items()}))
    assert out[:, :20].mean() < 0.05
    assert out[:, 44:].mean() > 0.95


def test_external_mask_inverted_and_feather(tmp_path):
    from PIL import Image

    mfile = tmp_path / "m.png"
    a = np.zeros((20, 32), np.uint8)
    a[:, 16:] = 255
    Image.fromarray(a, "L").save(mfile)

    m = MaskSpec(external_enabled=True, external_filename=str(mfile),
                 external_inverted=True, external_feather=50.0)
    static, data = plan_mask(m, (40, 64))
    assert static[11] > 0  # feather radius engaged
    out = np.asarray(eval_mask(_rgb(), jnp.asarray(WS), static,
                               {k: jnp.asarray(v) if isinstance(v, np.ndarray)
                                else v for k, v in data.items()}))
    assert out[:, :10].mean() > 0.9   # inverted: left now selected
    assert out[:, 54:].mean() < 0.1


def test_linked_mask_resolves_from_other_tool():
    from art_tpu.params import ProcParams

    pp = ProcParams()
    # a named area mask registered under the smoothing tool
    pp.extra["Smoothing"] = {
        "Enabled": "true",
        "MaskEnabled_1": "true",
        "MaskName_1": "MyArea",
        "AreaMaskEnabled_1": "true",
        "AreaMask0Type_1": "rectangle",
        "AreaMask0X_1": "-50", "AreaMask0Y_1": "0",
        "AreaMask0Width_1": "50", "AreaMask0Height_1": "100",
        "AreaMask0StrengthStart_1": "100", "AreaMask0StrengthEnd_1": "100",
    }
    reg = build_mask_registry(pp)
    assert ("smoothing", "MyArea") in reg

    m = MaskSpec(linked_enabled=True, linked_toolname="smoothing",
                 linked_name="MyArea")
    static, data = plan_mask(m, (40, 64), pp)
    assert static[12] is not None
    out = np.asarray(eval_mask(_rgb(), jnp.asarray(WS), static,
                               {k: jnp.asarray(v) if isinstance(v, np.ndarray)
                                else v for k, v in data.items()}))
    # left half selected by the linked area mask
    assert out[:, :20].mean() > 0.6
    assert out[:, 44:].mean() < 0.4


def test_linked_mask_keyfile_parse():
    from art_tpu.params.keyfile import KeyFile

    kf = KeyFile()
    kf.groups["G"] = {
        "LinkedMaskEnabled_1": "true",
        "LinkedMask_1": "smoothing|Foo",
        "ExternalMaskEnabled_1": "true",
        "ExternalMaskFilename_1": "file:///tmp/x%20y.png",
        "ExternalMaskFeather_1": "25",
    }
    m = MaskSpec.from_keyfile(kf, "G", "_1")
    assert m.linked_enabled and m.linked_toolname == "smoothing"
    assert m.linked_name == "Foo"
    assert m.external_enabled
    assert m.external_filename == "/tmp/x y.png"
    assert m.external_feather == 25.0
    assert not m.is_trivial()


def test_gamut_warning_matrix_path():
    from art_tpu.color import colorspaces as cs
    from art_tpu.color.gamutwarning import gamut_warning_mask, mark_gamut

    # saturated Rec2020 green is outside sRGB; grey is inside
    rgb = np.zeros((3, 4, 8), np.float32)
    rgb[:, :, :4] = 0.5                      # grey: in gamut
    rgb[1, :, 4:] = 1.0                      # pure wide-gamut green
    mask = np.asarray(gamut_warning_mask(
        jnp.asarray(rgb * MAXVAL), "Rec2020",
        cs.xyz_to_rgb_matrix("sRGB")))
    assert not mask[:, :4].any()
    assert mask[:, 4:].all()

    marked = np.asarray(mark_gamut(jnp.asarray(rgb), jnp.asarray(mask)))
    assert np.allclose(marked[:, 0, 6], [0.0, 1.0, 1.0])  # cyan
    assert np.allclose(marked[:, 0, 1], rgb[:, 0, 1])     # untouched
