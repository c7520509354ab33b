"""DNG GainMap opcode tests."""

import numpy as np

from art_tpu.io import dngwrite
from art_tpu.io.gainmap import (build_gain_plane, parse_gain_maps,
                                read_opcodelist2)
from art_tpu.io.rawfile import load_raw, synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop


def _vignetted_dng(tmp_path, h=128, w=128):
    frame = synthesize_bayer(np.full((3, h, w), 0.4), "RGGB")
    yy, xx = np.mgrid[0:h, 0:w]
    vign = 1.0 - 0.4 * (((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
                        / (h * h / 4 + w * w / 4))
    cfa_v = 512.0 + (np.asarray(frame.cfa) - 512.0) * vign
    gy, gx = np.mgrid[0:9, 0:9]
    py = gy * (h - 1) / 8.0
    px = gx * (w - 1) / 8.0
    gv = 1.0 / (1.0 - 0.4 * (((py - h / 2) ** 2 + (px - w / 2) ** 2)
                             / (h * h / 4 + w * w / 4)))
    maps = [{"gains": gv.astype(np.float32), "top": t, "left": lft,
             "bottom": h, "right": w}
            for t, lft in ((0, 0), (0, 1), (1, 0), (1, 1))]
    path = tmp_path / "gm.dng"
    dngwrite.write_dng(path, cfa_v.astype(np.uint16), pattern="RGGB",
                       black=512, white=16383, gain_maps=maps)
    return path


def test_parse_roundtrip(tmp_path):
    path = _vignetted_dng(tmp_path)
    maps = parse_gain_maps(read_opcodelist2(path))
    assert len(maps) == 4
    assert maps[0]["points_v"] == 9 and maps[0]["row_pitch"] == 2
    plane = build_gain_plane(maps, (128, 128))
    assert plane is not None
    assert plane[64, 64] < plane[2, 2]  # corners gain more


def test_gainmap_flattens_vignette(tmp_path):
    path = _vignetted_dng(tmp_path)
    fr = load_raw(path)
    pp = ProcParams()
    pp.icm.working_profile = "sRGB"
    out_v = np.asarray(develop(fr, pp))
    pp.raw.ff_enabled = True
    pp.raw.ff_embedded = True
    out_gm = np.asarray(develop(fr, pp))

    def fall(a):
        return float(a[:, 56:72, 56:72].mean() - a[:, 8:20, 8:20].mean())

    assert fall(out_v) > 0.04
    assert abs(fall(out_gm)) < 0.3 * fall(out_v)


def test_unsupported_layout_rejected():
    maps = [{"plane": 0, "planes": 1, "map_planes": 1, "row_pitch": 3,
             "col_pitch": 2, "origin_v": 0, "origin_h": 0,
             "gains": np.ones((3, 3), np.float32), "points_v": 3,
             "points_h": 3, "top": 0, "left": 0, "bottom": 10,
             "right": 10}] * 4
    assert build_gain_plane(maps, (10, 10)) is None
