"""DCP camera profile tests (synthetic .dcp built in-test)."""

import struct

import numpy as np
import pytest

from art_tpu.color.dcp import load_dcp
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import develop


def _write_dcp(path, color_matrix, forward_matrix=None, illum=21,
               hsm=None, hsm_dims=None, tone_curve=None):
    """Minimal little-endian TIFF with DNG profile tags."""
    entries = []
    extra = bytearray()

    def add(tag, typ, count, payload):
        entries.append((tag, typ, count, payload))

    def srational_list(vals):
        return b"".join(struct.pack("<ii", int(round(v * 1000000)), 1000000)
                        for v in vals)

    add(50721, 10, 9, srational_list(np.asarray(color_matrix).ravel()))
    add(50778, 3, 1, struct.pack("<H", illum))
    if forward_matrix is not None:
        add(50964, 10, 9, srational_list(np.asarray(forward_matrix).ravel()))
    if hsm is not None:
        hd, sd, vd = hsm_dims
        add(50937, 4, 3, struct.pack("<3I", hd, sd, vd))
        add(50938, 11, hsm.size, np.asarray(hsm, "<f4").tobytes())
    if tone_curve is not None:
        tc = np.asarray(tone_curve, "<f4").ravel()
        add(50940, 11, tc.size, tc.tobytes())

    entries.sort()
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    blobs = bytearray()
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            field = payload + b"\0" * (4 - len(payload))
        else:
            field = struct.pack("<I", data_off + len(blobs))
            blobs += payload
        out += struct.pack("<HHI", tag, typ, count) + field
    out += struct.pack("<I", 0)
    out += blobs
    with open(path, "wb") as f:
        f.write(out)


@pytest.fixture
def flat_frame():
    return synthesize_bayer(np.full((3, 96, 96), 0.4), "RGGB")


def test_load_dcp_roundtrip(tmp_path):
    cm = np.array([[0.7, 0.1, 0.1], [0.2, 0.9, -0.1], [0.0, 0.1, 0.8]])
    fm = np.array([[0.96, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.82]])
    hsm = np.zeros((1, 6, 2, 3), np.float32)
    tc = [[0.0, 0.0], [0.5, 0.6], [1.0, 1.0]]
    p = tmp_path / "t.dcp"
    _write_dcp(p, cm, fm, hsm=hsm, hsm_dims=(6, 2, 1), tone_curve=tc)
    prof = load_dcp(p)
    np.testing.assert_allclose(prof.color_matrix_1, cm, atol=1e-5)
    np.testing.assert_allclose(prof.forward_matrix_1, fm, atol=1e-5)
    assert prof.hsm_dims == (6, 2, 1)
    assert prof.hsm_data_1.shape == (1, 6, 2, 3)
    assert prof.tone_curve.shape == (3, 2)
    assert prof.illuminant_1 == 21


def test_dcp_identity_neutral(tmp_path, flat_frame):
    # identity-ish DCP: cam == sRGB-linear sensor of the synthesizer;
    # a zero HueSatMap and linear tone curve must leave grey grey
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

    cm = np.linalg.inv(MATRICES_RGB_TO_XYZ["sRGB"])  # XYZ -> camera(sRGB)
    hsm = np.zeros((1, 6, 2, 3), np.float32)
    hsm[..., 1] = 1.0  # sat scale
    hsm[..., 2] = 1.0  # val scale
    p = tmp_path / "neutral.dcp"
    _write_dcp(p, cm, hsm=hsm, hsm_dims=(6, 2, 1))
    pp = ProcParams()
    pp.icm.input_profile = str(p)
    out = np.asarray(develop(flat_frame, pp))
    base_pp = ProcParams()
    base = np.asarray(develop(flat_frame, base_pp))
    # grey stays grey and close to the matrix-path render
    mid = out[:, 24:-24, 24:-24]
    assert np.abs(mid[0] - mid[1]).mean() < 0.01
    assert np.abs(np.asarray(base)[:, 24:-24, 24:-24].mean()
                  - mid.mean()) < 0.05


def test_dcp_hsm_shifts_saturation(tmp_path, flat_frame):
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

    cm = np.linalg.inv(MATRICES_RGB_TO_XYZ["sRGB"])
    hsm = np.zeros((1, 6, 2, 3), np.float32)
    hsm[..., 1] = 0.0  # sat scale 0 => fully desaturate
    hsm[..., 2] = 1.0
    p = tmp_path / "desat.dcp"
    _write_dcp(p, cm, hsm=hsm, hsm_dims=(6, 2, 1))
    rgb = np.full((3, 96, 96), 0.3)
    rgb[0] = 0.5  # reddish
    frame = synthesize_bayer(rgb, "RGGB")
    pp = ProcParams()
    pp.icm.input_profile = str(p)
    pp.icm.working_profile = "sRGB"
    out = np.asarray(develop(frame, pp))
    mid = out[:, 24:-24, 24:-24]
    chroma = np.abs(mid[0] - mid[1]).mean() + np.abs(mid[2] - mid[1]).mean()
    base = ProcParams()
    base.icm.working_profile = "sRGB"
    outb = np.asarray(develop(frame, base))
    midb = outb[:, 24:-24, 24:-24]
    chroma_b = (np.abs(midb[0] - midb[1]).mean()
                + np.abs(midb[2] - midb[1]).mean())
    assert chroma < 0.25 * chroma_b, (chroma, chroma_b)


def test_dcp_tone_curve_applies(tmp_path, flat_frame):
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

    cm = np.linalg.inv(MATRICES_RGB_TO_XYZ["sRGB"])
    tc = [[0.0, 0.0], [0.25, 0.4], [0.5, 0.65], [0.75, 0.85], [1.0, 1.0]]
    p = tmp_path / "tc.dcp"
    _write_dcp(p, cm, tone_curve=tc)
    pp = ProcParams()
    pp.icm.input_profile = str(p)
    # the reference gates the DCP curve on icm.toneCurve (default false,
    # procparams.cc:2615)
    pp.icm.tone_curve = True
    out = np.asarray(develop(flat_frame, pp))
    base = np.asarray(develop(flat_frame, ProcParams()))
    assert out[:, 24:-24, 24:-24].mean() > base[:, 24:-24, 24:-24].mean() \
        + 0.03

    # and with the flag off (the default), the curve must NOT apply
    pp_off = ProcParams()
    pp_off.icm.input_profile = str(p)
    out_off = np.asarray(develop(flat_frame, pp_off))
    assert abs(out_off[:, 24:-24, 24:-24].mean()
               - base[:, 24:-24, 24:-24].mean()) < 0.01


def test_dcp_look_position_after_exposure(tmp_path, flat_frame):
    """DCP step-2 runs inside the op chain (improcfun.cc:614-620), so a
    STAGE_1 exposure edit is applied BEFORE the DCP tone curve. With a
    saturating curve, +1EV before the curve yields < 2x output; the old
    (wrong) order — curve at colorspace conversion — would give exactly
    2x."""
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ

    cm = np.linalg.inv(MATRICES_RGB_TO_XYZ["sRGB"])
    # hard shoulder: saturates quickly
    tc = [[0.0, 0.0], [0.2, 0.7], [0.4, 0.9], [1.0, 1.0]]
    p = tmp_path / "shoulder.dcp"
    _write_dcp(p, cm, tone_curve=tc)

    def render(expcomp):
        pp = ProcParams()
        pp.icm.input_profile = str(p)
        pp.icm.tone_curve = True
        pp.icm.output_profile = "linear"  # keep output TRC linear-ish
        if expcomp:
            pp.exposure.enabled = True
            pp.exposure.expcomp = expcomp
        return np.asarray(develop(flat_frame, pp))[:, 24:-24, 24:-24]

    base = render(0.0)
    plus1 = render(1.0)
    ratio = plus1.mean() / base.mean()
    # curve-after-exposure compresses the gain well below 2x
    assert ratio < 1.7, ratio
    assert ratio > 1.0, ratio


def test_dcp_look_early_flag_positions_step(tmp_path, flat_frame):
    """DCPLookEarly moves step-2 to the head of STAGE_2
    (improcfun.cc:590-592)."""
    from art_tpu.color.colorspaces import MATRICES_RGB_TO_XYZ
    from art_tpu.pipeline.develop import plan

    cm = np.linalg.inv(MATRICES_RGB_TO_XYZ["sRGB"])
    tc = [[0.0, 0.0], [0.5, 0.6], [1.0, 1.0]]
    p = tmp_path / "tc2.dcp"
    _write_dcp(p, cm, tone_curve=tc)
    pp = ProcParams()
    pp.icm.input_profile = str(p)
    pp.icm.tone_curve = True
    config, data = plan(flat_frame, pp)
    names = [s[0] for s in config.steps]
    assert "dcplook_late" in names and "dcplook_early" not in names
    assert "op:dcplook_late" in data
    pp.icm.dcp_look_early = True
    config2, _ = plan(flat_frame, pp)
    names2 = [s[0] for s in config2.steps]
    assert "dcplook_early" in names2 and "dcplook_late" not in names2
    # stage tags match the reference stages
    st = {s[0]: s[2] for s in config2.steps}
    assert st["dcplook_early"] == 2
