"""LUT-class (A2B/B2A) ICC profiles: parse + device evaluation.

Reference behavior: iccstore.cc:224-366 loads any profile class through
lcms2; here synthetic lut16 (mft2) and v4 lutAtoB/lutBtoA (mAB/mBA)
profiles with known closed-form transforms are parsed by color.iccfile
and evaluated by color.icclut, and a B2A output profile drives the
develop pipeline end-to-end.
"""

import struct

import numpy as np
import pytest

from art_tpu.color import colorspaces as cs
from art_tpu.color.iccfile import parse_icc_bytes
from art_tpu.color.icclut import apply_stages, plan_lut

XYZ_SCALE = 32768.0 / 65535.0


def _assemble(tags, pcs=b"XYZ "):
    table = struct.pack(">I", len(tags))
    off = 128 + 4 + 12 * len(tags)
    body = b""
    for sig, data in tags:
        pad = (-len(data)) % 4
        table += sig + struct.pack(">II", off + len(body), len(data))
        body += data + b"\0" * pad
    hdr = bytearray(128)
    hdr[16:20] = b"RGB "
    hdr[20:24] = pcs
    hdr[36:40] = b"acsp"
    hdr[8] = 4
    struct.pack_into(">I", hdr, 0, 128 + len(table) + len(body))
    return bytes(hdr) + table + body


def _u16_tab(vals):
    return b"".join(struct.pack(">H", int(round(np.clip(v, 0, 1) * 65535)))
                    for v in vals)


def _mft2(matrix, in_curves, clut, out_curves):
    """lut16 tag bytes. in/out_curves: 3 arrays on [0,1]; clut (g,g,g,3)."""
    g = clut.shape[0]
    out = b"mft2" + b"\0" * 4 + bytes([3, 3, g, 0])
    for r in range(3):
        for c in range(3):
            out += struct.pack(">i", int(round(matrix[r][c] * 65536)))
    out += struct.pack(">HH", len(in_curves[0]), len(out_curves[0]))
    for t in in_curves:
        out += _u16_tab(t)
    out += _u16_tab(clut.reshape(-1))
    for t in out_curves:
        out += _u16_tab(t)
    return out


def _curv(samples=None):
    if samples is None:  # identity
        return b"curv" + b"\0" * 4 + struct.pack(">I", 0)
    return (b"curv" + b"\0" * 4 + struct.pack(">I", len(samples))
            + _u16_tab(samples))


def _mabba(is_ab, a_curves=None, clut=None, m_curves=None, matrix34=None,
           b_curves=None):
    """mAB/mBA tag bytes; curves = None -> identity 'curv' entries."""
    def curves_blob(curves):
        blob = b""
        for i in range(3):
            c = _curv(None if curves is None else curves[i])
            blob += c + b"\0" * ((-len(c)) % 4)
        return blob

    hdr = (b"mAB " if is_ab else b"mBA ") + b"\0" * 4 + bytes([3, 3, 0, 0])
    offs = {}
    body = b""
    pos = 32  # header (12) + 5 offsets (20)

    def put(key, blob):
        nonlocal body, pos
        offs[key] = pos
        body += blob
        pos += len(blob)

    put("b", curves_blob(b_curves))
    if matrix34 is not None:
        m = matrix34
        blob = b"".join(struct.pack(">i", int(round(v * 65536)))
                        for v in [m[0][0], m[0][1], m[0][2],
                                  m[1][0], m[1][1], m[1][2],
                                  m[2][0], m[2][1], m[2][2],
                                  m[0][3], m[1][3], m[2][3]])
        put("m", blob)
    put("mc", curves_blob(m_curves))
    if clut is not None:
        g = clut.shape[0]
        blob = bytes([g, g, g] + [0] * 13) + bytes([2, 0, 0, 0])
        blob += _u16_tab(clut.reshape(-1))
        put("cl", blob)
    put("a", curves_blob(a_curves))
    return hdr + struct.pack(">5I", offs["b"], offs.get("m", 0),
                             offs["mc"], offs.get("cl", 0),
                             offs["a"]) + body


def _grid(g):
    """(g,g,g,3) of lattice coordinates in [0,1] (r = axis 0)."""
    ax = np.linspace(0.0, 1.0, g)
    r, gg, b = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([r, gg, b], axis=-1)


def _eval(prof_bytes, direction, x):
    """Parse + plan + run on (3, N) values; returns (3, N) np array."""
    prof = parse_icc_bytes(prof_bytes)
    assert prof["kind"] == "lut"
    lut = prof["a2b"] if direction == "in" else prof["b2a"]
    stages, data = plan_lut(lut, prof["pcs"], direction)
    r, g, b = apply_stages(x[0], x[1], x[2], stages, data)
    return np.stack([np.asarray(r), np.asarray(g), np.asarray(b)])


def test_mft2_a2b_xyz():
    """lut16 A2B, XYZ PCS: gamma-2 input curves + matrix baked into the
    CLUT (affine maps interpolate exactly); closed form comparison."""
    M = cs.MATRICES_RGB_TO_XYZ["sRGB"]
    xs = np.linspace(0, 1, 64)
    in_curves = [xs ** 2.0] * 3
    grid = _grid(9)
    clut = np.einsum("ij,abcj->abci", M, grid) * XYZ_SCALE
    tag = _mft2(np.eye(3), in_curves, clut, [xs, xs, xs])
    prof = _assemble([(b"A2B0", tag)])

    rng = np.random.default_rng(0)
    x = rng.uniform(0.05, 0.95, (3, 257)).astype(np.float32)
    got = _eval(prof, "in", x)
    want = M @ (x.astype(np.float64) ** 2.0)
    np.testing.assert_allclose(got, want, atol=4e-3)


def test_mft2_b2a_xyz_matrix():
    """lut16 B2A, XYZ PCS: the 3x3 matrix element applies to encoded XYZ
    before the input tables; CLUT is identity, output curves sqrt."""
    Minv = np.linalg.inv(cs.MATRICES_RGB_TO_XYZ["sRGB"])
    xs = np.linspace(0, 1, 64)
    clut = _grid(5)
    tag = _mft2(Minv / XYZ_SCALE * XYZ_SCALE, [xs] * 3, clut,
                [np.sqrt(xs)] * 3)
    prof = _assemble([(b"B2A0", tag)])

    rng = np.random.default_rng(1)
    # keep matrix output within [0,1]: use near-gray XYZ values
    base = rng.uniform(0.2, 0.7, 257)
    xyz = np.stack([base * cs.D50_WHITE[0], base, base * cs.D50_WHITE[2]])
    got = _eval(prof, "out", xyz.astype(np.float32))
    want = np.sqrt(np.clip(Minv @ (xyz * XYZ_SCALE), 0, 1))
    np.testing.assert_allclose(got, want, atol=4e-3)


def test_mab_a2b_lab():
    """v4 lutAtoB, Lab PCS: A curves (gamma 2) + channel-mix CLUT; the
    encoded output decodes through the v4 Lab encoding to XYZ."""
    mix = np.array([[0.8, 0.2, 0.0],
                    [0.1, 0.8, 0.1],
                    [0.0, 0.3, 0.7]])
    xs = np.linspace(0, 1, 64)
    grid = _grid(9)
    clut = np.einsum("ij,abcj->abci", mix, grid)
    tag = _mabba(True, a_curves=[xs ** 2.0] * 3, clut=clut)
    prof = _assemble([(b"A2B0", tag)], pcs=b"Lab ")

    rng = np.random.default_rng(2)
    x = rng.uniform(0.05, 0.95, (3, 257)).astype(np.float32)
    got = _eval(prof, "in", x)
    enc = mix @ (x.astype(np.float64) ** 2.0)
    want = np.stack(cs.lab_to_xyz(enc[0] * 100.0, enc[1] * 255.0 - 128.0,
                                  enc[2] * 255.0 - 128.0))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_mba_b2a_lab_matrix34():
    """v4 lutBtoA, Lab PCS: B curves -> 3x4 matrix (with offset) -> M
    curves -> CLUT; checks the element order and the affine offset."""
    m34 = [[0.9, 0.05, 0.0, 0.02],
           [0.0, 0.9, 0.05, 0.01],
           [0.05, 0.0, 0.9, 0.0]]
    xs = np.linspace(0, 1, 64)
    clut = _grid(5) ** 1.0  # identity CLUT
    tag = _mabba(False, b_curves=[xs] * 3, matrix34=m34,
                 m_curves=[np.sqrt(xs)] * 3, clut=clut)
    prof = _assemble([(b"B2A0", tag)], pcs=b"Lab ")

    rng = np.random.default_rng(3)
    base = rng.uniform(0.2, 0.8, 257)
    xyz = np.stack([base * cs.D50_WHITE[0], base, base * cs.D50_WHITE[2]])
    got = _eval(prof, "out", xyz.astype(np.float32))

    L, a, b = cs.xyz_to_lab(xyz[0], xyz[1], xyz[2])
    enc = np.stack([L / 100.0, (a + 128.0) / 255.0, (b + 128.0) / 255.0])
    m = np.asarray(m34)
    lin = m[:, :3] @ enc + m[:, 3:4]
    want = np.sqrt(np.clip(lin, 0, 1))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_legacy_lab_encoding_roundtrip():
    """mft2 Lab PCS uses the legacy v2 encoding (L: 0..100 -> 0..0xFF00):
    an identity A2B must reproduce Lab->XYZ of its own input."""
    xs = np.linspace(0, 1, 64)
    tag = _mft2(np.eye(3), [xs] * 3, _grid(5), [xs] * 3)
    prof = _assemble([(b"A2B0", tag)], pcs=b"Lab ")
    x = np.stack([np.linspace(0.1, 0.9, 65)] * 3).astype(np.float32)
    got = _eval(prof, "in", x)
    L = x[0] * (65535.0 / 652.8)
    a = x[1] * (65535.0 / 256.0) - 128.0
    b = x[2] * (65535.0 / 256.0) - 128.0
    want = np.stack(cs.lab_to_xyz(L.astype(np.float64), a, b))
    np.testing.assert_allclose(got, want, atol=4e-3)


def test_develop_with_b2a_output_profile(tmp_path):
    """End-to-end: a B2A output .icc implementing XYZ -> sRGB-gamma sRGB
    matches the named sRGB output profile develop within LUT interp
    tolerance (iccstore.cc output profile role)."""
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    Minv = np.linalg.inv(cs.MATRICES_RGB_TO_XYZ["sRGB"])
    # realistic profile structure: sqrt shaper input curves put CLUT
    # resolution near black (identity shapers make the first cells span
    # wildly clipped corners — real B2A tables shape for the same reason)
    xs = np.linspace(0, 1, 1024)
    t = _grid(33)  # CLUT index space = sqrt of encoded XYZ
    xyz = (t ** 2) / XYZ_SCALE
    lin = np.clip(np.einsum("ij,abcj->abci", Minv, xyz), 0.0, 1.0)
    srgb_curve = np.asarray(cs.srgb_gamma(xs, np))
    tag = _mft2(np.eye(3), [np.sqrt(xs)] * 3, lin, [srgb_curve] * 3)
    path = tmp_path / "b2a_srgb.icc"
    path.write_bytes(_assemble([(b"B2A0", tag)]))

    h, w = 64, 96
    rng = np.random.default_rng(4)
    rgb = rng.uniform(0.05, 0.8, (3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")

    pp = ProcParams()
    ref = np.asarray(process_image(frame, pp))
    pp2 = ProcParams()
    pp2.icm.output_profile = str(path)
    got = np.asarray(process_image(frame, pp2))
    assert got.shape == ref.shape
    # distribution bounds: CLUT quantization (33^3 + shaper) matches the
    # named sRGB path closely in-gamut; out-of-gamut cells hold
    # clip(affine) which tetra-interp approximates (lcms B2A LUTs show
    # the same boundary quantization)
    d = np.abs(got - ref)
    assert float(d.mean()) < 0.01
    assert float(np.quantile(d, 0.99)) < 0.05
    interior = ((ref > 0.05) & (ref < 0.95)).all(axis=0)
    assert interior.mean() > 0.5
    assert float(d[:, interior].max()) < 0.08


def test_develop_with_a2b_input_profile(tmp_path):
    """End-to-end: an A2B input .icc equal to linear-sRGB device->XYZ
    matches the matrix-shaper equivalent within tolerance."""
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    M = cs.MATRICES_RGB_TO_XYZ["sRGB"]
    xs = np.linspace(0, 1, 64)
    clut = np.einsum("ij,abcj->abci", M, _grid(9)) * XYZ_SCALE
    tag = _mft2(np.eye(3), [xs] * 3, clut, [xs] * 3)
    path = tmp_path / "a2b_cam.icc"
    path.write_bytes(_assemble([(b"A2B0", tag)]))

    h, w = 64, 96
    rng = np.random.default_rng(5)
    rgb = rng.uniform(0.05, 0.8, (3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")

    pp = ProcParams()
    pp.icm.input_profile = str(path)
    out = np.asarray(process_image(frame, pp))
    assert out.shape[0] == 3
    assert np.isfinite(out).all()
    assert float(out.mean()) > 0.01


def test_lut_profile_description_and_kind():
    xs = np.linspace(0, 1, 64)
    tag = _mft2(np.eye(3), [xs] * 3, _grid(5), [xs] * 3)
    prof = parse_icc_bytes(_assemble([(b"A2B0", tag)]))
    assert prof["kind"] == "lut"
    assert prof["pcs"] == "XYZ"
    assert prof["a2b"] is not None and prof["b2a"] is None
