"""Metadata-embedded lens corrections (lensexif.cc ExifLensCorrection)."""

import struct

import numpy as np
import pytest

from art_tpu.lens import exifcorr


def test_sony_coefficients():
    """SonyCorrectionData::get_coeffs (lensexif.cc:63): fixed-point
    scales and the empirical vignette transfer."""
    nc = 4
    dist = [nc, 16384, 0, -16384, 8192]
    ca = [2 * nc, 2097152, 0, 0, 0, -2097152, 0, 0, 0]
    vig = [nc, 8192, 0, 0, 8192]
    corr = exifcorr.from_sony(dist, ca, vig)
    assert corr is not None and corr.kind == "spline"
    assert np.allclose(corr.knots, [0, 1 / 3, 2 / 3, 1])
    assert np.allclose(corr.dist, [2.0, 1.0, 0.0, 1.5])
    assert np.allclose(corr.ca[0], [2.0, 1.0, 1.0, 1.0])
    assert np.allclose(corr.ca[1], 1.0)
    assert np.allclose(corr.ca[2], [0.0, 1.0, 1.0, 1.0])
    # vig = 2^(0.5 - 2^(0.7*v*2^-13 - 1)): v=8192 -> 2^(0.5 - 2^-0.3)
    expect = 2.0 ** (0.5 - 2.0 ** (0.7 - 1.0))
    assert np.allclose(corr.vig[[0, 3]], expect)
    assert np.allclose(corr.vig[[1, 2]], 1.0)  # v=0 -> 2^(0.5-2^-1) = 1


def test_sony_rejects_inconsistent_counts():
    assert exifcorr.from_sony([4, 1, 2, 3, 4], [4, 1, 2, 3, 4],
                              [4, 1, 2, 3, 4]) is None  # ca must be 2n
    assert exifcorr.from_sony([17] + [0] * 17, [34] + [0] * 34,
                              [17] + [0] * 17) is None  # nc > 16


def test_fuji_coefficients():
    """FujiCorrectionData::get_coeffs (lensexif.cc:104): shared knots,
    /100 distortion, +1 CA, crop-mode knot rescale."""
    knots = np.linspace(0.0, 1.0, 9)
    geo = [9, *knots, *np.full(9, 5.0)]
    ca = [9, *knots, *np.full(9, 0.25), *np.full(9, -0.25), 0.0]
    vig = [9, *knots, *np.full(9, 80.0)]
    corr = exifcorr.from_fuji(geo, ca, vig)
    assert corr is not None
    assert np.allclose(corr.knots, knots)
    assert np.allclose(corr.dist, 1.05)
    assert np.allclose(corr.ca[0], 1.25)
    assert np.allclose(corr.ca[2], 0.75)
    assert np.allclose(corr.vig, 0.8)
    crop = exifcorr.from_fuji(geo, ca, vig, crop_mode=2)
    assert np.allclose(crop.knots, 1.25 * knots)
    # mismatched knots between tables -> rejected (lensexif.cc:458)
    bad = [9, *(knots + 0.01), *np.full(9, 5.0)]
    assert exifcorr.from_fuji(bad, ca, vig) is None


def test_olympus_polynomial_sampling():
    """OlympusCorrectionData (lensexif.cc:255): polynomial evaluated at
    16 knots; dist = drs*(1 + (r*drs)^2*(k2 + ...))."""
    dk2, dk4, dk6, drs = 0.02, -0.01, 0.001, 0.98
    corr = exifcorr.from_olympus([dk2, dk4, dk6, drs],
                                 [0.001, 0.0, 0.0, -0.001, 0.0, 0.0])
    assert corr is not None
    r = np.arange(16) / 15.0
    rs2 = (r * drs) ** 2
    expect = drs * (1 + rs2 * (dk2 + rs2 * (dk4 + rs2 * dk6)))
    assert np.allclose(corr.dist, expect, atol=1e-6)
    assert np.allclose(corr.ca[0], 1.001, atol=1e-6)
    assert np.allclose(corr.ca[2], 0.999, atol=1e-6)
    assert not corr.has_vign
    # all-zero distortion -> no data (has_dist gate, lensexif.cc:321)
    assert exifcorr.from_olympus([0, 0, 0, 1.0]) is None


def _dng_opcodelist3(warp, cx_d, cy_d, vig, cx_v, cy_v):
    out = struct.pack(">I", 2)
    body = struct.pack(">I", 1) + struct.pack(">6d", *warp) \
        + struct.pack(">2d", cx_d, cy_d)
    out += struct.pack(">IIII", 1, 1, 0, len(body)) + body
    body = struct.pack(">7d", *vig, cx_v, cy_v)
    out += struct.pack(">IIII", 3, 1, 0, len(body)) + body
    return out


def test_dng_opcodelist3_parse():
    """DNGCorrectionData::parse (lensexif.cc:159)."""
    warp = [1.0, 0.02, -0.003, 0.0004, 1e-5, -1e-5]
    vig = [0.1, -0.02, 0.003, -0.0004, 5e-5]
    buf = _dng_opcodelist3(warp, 0.5, 0.49, vig, 0.51, 0.5)
    corr = exifcorr.parse_dng_opcodes3(buf)
    assert corr is not None and corr.kind == "dng"
    assert np.allclose(corr.warp, warp)
    assert np.allclose(corr.vign_radial, vig)
    assert corr.center_d == (0.5, 0.49)
    assert corr.center_v == (0.51, 0.5)
    assert exifcorr.parse_dng_opcodes3(b"\x00\x00\x00\x00") is None


def _sony_tiff(tmp_path, dist, ca, vig):
    """Minimal little-endian TIFF: IFD0 -> ExifIFD -> Sony makernote
    with the three correction tags (SSHORT arrays)."""
    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + val

    # layout: header(8) ifd0 exififd makernote arrays
    mn_arrays = b"".join(struct.pack(f"<{len(a)}h", *a)
                         for a in (dist, ca, vig))
    ifd0_off = 8
    ifd0_size = 2 + 12 * 1 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 12 * 1 + 4
    mn_off = exif_off + exif_size
    mn_ifd_off = mn_off + 12  # after "SONY DSC \0\0\0"
    mn_ifd_size = 2 + 12 * 3 + 4
    arr_off = mn_ifd_off + mn_ifd_size
    ifd0 = struct.pack("<H", 1) + entry(
        34665, 4, 1, struct.pack("<I", exif_off)) + b"\0" * 4
    exif = struct.pack("<H", 1) + entry(
        37500, 7, 12 + mn_ifd_size + len(mn_arrays),
        struct.pack("<I", mn_off)) + b"\0" * 4
    o1 = arr_off
    o2 = o1 + 2 * len(dist)
    o3 = o2 + 2 * len(ca)
    mn = b"SONY DSC \0\0\0" + struct.pack("<H", 3) \
        + entry(0x2011, 8, len(vig), struct.pack("<I", o3)) \
        + entry(0x2012, 8, len(ca), struct.pack("<I", o2)) \
        + entry(0x2013, 8, len(dist), struct.pack("<I", o1)) \
        + b"\0" * 4
    buf = b"II*\0" + struct.pack("<I", ifd0_off) + ifd0 + exif + mn \
        + mn_arrays
    path = tmp_path / "sony.tif"
    path.write_bytes(buf)
    return str(path)


def test_sony_makernote_walk(tmp_path):
    dist = [4, 16384, 0, -16384, 8192]
    ca = [8, 0, 0, 0, 0, 0, 0, 0, 0]
    vig = [4, 0, 0, 0, 0]
    path = _sony_tiff(tmp_path, dist, ca, vig)
    tags = exifcorr._sony_makernote_tags(path)
    assert tags is not None
    assert list(tags[exifcorr.SONY_TAG_DIST]) == dist
    from art_tpu.io.rawfile import RawFrame

    frame = RawFrame(cfa=np.zeros((4, 4), np.float32), make="SONY",
                     filename=path)
    corr = exifcorr.for_frame(frame)
    assert corr is not None and corr.has_dist and corr.has_vign


def test_for_frame_makernotes_dict():
    from art_tpu.io.rawfile import RawFrame

    frame = RawFrame(cfa=np.zeros((4, 4), np.float32), make="FUJIFILM")
    knots = np.linspace(0.0, 1.0, 9)
    frame.exif["makernotes"] = {
        "GeometricDistortionParams": [9, *knots, *np.full(9, 5.0)],
        "ChromaticAberrationParams": [9, *knots, *np.zeros(9),
                                      *np.zeros(9), 0.0],
        "VignettingParams": [9, *knots, *np.full(9, 100.0)],
    }
    corr = exifcorr.for_frame(frame)
    assert corr is not None and corr.has_dist


@pytest.mark.parametrize("use_vign", [False, True])
def test_exif_corrections_in_pipeline(tmp_path, use_vign):
    """End-to-end: method "exif" bends geometry and flattens vignette
    falloff through the full develop (iptransform + rawimagesource
    integration points)."""
    from art_tpu.io.rawfile import RawFrame, synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import plan, process_image

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.broadcast_to(
        0.3 + 0.2 * np.sin(xx / 5.0) * np.sin(yy / 7.0),
        (3, h, w)).astype(np.float32).copy()
    frame = synthesize_bayer(rgb)
    frame.make = "SONY"
    # barrel-ish distortion + strong corner vignette
    nc = 16
    frame.exif["makernotes"] = {
        "DistortionCorrParams": [nc] + [int(-16384 * (i / 15.0) ** 2 * 0.2)
                                        for i in range(nc)],
        "ChromaticAberrationCorrParams": [2 * nc] + [0] * (2 * nc),
        "VignettingCorrParams": [nc] + [-8192] * nc,
    }
    if use_vign:
        # radial series: sf=1 at center, sf>1 at the corner -> corners
        # divided by sf^2 (darkened) relative to center
        frame.exif["makernotes"]["VignettingCorrParams"] = \
            [nc] + [int(-8192 * (i / 15.0) ** 2) for i in range(nc)]
    pp = ProcParams()
    pp.lens_prof.method = "exif"
    pp.lens_prof.use_dist = not use_vign
    pp.lens_prof.use_ca = False
    pp.lens_prof.use_vign = use_vign
    out = np.asarray(process_image(frame, pp))
    pp0 = ProcParams()
    base = np.asarray(process_image(frame, pp0))
    assert out.shape == base.shape
    if use_vign:
        ratio_corner = (out[:, 2:10, 2:10].mean()
                        / base[:, 2:10, 2:10].mean())
        ratio_center = (out[:, 44:52, 60:68].mean()
                        / base[:, 44:52, 60:68].mean())
        # linear corner gain ~0.80 compresses to ~0.91 through the
        # output sRGB TRC
        assert ratio_corner < ratio_center * 0.95
    else:
        assert np.abs(out.astype(np.float64)
                      - base.astype(np.float64)).max() > 0.05
