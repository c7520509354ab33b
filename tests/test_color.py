"""Color space math tests against analytic goldens."""

import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.iccstore import get_instance


def test_matrix_inverses():
    for name in cs.WORKING_SPACES:
        m = cs.rgb_to_xyz_matrix(name)
        mi = cs.xyz_to_rgb_matrix(name)
        np.testing.assert_allclose(m @ mi, np.eye(3), atol=1e-6)


def test_white_maps_to_d50():
    # D50-adapted matrices: RGB (1,1,1) -> D50 white point
    for name in ("sRGB", "Rec2020", "ProPhoto"):
        m = cs.rgb_to_xyz_matrix(name)
        white = m @ np.ones(3)
        np.testing.assert_allclose(white, cs.D50_WHITE, atol=2e-3)


def test_srgb_gamma_roundtrip():
    x = np.linspace(0, 1, 1001)
    np.testing.assert_allclose(cs.srgb_igamma(cs.srgb_gamma(x)), x, atol=1e-6)
    # known anchor: 0.5 linear -> ~0.7354 encoded
    assert np.isclose(cs.srgb_gamma(np.array(0.5)), 0.73536, atol=1e-4)


def test_lab_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0.01, 0.9, size=(3, 100))
    L, a, b = cs.xyz_to_lab(*xyz)
    back = cs.lab_to_xyz(L, a, b)
    np.testing.assert_allclose(back, xyz, atol=1e-6)
    # white -> L=100, a=b=0
    L, a, b = cs.xyz_to_lab(*cs.D50_WHITE)
    assert np.isclose(L, 100.0, atol=1e-6)
    assert np.isclose(a, 0.0, atol=1e-6)
    assert np.isclose(b, 0.0, atol=1e-6)


def test_delta_e2000_known_pairs():
    # Sharma et al. CIEDE2000 test data (pair 1 and pair 24)
    de = cs.delta_e2000((50.0, 2.6772, -79.7751), (50.0, 0.0, -82.7485))
    assert np.isclose(de, 2.0425, atol=1e-3)
    de = cs.delta_e2000((50.0, 2.5, 0.0), (56.0, -27.0, -3.0))
    assert np.isclose(de, 31.9030, atol=1e-3)


def test_iccstore_working_space_is_linear():
    store = get_instance()
    ws = store.working_space("Rec2020")
    assert ws.trc == ("linear", None)
    out = store.output_profile("sRGB")
    assert out.trc[0] == "srgb"


def test_working_space_conversion_roundtrip():
    m = cs.working_space_matrix("sRGB", "Rec2020")
    mi = cs.working_space_matrix("Rec2020", "sRGB")
    np.testing.assert_allclose(m @ mi, np.eye(3), atol=1e-6)


def test_generated_icc_profiles_parse():
    import io

    from PIL import ImageCms

    from art_tpu.color.iccwrite import make_icc

    for name in ("sRGB", "Adobe RGB", "ProPhoto", "Rec2020"):
        b = make_icc(name)
        prof = ImageCms.ImageCmsProfile(io.BytesIO(b))
        assert name in ImageCms.getProfileDescription(prof)


def test_output_jpeg_embeds_icc(tmp_path):
    import numpy as np
    from PIL import Image

    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import process_image

    frame = synthesize_bayer(np.full((3, 64, 64), 0.4))
    pp = ProcParams()
    pp.icm.output_profile = "RTv4_sRGB"
    out = tmp_path / "icc.jpg"
    process_image(frame, pp, output_path=str(out))
    img = Image.open(out)
    assert img.info.get("icc_profile")
