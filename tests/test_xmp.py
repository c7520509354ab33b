"""XMP/IPTC metadata layer (reference: rtengine/metadata.{h,cc})."""

import numpy as np
import pytest

from art_tpu.io import xmp as X

SAMPLE_XMP = """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:dc="http://purl.org/dc/elements/1.1/"
    xmlns:xmp="http://ns.adobe.com/xap/1.0/"
    xmlns:photoshop="http://ns.adobe.com/photoshop/1.0/"
    xmp:Rating="4" photoshop:City="Oslo">
   <dc:creator><rdf:Seq><rdf:li>Jane Doe</rdf:li></rdf:Seq></dc:creator>
   <dc:subject><rdf:Bag><rdf:li>alps</rdf:li><rdf:li>snow</rdf:li></rdf:Bag></dc:subject>
   <dc:title><rdf:Alt><rdf:li xml:lang="x-default">Peak</rdf:li></rdf:Alt></dc:title>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
<?xpacket end="w"?>"""


def test_parse_xmp_attributes_and_arrays():
    props = X.parse_xmp(SAMPLE_XMP)
    assert props["Xmp.xmp.Rating"] == "4"
    assert props["Xmp.photoshop.City"] == "Oslo"
    assert props["Xmp.dc.creator"] == ["Jane Doe"]
    assert props["Xmp.dc.subject"] == ["alps", "snow"]
    assert props["Xmp.dc.title"] == ["Peak"]


def test_serialize_roundtrip():
    props = X.parse_xmp(SAMPLE_XMP)
    blob = X.serialize_xmp(props)
    back = X.parse_xmp(blob)
    for k in ("Xmp.xmp.Rating", "Xmp.photoshop.City", "Xmp.dc.subject"):
        assert back[k] == props[k]


def test_sidecar_path_styles():
    assert X.xmp_sidecar_path("/a/b/IMG_1.NEF", "std") == "/a/b/IMG_1.xmp"
    assert X.xmp_sidecar_path("/a/b/IMG_1.NEF", "ext") == "/a/b/IMG_1.NEF.xmp"


def test_sidecar_merge_wins(tmp_path):
    raw = tmp_path / "shot.raf"
    raw.write_bytes(b"")
    (tmp_path / "shot.xmp").write_text(SAMPLE_XMP)
    side = X.read_xmp_sidecar(str(raw), "std")
    merged = X.merge_xmp({"Xmp.xmp.Rating": "1",
                          "Xmp.dc.format": "image/x-raw"}, side)
    assert merged["Xmp.xmp.Rating"] == "4"      # sidecar wins
    assert merged["Xmp.dc.format"] == "image/x-raw"  # base preserved


def test_xmp_exif_overrides():
    props = {"Xmp.xmp.Rating": "5", "Xmp.dc.creator": ["A", "B"],
             "Xmp.dc.rights": "CC-BY"}
    over = X.xmp_exif_overrides(props)
    assert over["rating"] == 5
    assert over["artist"] == "A, B"
    assert over["copyright"] == "CC-BY"


def test_iptc_iim_roundtrip():
    pairs = {
        "Iptc.Application2.Keywords": ["alps", "snow"],
        "Iptc.Application2.City": "Oslo",
        "Iptc.Application2.Byline": ["Jane Doe"],
        "Iptc.Application2.Caption": "Sunrise over the ridge",
    }
    blob = X.build_iptc_iim(pairs)
    assert blob.startswith(b"\x1c\x01\x5a")  # UTF-8 charset marker
    back = X.parse_iptc_iim(blob)
    assert back["Iptc.Application2.Keywords"] == ["alps", "snow"]
    assert back["Iptc.Application2.City"] == ["Oslo"]
    assert back["Iptc.Application2.Caption"] == ["Sunrise over the ridge"]


def test_jpeg_embed_and_readback(tmp_path):
    from PIL import Image

    p = str(tmp_path / "out.jpg")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(p)
    props = {"Xmp.xmp.Rating": "3", "Xmp.dc.subject": ["x", "y"]}
    iim = X.build_iptc_iim({"Iptc.Application2.City": "Oslo"})
    assert X.insert_jpeg_segments(p, X.serialize_xmp(props), iim)
    # still a valid JPEG
    img = Image.open(p)
    img.load()
    xmp_back, iptc_back = X.read_jpeg_segments(p)
    assert xmp_back["Xmp.xmp.Rating"] == "3"
    assert xmp_back["Xmp.dc.subject"] == ["x", "y"]
    assert iptc_back["Iptc.Application2.City"] == ["Oslo"]


def test_procparams_exif_iptc_groups_roundtrip():
    from art_tpu.params import ProcParams

    pp = ProcParams()
    pp.metadata.exif["Exif.Image.Artist"] = "Jane"
    pp.metadata.iptc["Iptc.Application2.Keywords"] = ["a", "b"]
    pp.metadata.notes = "test note"
    text_kf = pp.to_keyfile()
    assert text_kf.get_string("Exif", "Artist") == "Jane"
    assert text_kf.get_string("IPTC", "Keywords") == "a;b;"

    pp2 = ProcParams()
    pp2.update_from_keyfile(text_kf)
    assert pp2.metadata.exif["Exif.Image.Artist"] == "Jane"
    assert pp2.metadata.iptc["Iptc.Application2.Keywords"] == ["a", "b"]
    assert pp2.metadata.notes == "test note"


def test_save_image_jpeg_with_xmp_iptc(tmp_path):
    from art_tpu.io.imagefile import save_image

    rgb = np.random.RandomState(0).rand(3, 32, 48).astype(np.float32)
    p = str(tmp_path / "o.jpg")
    save_image(p, rgb, xmp_bytes=X.serialize_xmp({"Xmp.xmp.Rating": "2"}),
               iptc_iim=X.build_iptc_iim(
                   {"Iptc.Application2.Credit": "art-tpu"}))
    xp, ip = X.read_jpeg_segments(p)
    assert xp["Xmp.xmp.Rating"] == "2"
    assert ip["Iptc.Application2.Credit"] == ["art-tpu"]


def test_tiff_xmp_iptc_tags(tmp_path):
    from art_tpu.io.tiffwrite import write_tiff

    rgb = np.random.RandomState(1).rand(3, 24, 32).astype(np.float32)
    p = str(tmp_path / "o.tif")
    xb = X.serialize_xmp({"Xmp.xmp.Rating": "1"})
    write_tiff(p, rgb, bits=8, xmp_bytes=xb,
               iptc_iim=X.build_iptc_iim({"Iptc.Application2.City": "Rome"}))
    from PIL import Image

    img = Image.open(p)
    assert np.asarray(img).shape == (24, 32, 3)
    t = img.tag_v2
    assert 700 in t
    assert X.parse_xmp(bytes(t[700]))["Xmp.xmp.Rating"] == "1"
    assert 33723 in t
