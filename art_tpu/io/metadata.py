"""Metadata: EXIF harvest from TIFF/DNG containers, EXIF emission for
outputs, embedded JPEG preview extraction.

Reference: ART tunnels metadata with exiv2 (rtengine/metadata.cc;
MetaDataParams modes tunnel/edit/strip, procparams.h:1560). Here a small
pure-Python TIFF IFD walker harvests the standard tags and previews, and
a minimal EXIF TIFF blob is built for PIL's `exif=` save parameter.
"""

from __future__ import annotations

import struct

# tag -> (name, kind) for the tags we tunnel
_IFD0_TAGS = {
    271: "make", 272: "model", 274: "orientation", 306: "datetime",
    305: "software", 315: "artist", 33432: "copyright",
}
_EXIF_TAGS = {
    33434: "exposure_time", 33437: "f_number", 34855: "iso",
    36867: "datetime_original", 37386: "focal_length",
    42036: "lens_model", 42035: "lens_make", 37500: None,  # skip makernote
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(buf, off, le):
    e = "<" if le else ">"
    if off + 2 > len(buf):
        return {}, 0
    n = struct.unpack_from(e + "H", buf, off)[0]
    entries = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(buf):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", buf, p)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            data_off = p + 8
        else:
            data_off = struct.unpack_from(e + "I", buf, p + 8)[0]
        entries[tag] = (typ, cnt, data_off)
    nxt = struct.unpack_from(e + "I", buf, off + 2 + 12 * n)[0] \
        if off + 2 + 12 * n + 4 <= len(buf) else 0
    return entries, nxt


def _value(buf, typ, cnt, off, le):
    e = "<" if le else ">"
    try:
        if typ == 2:
            raw = buf[off : off + cnt]
            return raw.split(b"\0")[0].decode("ascii", "replace")
        if typ == 3:
            v = struct.unpack_from(e + f"{cnt}H", buf, off)
        elif typ == 4:
            v = struct.unpack_from(e + f"{cnt}I", buf, off)
        elif typ == 5:
            parts = struct.unpack_from(e + f"{2 * cnt}I", buf, off)
            v = tuple((parts[2 * i], parts[2 * i + 1]) for i in range(cnt))
        elif typ == 10:
            parts = struct.unpack_from(e + f"{2 * cnt}i", buf, off)
            v = tuple((parts[2 * i], parts[2 * i + 1]) for i in range(cnt))
        else:
            return None
        return v[0] if cnt == 1 else v
    except struct.error:
        return None


def harvest(path):
    """Parse a TIFF-container raw (DNG etc.): returns (tags dict,
    preview list [(offset, length)])."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 8 or buf[:2] not in (b"II", b"MM"):
        return {}, []
    le = buf[:2] == b"II"
    e = "<" if le else ">"
    off = struct.unpack_from(e + "I", buf, 4)[0]
    tags = {}
    previews = []
    seen = set()
    queue = [off]
    while queue:
        o = queue.pop()
        if o in seen or o == 0:
            continue
        seen.add(o)
        ents, nxt = _read_ifd(buf, o, le)
        if nxt:
            queue.append(nxt)
        for tag, (typ, cnt, doff) in ents.items():
            if tag in _IFD0_TAGS and _IFD0_TAGS[tag]:
                v = _value(buf, typ, cnt, doff, le)
                if v is not None:
                    tags.setdefault(_IFD0_TAGS[tag], v)
            elif tag in _EXIF_TAGS and _EXIF_TAGS[tag]:
                v = _value(buf, typ, cnt, doff, le)
                if v is not None:
                    tags.setdefault(_EXIF_TAGS[tag], v)
            elif tag in (34665, 330):  # EXIF IFD / SubIFDs
                v = _value(buf, typ, cnt, doff, le)
                for sub in ([v] if isinstance(v, int) else list(v or [])):
                    queue.append(sub)
        # JPEG preview (JPEGInterchangeFormat + length)
        if 513 in ents and 514 in ents:
            po = _value(buf, *ents[513][:2], ents[513][2], le)
            pl = _value(buf, *ents[514][:2], ents[514][2], le)
            if isinstance(po, int) and isinstance(pl, int):
                previews.append((po, pl))
        # new-style preview: strips in a reduced-resolution JPEG IFD
        if (ents.get(254) and _value(buf, *ents[254][:2], ents[254][2], le)
                == 1 and ents.get(259)
                and _value(buf, *ents[259][:2], ents[259][2], le) in (6, 7)
                and 273 in ents and 279 in ents):
            so = _value(buf, *ents[273][:2], ents[273][2], le)
            sl = _value(buf, *ents[279][:2], ents[279][2], le)
            if isinstance(so, int) and isinstance(sl, int):
                previews.append((so, sl))
    return tags, previews


def _decode_jpeg_resilient(blob):
    """Decode a (possibly truncated or marker-damaged) JPEG preview.

    The reference bundles a patched IJG libjpeg whose sole purpose is
    resilient thumbnail decode (rtengine/jpeg_ijg, rtjpeg.cc: error
    handlers that keep partial scans instead of aborting). Equivalent
    here: a strict PIL pass first, then a salvage pass with truncated-
    image tolerance that keeps whatever scanlines decoded."""
    import io as _io

    from PIL import Image, ImageFile

    try:
        return Image.open(_io.BytesIO(blob)).convert("RGB")
    except Exception:
        pass
    prev = ImageFile.LOAD_TRUNCATED_IMAGES
    ImageFile.LOAD_TRUNCATED_IMAGES = True
    try:
        img = Image.open(_io.BytesIO(blob))
        img.load()
        return img.convert("RGB")
    except Exception:
        return None
    finally:
        ImageFile.LOAD_TRUNCATED_IMAGES = prev


def embedded_thumb(path):
    """Largest embedded JPEG preview as (3, H, W) float [0,1], or None."""
    try:
        _, previews = harvest(path)
    except OSError:
        return None
    best = None
    for off, length in previews:
        with open(path, "rb") as f:
            f.seek(off)
            blob = f.read(length)
            # preview tables sometimes under-report the byte count
            # (rtthumbnail.cc quick-load tolerates this); extend to the
            # EOI marker when the claimed span ends mid-stream
            if blob.startswith(b"\xff\xd8") and b"\xff\xd9" not in blob:
                blob += f.read(32 * 1024 * 1024)
        if not blob.startswith(b"\xff\xd8"):
            continue
        import numpy as np

        img = _decode_jpeg_resilient(blob)
        if img is None:
            continue
        arr = np.moveaxis(np.asarray(img, dtype=np.float32) / 255.0, -1, 0)
        if best is None or arr.size > best.size:
            best = arr
    return best


def _rat(v, default=(0, 1)):
    if isinstance(v, tuple) and len(v) == 2 and isinstance(v[0], int):
        return v
    if isinstance(v, (int, float)):
        return (int(v * 1000), 1000)
    return default


def build_exif_bytes(tags, software="art-tpu 0.1"):
    """EXIF payload for PIL save(exif=...) built via PIL's Exif object."""
    from PIL import Image

    ex = Image.Exif()
    ifd0 = {271: "make", 272: "model", 274: "orientation", 306: "datetime",
            315: "artist", 33432: "copyright", 270: "image_description",
            18246: "rating"}
    for tag, key in ifd0.items():
        if tags.get(key) is not None:
            ex[tag] = tags[key]
    ex[305] = software
    sub = ex.get_ifd(0x8769)
    subtags = {33434: "exposure_time", 33437: "f_number", 34855: "iso",
               36867: "datetime_original", 37386: "focal_length",
               42036: "lens_model"}
    for tag, key in subtags.items():
        v = tags.get(key)
        if v is None:
            continue
        if tag == 34855 and isinstance(v, tuple):
            v = v[0]
        sub[tag] = v
    return ex.tobytes()
