"""Host-side image encode/decode: PNG/JPEG/TIFF.

Reference: ``rtengine/imageio.{h,cc}`` (libpng/libjpeg/libtiff wrappers) and
``stdimagesource.cc`` (non-raw sources). Host-side by design — encode must
overlap device compute, never sit on it (SURVEY §7 hard parts).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from art_tpu.core.image import MAXVAL


def save_image(path, rgb_encoded01, bits=8, quality=92, icc_bytes=None,
               exif_bytes=None, exif_tags=None, uncompressed=False,
               xmp_bytes=None, iptc_iim=None):
    """Save an encoded (post-TRC) RGB image in [0,1], shape (3, H, W).

    Output matrix per the reference (imageio.h:90-96, main-cli.cc:878-887):
    JPEG 8-bit; PNG 8/16-bit; TIFF 8/16-bit uint or 32-bit float, deflate
    unless ``uncompressed``. ``xmp_bytes``/``iptc_iim`` carry the XMP
    packet and IPTC-IIM record stream into the container (APP1/APP13 for
    JPEG, iTXt for PNG, tags 700/33723 for TIFF — metadata.cc saveToImage
    role)."""
    arr = np.asarray(rgb_encoded01)
    assert arr.ndim == 3 and arr.shape[0] == 3
    import os

    d = os.path.dirname(str(path))
    if d:
        os.makedirs(d, exist_ok=True)
    chw = np.clip(arr, 0.0, 1.0)
    hwc = np.moveaxis(chw, 0, -1)
    path = str(path)
    lower = path.lower()
    if lower.endswith(".tif") or lower.endswith(".tiff"):
        from art_tpu.io.tiffwrite import write_tiff

        write_tiff(path, chw, bits=bits, compress=not uncompressed,
                   icc_bytes=icc_bytes, exif_tags=exif_tags,
                   xmp_bytes=xmp_bytes, iptc_iim=iptc_iim)
        return
    if bits == 16 and lower.endswith(".png"):
        # PIL PNG 16-bit is single channel only; use opencv for RGB48
        import cv2

        data = (hwc * 65535.0 + 0.5).astype(np.uint16)
        cv2.imwrite(path, cv2.cvtColor(data, cv2.COLOR_RGB2BGR))
        return
    data = (hwc * 255.0 + 0.5).astype(np.uint8)
    img = Image.fromarray(data, mode="RGB")
    kwargs = {}
    if lower.endswith(".jpg") or lower.endswith(".jpeg"):
        kwargs.update(quality=quality, subsampling=0)
    if icc_bytes:
        kwargs.update(icc_profile=icc_bytes)
    if exif_bytes:
        kwargs.update(exif=exif_bytes)
    if lower.endswith(".png") and xmp_bytes:
        from PIL.PngImagePlugin import PngInfo

        info = PngInfo()
        info.add_itxt("XML:com.adobe.xmp", xmp_bytes.decode("utf-8"),
                      zip=False)
        kwargs.update(pnginfo=info)
    img.save(path, **kwargs)
    if (lower.endswith(".jpg") or lower.endswith(".jpeg")) and \
            (xmp_bytes or iptc_iim):
        from art_tpu.io.xmp import insert_jpeg_segments

        insert_jpeg_segments(path, xmp_bytes=xmp_bytes, iptc_iim=iptc_iim)


def load_std_image(path):
    """Load a non-raw image as a RawFrame with rgb payload.

    StdImageSource semantics (stdimagesource.cc): honor the embedded ICC
    profile when present (converted to sRGB via littleCMS before the
    pipeline's sRGB linearization), support 8/16-bit PNG/TIFF depths,
    fall back to an sRGB assumption otherwise. External loaders
    registered through io.iomanager are consulted for unknown formats.
    """
    from art_tpu.color import colorspaces as cs
    from art_tpu.io.rawfile import RawFrame

    try:
        img = Image.open(path)
    except OSError:
        from art_tpu.io.iomanager import get_instance

        conv = get_instance().load_image(path)
        if conv is None:
            raise
        img = Image.open(conv)

    icc = img.info.get("icc_profile")
    if icc:
        try:
            import io as _io

            from PIL import ImageCms

            src = ImageCms.ImageCmsProfile(_io.BytesIO(icc))
            dst = ImageCms.createProfile("sRGB")
            img = ImageCms.profileToProfile(img.convert("RGB"), src, dst)
        except Exception:
            pass

    if img.mode in ("I;16", "I;16B", "I;16L", "I"):
        arr = np.asarray(img, dtype=np.float32) / 65535.0
        arr = np.stack([arr] * 3, axis=-1)
    else:
        arr16 = np.asarray(img)
        if arr16.dtype == np.uint16:
            arr = arr16.astype(np.float32) / 65535.0
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            arr = arr[..., :3]
        else:
            img = img.convert("RGB")
            arr = np.asarray(img, dtype=np.float32) / 255.0
    linear = cs.srgb_igamma(arr, np)
    chw = np.moveaxis(linear, -1, 0) * MAXVAL
    return RawFrame(
        cfa=np.zeros((1, 1), np.float32),
        pattern=None,
        rgb=np.ascontiguousarray(chw).astype(np.float32),
        filename=str(path),
    )
