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
               xmp_bytes=None, iptc_iim=None, subsampling=3):
    """Save an encoded (post-TRC) RGB image in [0,1], shape (3, H, W).

    Output matrix per the reference (imageio.h:90-96, main-cli.cc:878-887):
    JPEG 8-bit; PNG 8/16-bit; TIFF 8/16-bit uint or 32-bit float, deflate
    unless ``uncompressed``. ``xmp_bytes``/``iptc_iim`` carry the XMP
    packet and IPTC-IIM record stream into the container (APP1/APP13 for
    JPEG, iTXt for PNG, tags 700/33723 for TIFF — metadata.cc saveToImage
    role)."""
    arr = np.asarray(rgb_encoded01)
    assert arr.ndim == 3
    if arr.dtype == np.uint8:
        # device-converted 8-bit output (PipelineConfig.out_u8): already
        # clipped/scaled, planar (3,H,W) or interleaved (H,W,3)
        assert bits == 8, "uint8 planes require bits=8"
        if arr.shape[0] == 3 and arr.shape[2] != 3:
            arr = np.moveaxis(arr, 0, -1)
    else:
        assert arr.shape[0] == 3
    import os

    d = os.path.dirname(str(path))
    if d:
        os.makedirs(d, exist_ok=True)
    path = str(path)
    lower = path.lower()
    if lower.endswith(".tif") or lower.endswith(".tiff"):
        from art_tpu.io.tiffwrite import write_tiff

        if arr.dtype == np.uint8:  # HWC u8 after the normalization above
            arr = np.moveaxis(arr, -1, 0).astype(np.float32) / 255.0
        write_tiff(path, np.clip(arr, 0.0, 1.0), bits=bits,
                   compress=not uncompressed,
                   icc_bytes=icc_bytes, exif_tags=exif_tags,
                   xmp_bytes=xmp_bytes, iptc_iim=iptc_iim)
        return
    if bits == 16 and lower.endswith(".png"):
        # PIL PNG 16-bit is single channel only; use opencv for RGB48
        import cv2

        hwc = np.moveaxis(np.clip(arr, 0.0, 1.0), 0, -1)
        data16 = (hwc * 65535.0 + 0.5).astype(np.uint16)
        cv2.imwrite(path, cv2.cvtColor(data16, cv2.COLOR_RGB2BGR))
        return
    # 8-bit conversion on the contiguous CHW float (the strided HWC
    # multiply costs ~4x on the host), then a byte-level transpose;
    # device-converted uint8 output arrives HWC and skips both
    if arr.dtype == np.uint8:
        data = arr
    else:
        u8 = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        data = np.ascontiguousarray(np.moveaxis(u8, 0, -1))
    if lower.endswith(".jpg") or lower.endswith(".jpeg"):
        # fast path: libjpeg-turbo via cv2 (~0.2s/24MP vs PIL ~3s on a
        # 1-core host), EXIF/ICC inserted as raw APP1/APP2 segments —
        # the encode throughput caps the batch queue (simpleprocess's
        # saveAsJPEG role)
        try:
            import cv2

            from art_tpu.io.xmp import insert_jpeg_app_segments

            sampling = {1: cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,
                        2: cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422,
                        3: cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444}[
                            int(subsampling or 3)]
            ok = cv2.imwrite(path, cv2.cvtColor(data, cv2.COLOR_RGB2BGR),
                             [cv2.IMWRITE_JPEG_QUALITY, int(quality),
                              cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sampling])
            if ok:
                insert_jpeg_app_segments(path, exif_bytes=exif_bytes,
                                         icc_bytes=icc_bytes)
                if xmp_bytes or iptc_iim:
                    from art_tpu.io.xmp import insert_jpeg_segments

                    insert_jpeg_segments(path, xmp_bytes=xmp_bytes,
                                         iptc_iim=iptc_iim)
                return
        except Exception:
            pass  # fall back to the PIL encoder below
    img = Image.fromarray(data, mode="RGB")
    kwargs = {}
    if lower.endswith(".jpg") or lower.endswith(".jpeg"):
        # ART-cli -js<1-3>: 1 = best compression (4:2:0), 2 = 4:2:2,
        # 3 = best quality (4:4:4) — main-cli.cc JPEG subsampling switch
        pil_sub = {1: 2, 2: 1, 3: 0}.get(int(subsampling or 3), 0)
        kwargs.update(quality=quality, subsampling=pil_sub)
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
