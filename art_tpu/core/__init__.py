"""Core device-side primitives: image layout, padding, LUT application.

Image convention (ARCHITECTURE.md): RGB images are `(3, H, W)` float32 in
the 0..65535 domain; CFA mosaics are `(H, W)` float32 with a static pattern
descriptor. The reference's `Imagefloat`/`array2D` containers
(`rtengine/iimage.h`, `array2D.h`) collapse to bare jnp arrays here.
"""

from art_tpu.core.image import (  # noqa: F401
    MAXVAL,
    pad_to_multiple,
    unpad,
    bayer_channel_masks,
)
from art_tpu.core.lut import apply_lut, apply_lut01  # noqa: F401
