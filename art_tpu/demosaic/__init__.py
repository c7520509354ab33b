"""Demosaic kernels (reference: SURVEY §2.3, dispatch rawimagesource.cc:1854).

Each algorithm is a pure function `(cfa, pattern) -> (3, H, W)` operating on
the scaled mosaic (0..65535 domain). Dispatch mirrors the reference's method
strings (procparams.cc:3013: amaze, rcd, lmmse, igv, amazebilinear,
rcdbilinear, vng4, fast, mono, pixelshift, none).
"""

from __future__ import annotations


def demosaic(cfa, pattern, method="amaze", xp=None, xtrans=None, **kwargs):
    from art_tpu.demosaic import bilinear

    if xtrans is not None:
        from art_tpu.demosaic.xtrans import demosaic_xtrans

        return demosaic_xtrans(cfa, xtrans, method, **kwargs)
    method = method.lower()
    if method in ("bilinear",):
        return bilinear.bayer_bilinear(cfa, pattern)
    if method == "fast":
        return bilinear.bayer_bilinear(cfa, pattern)
    if method in ("mono", "none"):
        import jax.numpy as jnp

        return jnp.stack([cfa, cfa, cfa])
    from art_tpu.demosaic import registry

    fn = registry.get(method)
    if fn is None:
        return bilinear.bayer_bilinear(cfa, pattern)
    return fn(cfa, pattern, **kwargs)
