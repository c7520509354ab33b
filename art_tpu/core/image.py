"""Image layout helpers: pad-to-tile, CFA masks.

The reference handles arbitrary H×W directly; XLA wants static,
tile-friendly shapes. The planner pads every image up to a multiple of the
tile edge (reflect padding keeps stencil ops well-behaved at the seam) and
the final crop restores the true size. CFA-pattern logic that the reference
does with per-pixel `FC(row,col)` lookups (`dcraw.h` fc()) becomes static
2x2 / 6x6 boolean masks broadcast over the plane.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAXVAL = 65535.0

BAYER_PATTERNS = ("RGGB", "BGGR", "GRBG", "GBRG")


def pad_to_multiple(arr, multiple: int, axes=(-2, -1), mode="reflect"):
    """Pad trailing spatial axes up to a multiple; returns (padded, orig_shape).

    Works on numpy arrays (host, before device put) — padding on host avoids
    a device reshape and keeps the jit signature static.
    """
    shape = arr.shape
    pads = [(0, 0)] * arr.ndim
    for ax in axes:
        ax = ax % arr.ndim
        n = shape[ax]
        target = ((n + multiple - 1) // multiple) * multiple
        pads[ax] = (0, target - n)
    if all(p == (0, 0) for p in pads):
        return arr, shape
    return np.pad(arr, pads, mode=mode), shape


def unpad(arr, orig_shape, axes=(-2, -1)):
    """Crop padded axes back to the original size (host or device)."""
    slices = [slice(None)] * arr.ndim
    for ax in axes:
        ax = ax % arr.ndim
        slices[ax] = slice(0, orig_shape[ax])
    return arr[tuple(slices)]


def bayer_channel_masks(pattern: str, shape, xp=jnp):
    """Boolean masks (R, G, B) of shape `shape` for a Bayer pattern string.

    `pattern` gives the colors of the 2x2 tile at (0,0): e.g. "RGGB" means
    (0,0)=R (0,1)=G (1,0)=G (1,1)=B. Replaces the reference's FC() lookups.
    """
    assert pattern in BAYER_PATTERNS, pattern
    h, w = shape
    if xp is not np:
        # build from iota on device: host-numpy masks bake into the
        # program as full-size constants (94MB each at 24MP)
        import jax

        rp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % 2
        cp = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % 2
        idx2d = rp * 2 + cp
        out = []
        for color in "RGB":
            m = None
            for pos, c in enumerate(pattern):
                if c == color:
                    e = idx2d == pos
                    m = e if m is None else (m | e)
            out.append(m)
        return tuple(out)
    rows = np.arange(h) % 2
    cols = np.arange(w) % 2
    idx2 = rows[:, None] * 2 + cols[None, :]  # 0..3 position in the 2x2 tile
    masks = []
    for color in "RGB":
        m = np.zeros((h, w), dtype=bool)
        for pos, c in enumerate(pattern):
            if c == color:
                m |= idx2 == pos
        masks.append(xp.asarray(m))
    return tuple(masks)


def bayer_color_index(pattern: str, shape):
    """Int array (H, W) with 0=R 1=G 2=B per CFA site (host numpy)."""
    h, w = shape
    rows = np.arange(h) % 2
    cols = np.arange(w) % 2
    idx2 = rows[:, None] * 2 + cols[None, :]
    lut = np.array(["RGB".index(c) for c in pattern], dtype=np.int32)
    return lut[idx2]


def xtrans_color_index(pattern6x6, shape):
    """Int array (H, W) 0/1/2 for an X-Trans 6x6 pattern (host numpy)."""
    pat = np.asarray(pattern6x6, dtype=np.int32).reshape(6, 6)
    h, w = shape
    return pat[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]


def xtrans_color_index_device(pattern, shape, dy=0, dx=0):
    """Device-side 6x6 pattern lookup from iota coordinates.

    Host-numpy masks at 24MP become 94MB program CONSTANTS (an X-Trans
    program with ~17 of them serializes past the 2GB executable limit);
    this builds the same color-index plane with in-graph selects.
    """
    import jax
    import jax.numpy as jnp

    h, w = shape
    pat = np.asarray(pattern, dtype=np.int64).reshape(6, 6)
    ry = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + dy) % 6
    cx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + dx) % 6
    out = jnp.zeros((h, w), jnp.int32)
    for i in range(6):
        for j in range(6):
            v = int(pat[i, j])
            if v:
                out = jnp.where((ry == i) & (cx == j), v, out)
    return out


# -- stride-2 subgrid access as exact selection matmuls ---------------------
# Every relayout lowering of a stride-2 Bayer subsample (strided slice,
# reshape-view index, transpose, one-hot einsum) costs 30-75ms at 24MP
# on v5e (measured r5); a one-hot selection matmul at precision=
# "highest" runs in ~7ms and is bit-exact: each output element sums
# exactly one f32 product by 1.0.

def _sel2_mats(h, w, r0, c0, dtype):
    pr = (jnp.arange(0, h, 2)[:, None] + r0
          == jnp.arange(h)[None, :]).astype(dtype)
    pc = (jnp.arange(w)[:, None]
          == jnp.arange(0, w, 2)[None, :] + c0).astype(dtype)
    return pr, pc


def subgrid2(x, r0, c0):
    """x[(r0::2, c0::2)] as an exact MXU extraction: (H, W) -> (H/2, W/2)."""
    h, w = x.shape
    pr, pc = _sel2_mats(h, w, r0, c0, x.dtype)
    return jnp.dot(jnp.dot(pr, x, precision="highest"), pc,
                   precision="highest")


def subgrid2_scatter(sub, shape, r0, c0):
    """Inverse of subgrid2: place `sub` at the (r0, c0) stride-2 sites
    of a zero (H, W) plane (exact)."""
    h, w = shape
    pr, pc = _sel2_mats(h, w, r0, c0, sub.dtype)
    return jnp.dot(jnp.dot(pr.T, sub, precision="highest"), pc.T,
                   precision="highest")


def subsample_mm(x, step_y, step_x):
    """x[::step_y, ::step_x] as an exact selection matmul (the strided
    slice lowers to a 30-75ms relayout at 24MP; see subgrid2)."""
    if step_y == 1 and step_x == 1:
        return x
    h, w = x.shape
    ny = -(-h // step_y)
    nx = -(-w // step_x)
    pr = (jnp.arange(ny)[:, None] * step_y
          == jnp.arange(h)[None, :]).astype(x.dtype)
    pc = (jnp.arange(w)[:, None]
          == jnp.arange(nx)[None, :] * step_x).astype(x.dtype)
    return jnp.dot(jnp.dot(pr, x, precision="highest"), pc,
                   precision="highest")
