"""3D LUTs: Hald CLUT / .cube loading + tetrahedral interpolation.

Reference: ``rtengine/clutstore.cc`` (Hald CLUT PNG cache),
``rtengine/LUT3D.cc`` (tetrahedral apply). Host loaders produce an
(n, n, n, 3) float32 table (indexed [r][g][b]); the device applies
tetrahedral interpolation with gathers over the flattened table.

NOTE TPU perf: XLA lowers large-table gathers slowly (~200ms/plane at
24MP); a Pallas VMEM-resident kernel is the planned optimization for the
film-sim hot path.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def load_hald_clut(path):
    """Hald CLUT image -> (n, n, n, 3) table, level n = cbrt(pixels).

    Layout (clutstore semantics): pixel index p encodes r fastest, then g,
    then b: p = r + n*g + n*n*b, with values stored row-major in the image.
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    npix = arr.shape[0] * arr.shape[1]
    n = round(npix ** (1.0 / 3.0))
    if n * n * n != npix:
        raise ValueError(f"not a Hald CLUT: {path}")
    flat = arr.reshape(-1, 3)
    # p = r + n*g + n*n*b  ->  table[b][g][r]; we want [r][g][b]
    table = flat.reshape(n, n, n, 3)  # [b][g][r]
    return np.ascontiguousarray(np.transpose(table, (2, 1, 0, 3)))


def load_cube(path):
    """.cube parser (Adobe/Resolve format) -> (n, n, n, 3) table."""
    size = None
    data = []
    dmin = np.zeros(3)
    dmax = np.ones(3)
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0].upper()
            if key == "LUT_3D_SIZE":
                size = int(parts[1])
            elif key == "DOMAIN_MIN":
                dmin = np.array([float(v) for v in parts[1:4]])
            elif key == "DOMAIN_MAX":
                dmax = np.array([float(v) for v in parts[1:4]])
            elif key in ("TITLE", "LUT_1D_SIZE", "LUT_3D_INPUT_RANGE"):
                continue
            else:
                try:
                    data.append([float(v) for v in parts[:3]])
                except ValueError:
                    continue
    if size is None or len(data) < size ** 3:
        raise ValueError(f"invalid .cube file: {path}")
    arr = np.asarray(data[: size ** 3], dtype=np.float32)
    # cube order: r fastest -> [b][g][r]; transpose to [r][g][b]
    table = arr.reshape(size, size, size, 3)
    return np.ascontiguousarray(np.transpose(table, (2, 1, 0, 3))), dmin, dmax


def load_lut3d(path):
    ext = os.path.splitext(str(path))[1].lower()
    if ext == ".cube":
        table, _, _ = load_cube(path)
        return table
    return load_hald_clut(path)


def _gather_flat(flat_c, idx):
    """Fast-path gather: keep the index array rank 2 (TPU lowering)."""
    shape = idx.shape
    out = jnp.take(flat_c, idx.reshape(-1, shape[-1]), axis=0)
    return out.reshape(shape)


def apply_tetrahedral(r, g, b, table):
    """Tetrahedral 3D LUT interpolation (LUT3D.cc apply_tetra).

    r/g/b in [0,1], table (n,n,n,3) jnp array. Returns (r', g', b').
    """
    n = table.shape[0]
    dm1 = n - 1.0

    # cell-packed layout: the 8 corners of each lattice cell sit in ONE
    # row, so a single row-gather fetches them all — 8x fewer gather ops
    # than per-corner takes (XLA TPU gathers are per-row serial; measured
    # 1094 -> ~190 ms for a 33^3 LUT at 24MP)
    m = n - 1
    corners = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                corners.append(table[i : i + m, j : j + m, k : k + m, :])
    cells = jnp.stack(corners, axis=3).reshape(m * m * m, 24)

    shape = r.shape
    rr = jnp.clip(r, 0.0, 1.0).reshape(-1) * dm1
    gg = jnp.clip(g, 0.0, 1.0).reshape(-1) * dm1
    bb = jnp.clip(b, 0.0, 1.0).reshape(-1) * dm1

    r0 = jnp.minimum(jnp.floor(rr), dm1 - 1).astype(jnp.int32)
    g0 = jnp.minimum(jnp.floor(gg), dm1 - 1).astype(jnp.int32)
    b0 = jnp.minimum(jnp.floor(bb), dm1 - 1).astype(jnp.int32)
    fr = rr - r0
    fg = gg - g0
    fb = bb - b0

    cell = (r0 * m + g0) * m + b0
    fetched = jnp.take(cells, cell.reshape(-1, 1), axis=0).reshape(-1, 8, 3)

    def at(i, j, k):
        return fetched[:, (i << 2) | (j << 1) | k, :]

    c000 = at(0, 0, 0)
    c111 = at(1, 1, 1)

    # tetrahedron selection by ordering of (fr, fg, fb)
    m = jnp.stack([fr, fg, fb], axis=-1)

    # six cases; compute all six and select (branchless)
    def tet(c0, cA, cB, c1, f0, fA, fB):
        return (c0 * (1.0 - f0)[:, None] + cA * (f0 - fA)[:, None]
                + cB * (fA - fB)[:, None] + c1 * fB[:, None])

    c100 = at(1, 0, 0)
    c110 = at(1, 1, 0)
    c010 = at(0, 1, 0)
    c011 = at(0, 1, 1)
    c001 = at(0, 0, 1)
    c101 = at(1, 0, 1)

    t1 = tet(c000, c100, c110, c111, fr, fg, fb)  # r>=g>=b
    t2 = tet(c000, c100, c101, c111, fr, fb, fg)  # r>=b>=g
    t3 = tet(c000, c001, c101, c111, fb, fr, fg)  # b>r>=g
    t4 = tet(c000, c001, c011, c111, fb, fg, fr)  # b>g>r
    t5 = tet(c000, c010, c011, c111, fg, fb, fr)  # g>=b, b>r ... g>b>=r
    t6 = tet(c000, c010, c110, c111, fg, fr, fb)  # g>r, r>=b

    rge_g = fr >= fg
    gge_b = fg >= fb
    rge_b = fr >= fb
    out = jnp.where((rge_g & gge_b)[:, None], t1,
          jnp.where((rge_g & ~gge_b & rge_b)[:, None], t2,
          jnp.where((rge_g & ~gge_b & ~rge_b)[:, None], t3,
          jnp.where((~rge_g & ~gge_b)[:, None], t4,
          jnp.where((~rge_g & gge_b & ~rge_b)[:, None], t5, t6)))))
    out = out.reshape(shape + (3,))
    return out[..., 0], out[..., 1], out[..., 2]
