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

    TPU formulation: the 8 corners of each lattice cell are packed into
    one row so a single row-gather fetches them all (XLA TPU gathers are
    per-row serial: 8x fewer gathers, 1094 -> ~190 ms for 33^3 at 24MP).
    The gather output (P, 24) pads 24 lanes to 128 (5.3x), so pixels are
    processed in lax.map chunks to bound the padded temp (~180MB).
    """
    n = table.shape[0]
    dm1 = n - 1.0
    m = n - 1
    corners = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                corners.append(table[i : i + m, j : j + m, k : k + m, :])
    cells = jnp.stack(corners, axis=3).reshape(m * m * m, 24)

    shape = r.shape
    p = int(np.prod(shape))
    # chunk count: keep each (Pc, 128-padded-24) temp under ~200MB
    chunks = 1
    while p % (chunks * 2) == 0 and (p // chunks) * 128 * 4 > 200e6:
        chunks *= 2

    rr = jnp.clip(r, 0.0, 1.0).reshape(chunks, -1) * dm1
    gg = jnp.clip(g, 0.0, 1.0).reshape(chunks, -1) * dm1
    bb = jnp.clip(b, 0.0, 1.0).reshape(chunks, -1) * dm1

    def one_chunk(args):
        rr, gg, bb = args
        r0 = jnp.minimum(jnp.floor(rr), dm1 - 1).astype(jnp.int32)
        g0 = jnp.minimum(jnp.floor(gg), dm1 - 1).astype(jnp.int32)
        b0 = jnp.minimum(jnp.floor(bb), dm1 - 1).astype(jnp.int32)
        fr = rr - r0
        fg = gg - g0
        fb = bb - b0
        cell = (r0 * m + g0) * m + b0
        fetched = jnp.take(cells, cell.reshape(-1, 1), axis=0)
        fetched = fetched.reshape(-1, 8, 3)

        def at(i, j, k):
            q = fetched[:, (i << 2) | (j << 1) | k, :]
            return (q[:, 0], q[:, 1], q[:, 2])

        c000 = at(0, 0, 0)
        c111 = at(1, 1, 1)
        c100 = at(1, 0, 0)
        c110 = at(1, 1, 0)
        c010 = at(0, 1, 0)
        c011 = at(0, 1, 1)
        c001 = at(0, 0, 1)
        c101 = at(1, 0, 1)

        def tet(c0, cA, cB, c1, f0, fA, fB):
            return tuple(c0[c] * (1.0 - f0) + cA[c] * (f0 - fA)
                         + cB[c] * (fA - fB) + c1[c] * fB
                         for c in range(3))

        t1 = tet(c000, c100, c110, c111, fr, fg, fb)  # r>=g>=b
        t2 = tet(c000, c100, c101, c111, fr, fb, fg)  # r>=b>=g
        t3 = tet(c000, c001, c101, c111, fb, fr, fg)  # b>r>=g
        t4 = tet(c000, c001, c011, c111, fb, fg, fr)  # b>g>r
        t5 = tet(c000, c010, c011, c111, fg, fb, fr)  # g>b>=r
        t6 = tet(c000, c010, c110, c111, fg, fr, fb)  # g>r, r>=b

        rge_g = fr >= fg
        gge_b = fg >= fb
        rge_b = fr >= fb
        outs = []
        for c in range(3):
            o = jnp.where(rge_g & gge_b, t1[c],
                jnp.where(rge_g & ~gge_b & rge_b, t2[c],
                jnp.where(rge_g & ~gge_b & ~rge_b, t3[c],
                jnp.where(~rge_g & ~gge_b, t4[c],
                jnp.where(~rge_g & gge_b & ~rge_b, t5[c], t6[c])))))
            outs.append(o)
        return jnp.stack(outs)

    import jax

    if chunks > 1:
        out = jax.lax.map(one_chunk, (rr, gg, bb))  # (chunks, 3, Pc)
        out = jnp.moveaxis(out, 1, 0).reshape(3, -1)
    else:
        out = one_chunk((rr[0], gg[0], bb[0]))
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape))


def apply_trilinear(r, g, b, table):
    """Trilinear 3D LUT interpolation (CLF interpolation="trilinear").

    Same packed-corner gather strategy as :func:`apply_tetrahedral`,
    but with the classic 8-corner product weights.
    """
    n = table.shape[0]
    dm1 = n - 1.0
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
    fr = (rr - r0)[:, None]
    fg = (gg - g0)[:, None]
    fb = (bb - b0)[:, None]
    cell = (r0 * m + g0) * m + b0
    fetched = jnp.take(cells, cell.reshape(-1, 1), axis=0)
    fetched = fetched.reshape(-1, 8, 3)
    out = 0.0
    for i in (0, 1):
        wi = fr if i else (1.0 - fr)
        for j in (0, 1):
            wj = fg if j else (1.0 - fg)
            for k in (0, 1):
                wk = fb if k else (1.0 - fb)
                out = out + fetched[:, (i << 2) | (j << 1) | k, :] \
                    * (wi * wj * wk)
    return (out[:, 0].reshape(shape), out[:, 1].reshape(shape),
            out[:, 2].reshape(shape))
