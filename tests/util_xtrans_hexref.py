"""Reference-formulation X-Trans green oracle (NumPy, test-only).

Implements the hex-table green candidate stage of the reference's
Markesteijn demosaic (xtrans_demosaic.cc:207-470: orth/patt hex map,
the four green candidate formulas with their fixed-point weights, and
the 6-neighbor green min/max clamp). Honest provenance: the orth/patt
tables and candidate weights ARE the algorithm spec (dcraw lineage);
the vectorization and the best-of-candidates oracle selection are ours.

Purpose: quantify the divergence of art_tpu's whole-plane H/V stencil
variant (demosaic/xtrans.py docstring "TPU formulation") against the
reference's hex formulation on synthetic mosaics with known ground
truth — the deviation bound asked for in round-3 review.
"""

import numpy as np

ORTH = [1, 0, 0, 1, -1, 0, 0, -1, 1, 0, 0, 1]
PATT = [[0, 1, 0, -1, 2, 0, -1, 0, 1, 1, 1, -1, 0, 0, 0, 0],
        [0, 1, 0, -2, 1, 0, -2, 0, 1, 1, -2, -2, 1, -1, -1, 1]]


def _build_allhex(xtrans):
    """allhex[row%3][col%3][c] = (dv, dh) green-hexagon offsets
    (xtrans_demosaic.cc:233-264, stored as 2-D steps instead of flat
    row-major offsets)."""
    xt = np.asarray(xtrans, dtype=int).reshape(6, 6)

    def isg(r, c):
        return (xt[r % 3][c % 3] & 1) == 1

    allhex = np.zeros((3, 3, 8, 2), dtype=int)
    for row in range(3):
        for col in range(3):
            gint = 1 if isg(row, col) else 0
            ng = 0
            for d in range(0, 10, 2):
                if isg(row + ORTH[d] + 6, col + ORTH[d + 2] + 6):
                    ng = 0
                else:
                    ng += 1
                if ng == gint + 1:
                    for c in range(8):
                        v = (ORTH[d] * PATT[gint][c * 2]
                             + ORTH[d + 1] * PATT[gint][c * 2 + 1])
                        h = (ORTH[d + 2] * PATT[gint][c * 2]
                             + ORTH[d + 3] * PATT[gint][c * 2 + 1])
                        allhex[row, col, c ^ (gint * 2 & d)] = (v, h)
    return allhex


def hexref_green_candidates(cfa, xtrans, margin=9):
    """Four reference green candidates + the hex min/max clamp bounds
    at every non-green site (xtrans_demosaic.cc:420-470).

    Returns (cands[4, H, W], gmin, gmax, nongreen_mask); candidate
    values outside `margin` or on green sites are NaN.
    """
    cfa = np.asarray(cfa, dtype=np.float64)
    H, W = cfa.shape
    xt = np.asarray(xtrans, dtype=int).reshape(6, 6)
    allhex = _build_allhex(xt)
    cidx = xt[np.arange(H)[:, None] % 6, np.arange(W)[None, :] % 6]
    nong = cidx != 1

    cands = np.full((4, H, W), np.nan)
    gmin = np.full((H, W), np.nan)
    gmax = np.full((H, W), np.nan)
    for row in range(margin, H - margin):
        for col in range(margin, W - margin):
            if not nong[row, col]:
                continue
            hx = allhex[row % 3, col % 3]

            def pix(k, c):
                dv, dh = hx[c]
                return cfa[row + k * dv, col + k * dh]

            vals = [pix(1, c) for c in range(6)]
            gmin[row, col] = min(vals)
            gmax[row, col] = max(vals)
            p0 = cfa[row, col]
            c0 = (0.6796875 * (pix(1, 1) + pix(1, 0))
                  - 0.1796875 * (pix(2, 1) + pix(2, 0)))
            c1 = (0.87109375 * pix(1, 3) + 0.12890625 * pix(1, 2)
                  + 0.359375 * (p0 - pix(-1, 2)))
            c23 = [0.640625 * pix(1, 4 + c) + 0.359375 * pix(-2, 4 + c)
                   + 0.12890625 * (2.0 * p0 - pix(3, 4 + c)
                                   - pix(-3, 4 + c))
                   for c in range(2)]
            cands[:, row, col] = (c0, c1, c23[0], c23[1])
    return cands, gmin, gmax, nong


def hexref_best_green(cfa, gt_green, xtrans, margin=9, clamp=True):
    """Oracle-selected (min |err| vs ground truth) clamped reference
    green — the reference's best case over its homogeneity voting."""
    cands, gmin, gmax, nong = hexref_green_candidates(cfa, xtrans, margin)
    if clamp:
        cands = np.clip(cands, gmin[None], gmax[None])
    err = np.abs(cands - np.asarray(gt_green, dtype=np.float64)[None])
    best = np.nanmin(err, axis=0)
    valid = nong & ~np.isnan(best)
    return best, valid
