"""PDAF lines filter tests."""

import numpy as np

from art_tpu.core.image import bayer_channel_masks
from art_tpu.raw.pdaf import pdaf_filter, pdaf_row_mask


def test_row_mask_pattern():
    # pattern [0, 18], offset 3: rows 3, 21, 3+18k... within period 18
    m = pdaf_row_mask([0, 18], 3, 60)
    expect = {(r - 3) % 18 == 0 for r in range(60)}  # noqa: F841
    got = set(np.where(m)[0].tolist())
    assert got == {r for r in range(60) if (r - 3) % 18 == 0}


def test_pdaf_filter_fixes_green_banding():
    import jax.numpy as jnp

    h, w = 96, 128
    rng = np.random.default_rng(0)
    cfa = rng.uniform(8000, 9000, (h, w)).astype(np.float32)
    _, mg, _ = bayer_channel_masks("RGGB", (h, w), xp=np)
    rows = pdaf_row_mask([0, 12], 3, h)
    band = rows[:, None] & mg
    cfa_band = np.where(band, cfa * 0.97, cfa)
    out = np.asarray(pdaf_filter(jnp.asarray(cfa_band), jnp.asarray(mg),
                                 jnp.asarray(rows.astype(np.float32))))
    err_before = np.abs(cfa_band[band] - cfa[band]).mean()
    err_after = np.abs(out[band] - cfa[band]).mean()
    assert err_after < 0.5 * err_before
    # non-PDAF rows untouched
    other = ~rows[:, None] & mg
    assert np.abs(out[other] - cfa_band[other]).max() == 0.0
