"""Exposure compensation (reference: ipexposure.cc:29-75).

``v = max(v * 2^expcomp - black*2000, 0)`` per channel. Highlight
reconstruction modes live in the raw stage (getImage / HL recovery), not
here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def plan(pp, ctx):
    e = pp.exposure
    if not e.enabled or (e.expcomp == 0 and e.black == 0):
        return None
    data = {
        "scale": np.float32(2.0 ** e.expcomp),
        "black": np.float32(e.black * 2000.0),
    }
    return (), data


def apply(rgb, data, static):
    return jnp.maximum(rgb * data["scale"] - data["black"], 0.0)
