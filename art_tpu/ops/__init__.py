"""Pipeline ops: the TPU edition of `improcfun`.

Each op is a module exposing:

- ``plan(pp, ctx) -> (static, data) | None`` — host-side: interpret
  ProcParams into a hashable static part and a pytree of arrays. ``None``
  means the op is disabled and vanishes from the compiled program.
- ``apply(rgb, data, static) -> rgb`` — device-side pure function, traced
  under jit. `rgb` is (3, H, W) float32 in 0..65535.

Execution order matches the reference OUTPUT pipeline
(``improcfun.cc:567-641``, SURVEY §2.4). XLA fuses the elementwise chain
across op boundaries — the per-op structure exists for planning and
incremental builds, not as a fusion barrier.
"""

from __future__ import annotations

import importlib

# reference stage grouping (improcfun.cc:575-639); pre-stage raw/denoise ops
# are handled by the pipeline driver itself.
# spot clone + film negative run first (simpleprocess.cc:283,307), then
# denoise = pre-stage (stage_denoise)
STAGE_0 = ("spot", "filmneg", "denoise", "dehaze", "fattal")
STAGE_1 = ("chmixer", "exposure", "hsl", "toneequalizer")
# dcplook_early/_late = DCP step-2 look/tone at its reference position
# (improcfun.cc:590-592 early, :614-620 late; gated by icm.dcp_look_early)
STAGE_2 = ("dcplook_early", "sharpen", "impulse", "defringe",
           "colorcorrection", "smoothing")
STAGE_3 = (
    "gradients", "textureboost", "grain", "logenc", "saturation",
    "dcplook_late", "filmsim_pre", "tonecurve", "filmsim_post",
    "rgbcurves", "labadj", "softlight", "localcontrast", "bw",
)

ALL_STEPS = STAGE_0 + STAGE_1 + STAGE_2 + STAGE_3

_modules: dict = {}


def get_op(name: str):
    """Import the op module implementing `name`, or None if not built yet."""
    if name in _modules:
        return _modules[name]
    mod = None
    base = name.removeprefix("filmsim_").removesuffix("_pre")
    candidates = {
        "filmsim_pre": "filmsim", "filmsim_post": "filmsim",
        "dcplook_early": "dcplook", "dcplook_late": "dcplook",
    }
    modname = candidates.get(name, name)
    try:
        mod = importlib.import_module(f"art_tpu.ops.{modname}")
    except ImportError:
        mod = None
    _modules[name] = mod
    return mod
