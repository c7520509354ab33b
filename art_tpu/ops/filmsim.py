"""Film simulation via 3D LUT (reference: ipfilmsim.cc + clutstore.cc).

Pipeline semantics (CLUTApplication::do_apply, clutstore.cc:1502-1616):
working -> sRGB primaries, sRGB gamma encode, 3D LUT with strength blend,
inverse gamma, back to working space. Runs before or after the tone curve
(filmSimulation.after_tone_curve), handled by the filmsim_pre/_post step
names in the op order.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.lut3d import apply_tetrahedral, load_lut3d
from art_tpu.core.image import MAXVAL

_lut_cache: dict = {}


class _FS:
    __slots__ = ("clut_filename", "clut_params", "strength",
                 "after_tone_curve")

    def __init__(self, f, p, s, a):
        self.clut_filename = f
        self.clut_params = p
        self.strength = s
        self.after_tone_curve = a


def _parse_lut_params(raw):
    """"name=v1,v2;..." -> {name: scalar} (procparams.cc load_lut_params)."""
    out = {}
    for item in (raw or "").split(";"):
        item = item.strip()
        if "=" not in item:
            continue
        name, _, vs = item.partition("=")
        vals = [float(v) for v in vs.split(",") if v.strip()]
        if vals:
            out[name.strip()] = vals[0] if len(vals) == 1 else vals
    return out


def _plan_common(pp, ctx, want_after):
    import os

    fs = pp.film_simulation
    if not fs.enabled or not fs.clut_filename:
        return None
    if bool(fs.after_tone_curve) != want_after:
        return None
    fname = fs.clut_filename
    if not os.path.isabs(fname):
        # relative CLUT paths resolve against options.clutsDir
        # (clutstore.cc getCTLLut full_filename)
        from art_tpu.settings import settings

        if settings.cluts_dir:
            cand = os.path.join(settings.cluts_dir, fname)
            if os.path.exists(cand):
                fname = cand
    fs = _FS(fname, fs.clut_params, fs.strength, fs.after_tone_curve)
    key = (fs.clut_filename, fs.clut_params)
    if fs.clut_filename.lower().endswith(".ctl"):
        # CTL script: bake to a LUT over the PQ shaper domain
        # (clutstore.cc getCTLLut/CTL_init_lut/CTL_apply)
        if key not in _lut_cache:
            try:
                from art_tpu.color.ctl import bake_lut, load_ctl

                script = load_ctl(fs.clut_filename)
                vals = _parse_lut_params(fs.clut_params)
                _lut_cache[key] = (bake_lut(script, vals),
                                   script.colorspace)
            except Exception:
                _lut_cache[key] = None
        entry = _lut_cache[key]
        if entry is None:
            return None
        table, space = entry
        work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
        if space and space in cs.MATRICES_XYZ_TO_RGB:
            conv = cs.MATRICES_XYZ_TO_RGB[space] @ work
        else:
            conv = np.eye(3)
        data = {
            "table": np.asarray(table, np.float32),
            "to_clut": conv.astype(np.float32),
            "to_work": np.linalg.inv(conv).astype(np.float32),
            "strength": np.float32(np.clip(fs.strength / 100.0, 0.0, 1.0)),
        }
        return ("ctl", False), data
    if fs.clut_filename.lower().endswith((".clf", ".clfz")):
        # Common LUT Format via the native CLF interpreter (the
        # reference routes these through OCIO: clutstore.cc getOCIOLut
        # + OCIO_apply at :1620 — working -> ACESp0 linear, ProcessList,
        # back, strength blend)
        if key not in _lut_cache:
            try:
                from art_tpu.color.clf import load_clf

                _lut_cache[key] = load_clf(fs.clut_filename)
            except Exception:
                _lut_cache[key] = None
        entry = _lut_cache[key]
        if entry is None:
            return None
        sigs, arrays = entry
        work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
        conv = (np.linalg.inv(cs.MATRICES_RGB_TO_XYZ["ACESp0"]) @ work)
        data = {
            "clf_arrays": arrays,
            "to_clut": conv.astype(np.float32),
            "to_work": np.linalg.inv(conv).astype(np.float32),
            "strength": np.float32(np.clip(fs.strength / 100.0, 0.0, 1.0)),
        }
        return ("clf", sigs), data
    if key not in _lut_cache:
        try:
            if fs.clut_filename.lower().endswith(".json"):
                # external LUT generator config (extclut.cc)
                from art_tpu.color.extclut import get_external_lut

                vals = _parse_lut_params(fs.clut_params)
                _lut_cache[key] = get_external_lut(fs.clut_filename, vals)
            else:
                _lut_cache[key] = load_lut3d(fs.clut_filename)
        except (OSError, ValueError):
            _lut_cache[key] = None
    table = _lut_cache[key]
    if table is None:
        return None
    work = cs.MATRICES_RGB_TO_XYZ[ctx["working_profile"]]
    to_srgb = cs.MATRICES_XYZ_TO_RGB["sRGB"] @ work
    to_work = np.linalg.inv(to_srgb)
    data = {
        "table": table,
        "to_clut": to_srgb.astype(np.float32),
        "to_work": to_work.astype(np.float32),
        "strength": np.float32(np.clip(fs.strength / 100.0, 0.0, 1.0)),
    }
    same = ctx["working_profile"] == "sRGB"
    return ("hald", same), data


def plan(pp, ctx):
    # called as "filmsim_pre" or "filmsim_post" via candidates map; default
    # entry (this function) covers the pre-curve position
    return _plan_common(pp, ctx, want_after=False)


def plan_post(pp, ctx):
    return _plan_common(pp, ctx, want_after=True)


def _mat3(m, rgb):
    return jnp.stack([
        m[0, 0] * rgb[0] + m[0, 1] * rgb[1] + m[0, 2] * rgb[2],
        m[1, 0] * rgb[0] + m[1, 1] * rgb[1] + m[1, 2] * rgb[2],
        m[2, 0] * rgb[0] + m[2, 1] * rgb[1] + m[2, 2] * rgb[2],
    ])


def apply(rgb, data, static):
    mode, same = static
    if mode == "ctl":
        # CTL_apply (clutstore.cc:1662): conv to the script space, PQ
        # shaper encode, tetrahedral LUT of ART_main outputs, conv back;
        # strength blends in working space
        from art_tpu.color.ctl import ctl_shaper

        x = rgb / MAXVAL
        x = _mat3(data["to_clut"], x)
        enc = ctl_shaper(x)
        r2, g2, b2 = apply_tetrahedral(enc[0], enc[1], enc[2],
                                       data["table"])
        out = _mat3(data["to_work"], jnp.stack([r2, g2, b2])) * MAXVAL
        s = data["strength"]
        return out * s + rgb * (1.0 - s)
    if mode == "clf":
        # OCIO_apply semantics (clutstore.cc:1620-1655): linear ACESp0
        # in and out, strength blend in working space
        from art_tpu.color.clf import apply_clf

        x = _mat3(data["to_clut"], rgb / MAXVAL)
        y = apply_clf(x, same, data["clf_arrays"])
        out = _mat3(data["to_work"], y) * MAXVAL
        s = data["strength"]
        return out * s + rgb * (1.0 - s)
    x = rgb / MAXVAL
    if not same:
        x = _mat3(data["to_clut"], x)
    enc = cs.srgb_gamma(jnp.clip(x, 0.0, 1.0), jnp)
    r2, g2, b2 = apply_tetrahedral(enc[0], enc[1], enc[2], data["table"])
    s = data["strength"]
    out_enc = jnp.stack([r2, g2, b2]) * s + enc * (1.0 - s)
    x = cs.srgb_igamma(out_enc, jnp)
    if not same:
        x = _mat3(data["to_work"], x)
    return x * MAXVAL
