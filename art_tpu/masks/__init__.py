"""Masking subsystem (reference: rtengine/masks.cc + procparams.h:101-330).

Shared by colorCorrection, smoothing, textureBoost, localContrast. Each
region carries a composite Mask: parametric (H/C/L flat curves over
Lab-derived coordinates), area shapes (rectangles/gradients/polygons,
rasterized on host), delta-E picking, plus common controls (blur, curve,
posterization, opacity, inversion).

Device evaluation follows masks.cc:1190-1260: l = L/32768 equivalent,
c = lin2log(chroma, 50), h = offset log-warped hue; blend = dE * hm(h) *
cm(c) * lm(l), then blur/area/curve/opacity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from art_tpu.color import colorspaces as cs
from art_tpu.color.curves import DiagonalCurve, FlatCurve
from art_tpu.core.curve1d import eval_curve, fit_curve
from art_tpu.core.image import MAXVAL
from art_tpu.ops.filters import gauss_blur

# reference defaults (procparams.cc:1014-1052) — identity curves
DEFAULT_HUE = [1, 0.166666667, 1.0, 0.35, 0.35, 0.8287775246, 1.0, 0.35,
               0.35]
DEFAULT_CC = [1, 0.0, 1.0, 0.35, 0.35, 1.0, 1.0, 0.35, 0.35]


@dataclasses.dataclass
class MaskSpec:
    enabled: bool = True
    inverted: bool = False
    parametric_enabled: bool = False
    hue: list = dataclasses.field(default_factory=lambda: list(DEFAULT_HUE))
    chromaticity: list = dataclasses.field(
        default_factory=lambda: list(DEFAULT_CC))
    lightness: list = dataclasses.field(
        default_factory=lambda: list(DEFAULT_CC))
    parametric_blur: float = 0.0
    area_enabled: bool = False
    area_shapes: list = dataclasses.field(default_factory=list)
    area_feather: float = 0.0
    area_blur: float = 0.0
    deltae_enabled: bool = False
    deltae_lch: tuple = (0.0, 0.0, 0.0)
    deltae_range: float = 1.0
    deltae_decay: float = 1.0
    curve: list = dataclasses.field(default_factory=lambda: [0])
    posterization: int = 0
    smoothing: int = 0
    opacity: float = 1.0
    drawn_enabled: bool = False
    drawn_feather: float = 0.0
    drawn_opacity: float = 1.0
    drawn_smoothness: float = 0.0
    drawn_contrast: list = dataclasses.field(default_factory=lambda: [0])
    drawn_mode: int = 0  # 0=INTERSECT 1=ADD 2=ADD_BOUNDED
    drawn_strokes: list = dataclasses.field(default_factory=list)
    name: str = ""
    # LinkedMask (procparams.h:267): reuse a named mask from another tool
    linked_enabled: bool = False
    linked_inverted: bool = False
    linked_toolname: str = ""
    linked_name: str = ""
    # ExternalMask (procparams.h:280): greyscale image file as a mask
    external_enabled: bool = False
    external_inverted: bool = False
    external_filename: str = ""
    external_feather: float = 0.0

    @classmethod
    def from_keyfile(cls, kf, group, suffix, prefix=""):
        """Parse the suffixed mask keys (procparams.cc:1432-1496)."""
        m = cls()
        g = lambda key, kind, dflt: {
            "b": kf.get_bool, "f": kf.get_float, "i": kf.get_int,
            "dl": kf.get_double_list, "s": kf.get_string,
        }[kind](group, prefix + key + suffix, dflt)
        m.enabled = g("MaskEnabled", "b", True)
        m.inverted = g("MaskInverted", "b", False)
        m.curve = g("MaskCurve", "dl", [0])
        m.posterization = g("MaskPosterization", "i", 0)
        m.smoothing = g("MaskSmoothing", "i", 0)
        m.opacity = g("MaskOpacity", "f", 1.0)
        m.parametric_enabled = g("ParametricMaskEnabled", "b", False)
        m.hue = g("HueMask", "dl", DEFAULT_HUE)
        m.chromaticity = g("ChromaticityMask", "dl", DEFAULT_CC)
        m.lightness = g("LightnessMask", "dl", DEFAULT_CC)
        m.parametric_blur = g("ParametricMaskBlur", "f", 0.0)
        m.area_enabled = g("AreaMaskEnabled", "b", False)
        m.area_feather = g("AreaMaskFeather", "f", 0.0)
        m.area_blur = g("AreaMaskBlur", "f", 0.0)
        # shapes: AreaMask<N>Type etc.
        n = 0
        while True:
            t = kf.get_string(group, f"{prefix}AreaMask{n}Type{suffix}", "")
            if not t:
                break
            shape = {"type": t.lower()}
            for key in ("X", "Y", "Width", "Height", "Angle", "Roundness",
                        "StrengthStart", "StrengthEnd", "ShapeFeather"):
                shape[key.lower()] = kf.get_float(
                    group, f"{prefix}AreaMask{n}{key}{suffix}", 0.0)
            shape["knots"] = kf.get_double_list(
                group, f"{prefix}AreaMask{n}Knots{suffix}", [])
            shape["mode"] = kf.get_string(
                group, f"{prefix}AreaMask{n}Mode{suffix}", "add").lower()
            m.area_shapes.append(shape)
            n += 1
        m.drawn_enabled = g("DrawnMaskEnabled", "b", False)
        m.drawn_feather = g("DrawnMaskFeather", "f", 0.0)
        m.drawn_opacity = g("DrawnMaskOpacity", "f", 1.0)
        m.drawn_smoothness = g("DrawnMaskSmoothness", "f", 0.0)
        m.drawn_contrast = g("DrawnMaskContrast", "dl", [0])
        m.drawn_mode = g("DrawnMaskMode", "i", 0)
        m.drawn_strokes = g("DrawnMaskStrokes", "dl", [])
        m.deltae_enabled = g("DeltaEMaskEnabled", "b", False)
        m.deltae_lch = (g("DeltaEMaskL", "f", 0.0),
                        g("DeltaEMaskC", "f", 0.0),
                        g("DeltaEMaskH", "f", 0.0))
        m.deltae_range = g("DeltaEMaskRange", "f", 1.0)
        m.deltae_decay = g("DeltaEMaskDecay", "f", 1.0)
        m.name = g("MaskName", "s", "")
        # linked mask: "toolname|maskname" (procparams.cc:1403-1416)
        m.linked_enabled = g("LinkedMaskEnabled", "b", False)
        m.linked_inverted = g("LinkedMaskInverted", "b", False)
        ref = g("LinkedMask", "s", "")
        if "|" in ref:
            m.linked_toolname, m.linked_name = ref.split("|", 1)
        # external mask (procparams.cc:1418-1424)
        m.external_enabled = g("ExternalMaskEnabled", "b", False)
        m.external_inverted = g("ExternalMaskInverted", "b", False)
        m.external_filename = g("ExternalMaskFilename", "s", "")
        if m.external_filename.startswith("file://"):
            from urllib.parse import unquote, urlparse

            m.external_filename = unquote(urlparse(m.external_filename).path)
        m.external_feather = g("ExternalMaskFeather", "f", 0.0)
        return m

    def is_trivial(self):
        return not (self.parametric_enabled or self.area_enabled
                    or self.deltae_enabled or self.inverted
                    or (self.drawn_enabled and self.drawn_strokes)
                    or (self.linked_enabled and self.linked_name)
                    or (self.external_enabled and self.external_filename)
                    or (self.curve and len(self.curve) > 1))


def _lin2log(x, base):
    return np.log(x * (base - 1.0) + 1.0) / np.log(base)


def _lin2log_j(x, base):
    return jnp.log(x * (base - 1.0) + 1.0) / np.log(base)


def rasterize_area(shapes, h, w):
    """Host rasterization of area shapes -> float32 (h, w) alpha."""
    import cv2

    out = np.zeros((h, w), dtype=np.float32)
    for s in shapes:
        alpha = np.zeros((h, w), dtype=np.float32)
        cx = (s.get("x", 0.0) / 200.0 + 0.5) * w
        cy = (s.get("y", 0.0) / 200.0 + 0.5) * h
        if s["type"] in ("rectangle", "rect"):
            ww = s.get("width", 100.0) / 100.0 * w / 2.0
            hh = s.get("height", 100.0) / 100.0 * h / 2.0
            angle = np.radians(s.get("angle", 0.0))
            box = cv2.boxPoints(((cx, cy), (2 * ww, 2 * hh),
                                 -np.degrees(angle)))
            cv2.fillPoly(alpha, [box.astype(np.int32)], 1.0)
        elif s["type"] == "polygon" and len(s.get("knots", [])) >= 6:
            k = np.asarray(s["knots"], dtype=np.float64)
            pts = np.stack([(k[0::3] / 200.0 + 0.5) * w,
                            (k[1::3] / 200.0 + 0.5) * h], axis=1)
            cv2.fillPoly(alpha, [pts.astype(np.int32)], 1.0)
        elif s["type"] == "gradient":
            angle = np.radians(s.get("angle", 0.0))
            ss = s.get("strengthstart", 100.0) / 100.0
            se = s.get("strengthend", 0.0) / 100.0
            yy, xx = np.mgrid[0:h, 0:w]
            d = ((xx - cx) * np.sin(angle) + (yy - cy) * np.cos(angle))
            span = max(h, w) * max(s.get("shapefeather", 25.0), 1.0) / 100.0
            t = np.clip(d / span + 0.5, 0.0, 1.0)
            alpha = (ss + (se - ss) * t).astype(np.float32)
        feather = s.get("shapefeather", 0.0)
        if feather > 0 and s["type"] != "gradient":
            sigma = feather / 100.0 * min(h, w) * 0.1 + 0.5
            alpha = cv2.GaussianBlur(alpha, (0, 0), sigma)
        if s.get("mode") == "subtract":
            out = np.clip(out - alpha, 0.0, 1.0)
        elif s.get("mode") == "intersect":
            out = out * alpha
        else:
            out = np.clip(out + alpha, 0.0, 1.0)
    return out


def rasterize_drawn(spec: "MaskSpec", h, w):
    """Host rasterization of brush strokes (masks.cc generate_drawn_mask
    :379): per stroke-group circular stamps with hardness-derived values,
    smoothness blur, feather, and contrast curve. Deviations: the feather
    uses a gaussian instead of the image-guided filter (the guide lives on
    device), and stamp de-duplication is per parameter-group rather than
    per flag run."""
    import cv2

    strokes = list(spec.drawn_strokes)
    add = spec.drawn_mode != 0
    mask = np.zeros((h, w), dtype=np.float32)
    stamped = np.zeros((h, w), dtype=bool)
    maxradius = 0.0
    pos = 0
    while pos + 4 < len(strokes):
        n = int(strokes[pos])
        radius = float(strokes[pos + 1])
        erase = not bool(strokes[pos + 2])
        opac = float(np.clip(strokes[pos + 3], 0.0, 1.0))
        pos += 4
        pts = strokes[pos : pos + 2 * n]
        pos += 2 * n
        r = int(min(w, h) * radius * 0.25)
        maxradius = max(maxradius, radius)
        val = (-1.0 if erase else 1.0) + (1.0 - opac) * (0.99 if erase
                                                         else -0.99)
        cov = np.zeros((h, w), dtype=np.uint8)
        for k in range(0, len(pts) - 1, 2):
            cx = int(round(w * pts[k]))
            cy = int(round(h * pts[k + 1]))
            cv2.circle(cov, (cx, cy), max(r, 1), 1, -1)
        covb = cov > 0
        stamped |= covb
        if add:
            base = np.where(np.sign(mask) == np.sign(val), mask,
                            np.clip(mask, 0.0, 1.0))
            mask = np.where(covb, np.clip(base + val, -1.0, 1.0), mask)
        else:
            mask = np.where(covb, np.clip(mask + val, 0.0, 1.0), mask)

    ccurve = DiagonalCurve(spec.drawn_contrast)
    needscale = add and (spec.drawn_smoothness > 0 or spec.drawn_feather > 0
                         or not ccurve.is_identity())
    if needscale:
        mask = np.where(stamped, (mask + 1.0) / 2.0, 0.5).astype(np.float32)
    if spec.drawn_smoothness > 0:
        sigma = min(w, h) * maxradius * 0.2 * spec.drawn_smoothness
        if sigma > 0.3:
            mask = cv2.GaussianBlur(mask, (0, 0), sigma)
    if spec.drawn_feather > 0:
        rad = spec.drawn_feather / 100.0 * min(w, h) * 0.1 + 0.5
        if rad > 0.6:
            mask = cv2.GaussianBlur(mask, (0, 0), rad)
    if not ccurve.is_identity():
        xs = np.linspace(0.0, 1.0, 1025)
        lut = ccurve.lut(1025)
        mask = np.interp(np.clip(mask, 0.0, 1.0), xs, lut).astype(np.float32)
    if needscale:
        mask = mask * 2.0 - 1.0
    return mask.astype(np.float32)


# reference toolnames used in LinkedMask refs (ipcolorcorrection.cc:236,
# iplocalcontrast.cc:454, ipsmoothing.cc:929, iptextureboost.cc:210)
_TOOL_GROUPS = {
    "colorcorrection": "ColorCorrection",
    "smoothing": "Smoothing",
    "textureboost": "TextureBoost",
    "localcontrast": "Local Contrast",
}


def build_mask_registry(pp):
    """(toolname, mask name) -> MaskSpec over every masked tool in `pp`
    (LinkedMaskManager role, masks.cc:806-865). Cached on the instance."""
    reg = getattr(pp, "_mask_registry", None)
    if reg is not None:
        return reg
    from art_tpu.params.keyfile import KeyFile

    reg = {}
    for toolname, group in _TOOL_GROUPS.items():
        if group not in pp.extra:
            continue
        kf = KeyFile()
        kf.groups[group] = dict(pp.extra[group])
        j = 1
        while j <= 64:
            sfx = f"_{j}"
            if not kf.has(group, f"MaskEnabled{sfx}") and \
                    not kf.has(group, f"MaskName{sfx}"):
                break
            m = MaskSpec.from_keyfile(kf, group, sfx)
            if m.name and m.enabled:
                reg[(toolname, m.name)] = m
            j += 1
    pp._mask_registry = reg
    return reg


def _load_external_mask(filename, h, w, inverted):
    """Greyscale mask image -> (h, w) float plane (ExternalMaskManager::
    apply_mask, masks.cc:951-1023: green channel, bilinear resample,
    optional inversion)."""
    import numpy as _np
    from PIL import Image

    img = Image.open(filename)
    if img.mode not in ("L", "I;16", "F"):
        img = img.convert("RGB")
    img = img.resize((w, h), Image.BILINEAR)
    a = _np.asarray(img, dtype=_np.float32)
    if a.ndim == 3:
        a = a[..., 1]  # green channel, masks.cc:979
    scale = 65535.0 if a.max() > 255.0 else (255.0 if a.max() > 1.0 else 1.0)
    a = _np.clip(a / scale, 0.0, 1.0)
    if inverted:
        a = 1.0 - a
    return a


def plan_mask(mask: MaskSpec, shape, pp=None):
    """Host planner for one region mask -> (static, data).

    `pp` enables LinkedMask resolution against the other tools' masks."""
    h, w = shape
    data = {}
    use_param = False
    if mask.parametric_enabled:
        hm = FlatCurve(mask.hue, periodic=True, identity_value=1.0)
        cm = FlatCurve(mask.chromaticity, periodic=False, identity_value=1.0)
        lm = FlatCurve(mask.lightness, periodic=False, identity_value=1.0)
        hue_dflt = mask.hue == DEFAULT_HUE
        cc_dflt = mask.chromaticity == DEFAULT_CC
        l_dflt = mask.lightness == DEFAULT_CC
        if not (hue_dflt and cc_dflt and l_dflt):
            use_param = True
            data["hm"] = fit_curve(hm.lut(8192))
            data["cm"] = fit_curve(cm.lut(8192))
            data["lm"] = fit_curve(lm.lut(8192))
    use_area = False
    if mask.area_enabled and mask.area_shapes:
        use_area = True
        data["area"] = rasterize_area(mask.area_shapes, h, w)
    drawn_mode = -1
    if mask.drawn_enabled and mask.drawn_strokes:
        drawn_mode = int(np.clip(mask.drawn_mode, 0, 2))
        data["drawn"] = rasterize_drawn(mask, h, w)
    use_curve = False
    mc = DiagonalCurve(mask.curve)
    if not mc.is_identity():
        use_curve = True
        data["mcurve"] = fit_curve(mc.lut(8192))
    use_de = bool(mask.deltae_enabled)
    if use_de:
        data["de_ref"] = np.array(mask.deltae_lch, dtype=np.float32)
        data["de_range"] = np.float32(mask.deltae_range)
        data["de_decay"] = np.float32(max(mask.deltae_decay, 1e-3))
    # external mask file (masks.cc:1396)
    ext_radius = -1
    if mask.external_enabled and mask.external_filename:
        try:
            data["ext"] = _load_external_mask(
                mask.external_filename, h, w, mask.external_inverted)
            # feather -> guided-filter radius (masks.cc:1025-1030)
            ext_radius = int(mask.external_feather / 100.0
                             * min(h, w) * 0.1 + 0.5) \
                if mask.external_feather > 0 else 0
        except OSError:
            ext_radius = -1
    # linked mask: evaluate the referenced tool's mask spec on the same
    # input (masks.cc:1411-1425; deviation: the reference multiplies the
    # source tool's mask as computed at that tool's pipeline position,
    # we re-evaluate its spec at this op's input — identical except for
    # inter-op image changes)
    linked_static = None
    if mask.linked_enabled and mask.linked_name and pp is not None:
        reg = build_mask_registry(pp)
        src = reg.get((mask.linked_toolname, mask.linked_name))
        if src is not None:
            src = dataclasses.replace(src, linked_enabled=False,
                                      external_enabled=False)
            linked_static, linked_data = plan_mask(src, shape)
            for k, v in linked_data.items():
                data["linked:" + k] = v
    static = (use_param, use_area, use_curve, use_de,
              bool(mask.inverted), float(mask.parametric_blur),
              float(mask.area_blur), int(mask.posterization),
              float(mask.opacity), drawn_mode,
              float(np.clip(mask.drawn_opacity, 0.0, 1.0)),
              ext_radius, linked_static,
              bool(mask.linked_inverted))
    return static, data


def eval_mask(rgb, ws, static, data):
    """Device: evaluate one region mask -> (H, W) in [0,1]."""
    (use_param, use_area, use_curve, use_de, inverted, pblur, ablur,
     posterization, opacity, drawn_mode, drawn_alpha) = static[:11]
    ext_radius = static[11] if len(static) > 11 else -1
    linked_static = static[12] if len(static) > 12 else None
    linked_inverted = static[13] if len(static) > 13 else False

    def apply_drawn(m):
        f = drawn_alpha * data["drawn"]
        if drawn_mode == 0:  # INTERSECT
            return m * f
        return jnp.clip(m + f, 0.0, 1.0)
    x = rgb / MAXVAL
    xx = ws[0, 0] * x[0] + ws[0, 1] * x[1] + ws[0, 2] * x[2]
    yy = ws[1, 0] * x[0] + ws[1, 1] * x[1] + ws[1, 2] * x[2]
    zz = ws[2, 0] * x[0] + ws[2, 1] * x[1] + ws[2, 2] * x[2]
    L, a, b = cs.xyz_to_lab(xx, yy, zz, jnp)
    l01 = jnp.clip(L / 100.0, 0.0, 1.0)

    m = jnp.ones_like(l01)
    if use_param:
        c = jnp.hypot(a, b) / 182.0  # ~42000/32768 scaling of the reference
        c = _lin2log_j(jnp.clip(c, 0.0, 1.0), 50.0)
        hgl = jnp.arctan2(b, a) / (2 * jnp.pi)
        h01 = jnp.mod(hgl + 1.0 + 1.0 / 6.0, 1.0)
        h01 = _lin2log_j(h01, 3.0)
        m = (eval_curve(h01, data["hm"], in_max=1.0, out_max=1.0)
             * eval_curve(c, data["cm"], in_max=1.0, out_max=1.0)
             * eval_curve(l01, data["lm"], in_max=1.0, out_max=1.0))
        if pblur > 0:
            m = gauss_blur(m, pblur)
    if use_de:
        ref = data["de_ref"]
        c = jnp.hypot(a, b)
        hh = jnp.degrees(jnp.arctan2(b, a))
        dL = (L - ref[0])
        dC = (c - ref[1])
        dH = jnp.abs(jnp.mod(hh - ref[2] + 180.0, 360.0) - 180.0)
        de = jnp.sqrt((0.5 * dL) ** 2 + (0.75 * dC) ** 2 + (1.0 * dH) ** 2)
        sel = jnp.exp(-jnp.maximum(de - data["de_range"], 0.0)
                      / (data["de_decay"] * 10.0))
        m = m * sel
    if drawn_mode == 2:  # ADD_BOUNDED: brush before the area bound
        m = apply_drawn(m)
    if use_area:
        area = data["area"]
        if ablur > 0:
            area = gauss_blur(area, ablur)
        m = m * area
    if ext_radius >= 0:  # external mask multiplies in (masks.cc:1396)
        ext = jnp.asarray(data["ext"])
        if ext_radius > 0:
            from art_tpu.ops.filters import guided_filter

            ext = guided_filter(l01, ext, ext_radius, 1e-7)
        m = m * ext
    if linked_static is not None:  # linked mask multiplies in (:1411)
        lm = eval_mask(rgb, ws,
                       linked_static,
                       {k[len("linked:"):]: v for k, v in data.items()
                        if k.startswith("linked:")})
        if linked_inverted:
            lm = 1.0 - lm
        m = m * lm
    if drawn_mode in (0, 1):
        m = apply_drawn(m)
    if use_curve:
        m = eval_curve(m, data["mcurve"], in_max=1.0, out_max=1.0)
    if posterization > 0:
        levels = float(2 ** posterization)
        m = jnp.round(m * levels) / levels
    if inverted:
        m = 1.0 - m
    return jnp.clip(m * opacity, 0.0, 1.0)


def regions_from_extra(pp, group, field_spec):
    """Parse suffixed region params + masks from ProcParams.extra[group].

    field_spec: {python_name: (arp_key_base, kind, default)} with kinds
    b/i/f/s/dl; keys are read as f"{base}_{j}". Returns list of
    (params_dict, MaskSpec).
    """
    from art_tpu.params.keyfile import KeyFile

    if group not in pp.extra:
        return None
    kf = KeyFile()
    kf.groups[group] = dict(pp.extra[group])
    if not kf.get_bool(group, "Enabled", False):
        return None
    out = []
    j = 1
    first_base = next(iter(field_spec.values()))[0]
    while True:
        sfx = f"_{j}"
        if not any(kf.has(group, spec[0] + sfx)
                   for spec in field_spec.values()):
            if not kf.has(group, f"MaskEnabled{sfx}"):
                break
        params = {}
        for name, (base, kind, dflt) in field_spec.items():
            getter = {"b": kf.get_bool, "i": kf.get_int, "f": kf.get_float,
                      "s": kf.get_string, "dl": kf.get_double_list}[kind]
            params[name] = getter(group, base + sfx, dflt)
        mask = MaskSpec.from_keyfile(kf, group, sfx)
        out.append((params, mask))
        j += 1
        if j > 64:
            break
    return out or None
