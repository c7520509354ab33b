"""Automatic geometry estimation (host-side).

Reference equivalents:
- auto-distortion: ``rtengine/calc_distort.cc`` + the vendored KLT
  tracker (``rtengine/klt/``) — track features between the camera's
  embedded JPEG (lens-corrected by the camera) and the demosaiced raw
  (uncorrected), then fit the radial model r' = (1 - a + a*r) * b by
  linear regression with an outlier-rejection pass (calcDistortion
  :35-160). Here OpenCV's pyramidal LK replaces the vendored KLT.
- auto-perspective: ``perspectivecorrection.cc`` + darktable's ashift
  (LSD line detection + Nelder-Mead) — detect near-vertical/horizontal
  line segments and find the keystone parameters that make them axis
  aligned. OpenCV's LSD + scipy Nelder-Mead replace the vendored code;
  the optimized model is the pipeline's own projective approximation
  (pipeline/transform.py), so the result plugs directly into
  PerspectiveParams.horizontal/vertical.
"""

from __future__ import annotations

import numpy as np

CENTER_R = 0.2
N_FEATURES = 100


def calc_distortion(gray_ref, gray_target):
    """Distortion `amount` mapping gray_target onto gray_ref.

    gray_ref: corrected reference (embedded JPEG), gray_target: the
    uncorrected raw rendering; same shape uint8. Returns 0.0 when not
    enough features track."""
    import cv2

    h, w = gray_ref.shape
    radius = np.sqrt(h * h + w * w) / 2.0
    wc, hc = w / 2.0 - 0.5, h / 2.0 - 0.5

    pts = cv2.goodFeaturesToTrack(gray_ref, N_FEATURES, 0.01, 10)
    if pts is None or len(pts) < 10:
        return 0.0
    nxt, st, _ = cv2.calcOpticalFlowPyrLK(
        gray_ref, gray_target, pts.astype(np.float32), None,
        winSize=(21, 21), maxLevel=3)
    if nxt is None:
        return 0.0
    p0 = pts.reshape(-1, 2)[st.ravel() == 1]
    p1 = nxt.reshape(-1, 2)[st.ravel() == 1]
    if len(p0) < 5:
        return 0.0

    r0 = np.hypot(p0[:, 0] - wc, p0[:, 1] - hc) / radius
    r1 = np.hypot(p1[:, 0] - wc, p1[:, 1] - hc) / radius
    keep = r0 > CENTER_R
    r0, r1 = r0[keep], r1[keep]
    if len(r0) < 5:
        return 0.0
    r10 = r1 / r0

    def fit(r0v, r10v):
        a0 = r0v.mean()
        a1 = r10v.mean()
        sxx = np.sum((r0v - a0) ** 2)
        sxy = np.sum((r0v - a0) * (r10v - a1))
        if sxx <= 0:
            return 0.0, 1.0
        u = sxy / sxx
        v = a1 - u * a0
        b = u + v
        if b == 0:
            return 0.0, 1.0
        return u / b, b

    a, b = fit(r0, r10)
    # one outlier-rejection pass (calc_distort.cc deviation loop)
    delta = np.abs(r10 - (1.0 - a + r0 * a) * b)
    thr = 3.0 * delta.std() + 1e-9
    keep = delta <= thr
    if keep.sum() >= 5:
        a, b = fit(r0[keep], r10[keep])
    return float(np.clip(a, -0.3, 0.3))


def auto_distortion_for(frame, thumb_size=400):
    """getAutoDistor (improcfun.cc:383): embedded JPEG vs fast raw
    rendering at ~thumb_size rows; returns the Distortion amount."""
    import cv2

    from art_tpu.io.metadata import embedded_thumb

    if not frame.filename or frame.rgb is not None and frame.cfa is None:
        return 0.0
    try:
        tdata = embedded_thumb(frame.filename)
    except Exception:
        return 0.0
    if not tdata:
        return 0.0
    arr = cv2.imdecode(np.frombuffer(tdata, np.uint8),
                       cv2.IMREAD_GRAYSCALE)
    if arr is None:
        return 0.0

    # fast raw luminance: 2x2 block means of the mosaic
    cfa = np.asarray(frame.cfa, np.float32)
    hh = (cfa.shape[0] // 2) * 2
    ww = (cfa.shape[1] // 2) * 2
    lum = cfa[:hh, :ww].reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
    lum = lum / max(lum.max(), 1.0)
    raw8 = (np.clip(lum, 0, 1) ** 0.45 * 255).astype(np.uint8)

    scale = thumb_size / arr.shape[0]
    tw = max(int(round(arr.shape[1] * scale)), 16)
    thumb = cv2.resize(arr, (tw, thumb_size))
    raw = cv2.resize(raw8, (tw, thumb_size))
    thumb = cv2.equalizeHist(thumb)
    raw = cv2.equalizeHist(raw)
    return calc_distortion(thumb, raw)


# ---------------------------------------------------------------------------
# auto-perspective (ashift role)

def autocompute_keystone(gray, mode="both", max_pct=85.0):
    """Estimate PerspectiveParams (horizontal, vertical) percent values
    that straighten detected line segments under the pipeline's keystone
    model. gray: 2-D uint8/float image. mode: 'vertical', 'horizontal',
    'both'."""
    import cv2
    from scipy.optimize import minimize

    g = np.asarray(gray)
    if g.dtype != np.uint8:
        g = (np.clip(g / max(g.max(), 1e-6), 0, 1) * 255).astype(np.uint8)
    h, w = g.shape
    scale = 1000.0 / max(h, w)
    if scale < 1.0:
        g = cv2.resize(g, (int(w * scale), int(h * scale)))
        h, w = g.shape

    lsd = cv2.createLineSegmentDetector()
    det = lsd.detect(g)[0]
    if det is None or len(det) < 4:
        return 0.0, 0.0
    segs = det.reshape(-1, 4).astype(np.float64)
    dx = segs[:, 2] - segs[:, 0]
    dy = segs[:, 3] - segs[:, 1]
    length = np.hypot(dx, dy)
    keep = length > 0.05 * min(h, w)
    segs, dx, dy, length = segs[keep], dx[keep], dy[keep], length[keep]
    if len(segs) < 4:
        return 0.0, 0.0
    ang = np.degrees(np.arctan2(dy, dx))  # -180..180
    vert = (np.abs(np.abs(ang) - 90.0) < 25.0)
    horiz = (np.minimum(np.abs(ang), np.abs(np.abs(ang) - 180.0)) < 25.0)
    use_v = mode in ("both", "vertical") and vert.sum() >= 2
    use_h = mode in ("both", "horizontal") and horiz.sum() >= 2
    if not (use_v or use_h):
        return 0.0, 0.0

    cx, cy = w / 2.0 - 0.5, h / 2.0 - 0.5
    p0 = np.stack([segs[:, 0] - cx, segs[:, 1] - cy], axis=1)
    p1 = np.stack([segs[:, 2] - cx, segs[:, 3] - cy], axis=1)

    def fwd(p, ph, pv):
        # inverse of the correction's inverse map (transform.py): an
        # input point lands at p / (1 - (pv*py/h + ph*px/w))
        t = 1.0 - (pv * p[:, 1] / h + ph * p[:, 0] / w)
        t = np.where(np.abs(t) < 0.05, np.sign(t) * 0.05 + (t == 0) * 0.05,
                     t)
        return p / t[:, None]

    wgt = length / length.sum()

    def cost(x):
        ph, pv = x
        q0 = fwd(p0, ph, pv)
        q1 = fwd(p1, ph, pv)
        d = q1 - q0
        c = 0.0
        if use_v:
            m = vert
            c += np.sum(wgt[m] * (d[m, 0] / np.maximum(
                np.abs(d[m, 1]), 1e-6)) ** 2)
        if use_h:
            m = horiz
            c += np.sum(wgt[m] * (d[m, 1] / np.maximum(
                np.abs(d[m, 0]), 1e-6)) ** 2)
        return c + 0.001 * (ph * ph + pv * pv)

    best = minimize(cost, np.zeros(2), method="Nelder-Mead",
                    options={"xatol": 1e-4, "fatol": 1e-8,
                             "maxiter": 400})
    ph, pv = best.x
    ph = float(np.clip(ph * 100.0, -max_pct, max_pct))
    pv = float(np.clip(pv * 100.0, -max_pct, max_pct))
    if not use_h:
        ph = 0.0 if mode == "vertical" else ph
    if not use_v:
        pv = 0.0 if mode == "horizontal" else pv
    return ph, pv
