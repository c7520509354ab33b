"""Auto-distortion (calc_distort.cc role) and auto-perspective (ashift
role) oracles: warp a synthetic scene by a known model, recover it."""

import cv2
import numpy as np

from art_tpu.lens.autos import autocompute_keystone, calc_distortion


def test_auto_distortion_recovers_inverse_warp():
    h, w = 400, 600
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (((xx // 30) + (yy // 30)) % 2 * 200 + 20).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    a_true = 0.08
    radius = np.hypot(h, w) / 2
    wc, hc = w / 2 - 0.5, h / 2 - 0.5
    r = np.hypot(xx - wc, yy - hc) / radius
    s = 1 - a_true + a_true * r
    mapx = ((xx - wc) * s + wc).astype(np.float32)
    mapy = ((yy - hc) * s + hc).astype(np.float32)
    warped = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    # `warped` is the pipeline-warp of img with amount a_true, so the
    # correcting amount (what the pipeline must apply to warped to get
    # img back) is ~-a_true
    a_est = calc_distortion(img, warped)
    assert abs(a_est + a_true) < 0.02, a_est


def test_auto_distortion_under_noise_and_other_magnitude():
    # pincushion (negative amount) at a different magnitude, with sensor
    # noise on the "raw" side — quality evidence the estimator holds off
    # the single happy path
    h, w = 400, 600
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (((xx // 25) + (yy // 35)) % 2 * 180 + 30).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    a_true = -0.05
    radius = np.hypot(h, w) / 2
    wc, hc = w / 2 - 0.5, h / 2 - 0.5
    r = np.hypot(xx - wc, yy - hc) / radius
    s = 1 - a_true + a_true * r
    mapx = ((xx - wc) * s + wc).astype(np.float32)
    mapy = ((yy - hc) * s + hc).astype(np.float32)
    warped = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    rng = np.random.default_rng(0)
    noisy = np.clip(warped.astype(np.float32)
                    + rng.normal(0, 6, warped.shape), 0, 255).astype(np.uint8)
    a_est = calc_distortion(img, noisy)
    assert abs(a_est + a_true) < 0.02, a_est


def test_auto_keystone_recovers_combined_axes():
    # simultaneous horizontal + vertical keystone: both axes recovered
    img = np.full((600, 800), 30, np.uint8)
    for x in range(100, 800, 120):
        cv2.line(img, (x, 50), (x, 550), 220, 3)
    for y in range(80, 600, 130):
        cv2.line(img, (60, y), (740, y), 220, 3)
    pv_true, ph_true = 0.25, -0.20
    hh, ww = img.shape
    cy, cx = hh / 2 - 0.5, ww / 2 - 0.5
    yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    den = 1 - (pv_true * (yy - cy) / hh + ph_true * (xx - cx) / ww)
    qx = ((xx - cx) / den + cx).astype(np.float32)
    qy = ((yy - cy) / den + cy).astype(np.float32)
    keystoned = cv2.remap(img, qx, qy, cv2.INTER_LINEAR)
    ph_e, pv_e = autocompute_keystone(keystoned)
    assert abs(pv_e - 25.0) < 8.0, (ph_e, pv_e)
    assert abs(ph_e + 20.0) < 8.0, (ph_e, pv_e)


def test_auto_keystone_recovers_tilt():
    img = np.full((600, 800), 30, np.uint8)
    for x in range(100, 800, 120):
        cv2.line(img, (x, 50), (x, 550), 220, 3)
    for y in range(80, 600, 130):
        cv2.line(img, (60, y), (740, y), 220, 3)
    pv_true = 0.30
    hh, ww = img.shape
    cy, cx = hh / 2 - 0.5, ww / 2 - 0.5
    yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
    den_q = 1 - pv_true * (yy - cy) / hh
    qx = ((xx - cx) / den_q + cx).astype(np.float32)
    qy = ((yy - cy) / den_q + cy).astype(np.float32)
    keystoned = cv2.remap(img, qx, qy, cv2.INTER_LINEAR)
    ph_e, pv_e = autocompute_keystone(keystoned)
    assert abs(pv_e - 30.0) < 8.0, pv_e
    assert abs(ph_e) < 8.0, ph_e
