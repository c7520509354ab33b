"""Soft-proof gamut warning (reference: rtengine/gamutwarning.{h,cc}).

The reference round-trips each pixel Lab -> soft-proof profile RGB
(clamped to [0,1]) -> reference space and marks pixels whose round trip
moved more than a threshold: delta > 0.0001 in ACESp0 RGB for
matrix-shaper profiles, deltaE > 5 in Lab for CLUT profiles
(GamutWarning::markLine, gamutwarning.cc:79-120). Marked pixels are
painted cyan (0,255,255) in the preview (mark, gamutwarning.cc:123).

TPU formulation: one whole-plane matmul into the proof space, a clamp,
and a matmul back — the mask falls out of a vectorized compare. Only
matrix-shaper profiles exist in this engine (named presets and
matrix-shaper .icc files via color.iccfile), so the ACESp0 branch is the
one implemented; the deltaE branch is kept for CLUT-profile callers that
supply their own transform pair.
"""

from __future__ import annotations

import numpy as np

from art_tpu.color import colorspaces as cs

_DELTA_MATRIX = 1e-4


def _as_xp(x):
    import jax.numpy as jnp

    return jnp if type(x).__module__.startswith("jax") else np


def gamut_warning_mask(rgb_work, working_profile, gamut_matrix_from_xyz,
                       xp=None):
    """Boolean (H, W) mask of pixels outside the soft-proof gamut.

    rgb_work: (3, H, W) linear working-space RGB (any positive scale).
    gamut_matrix_from_xyz: 3x3 XYZ->RGB matrix of the proof profile.
    Equivalent to the reference's matrix-shaper path: transform into the
    proof space, clamp, transform to ACESp0, compare against the
    unclamped path (delta 1e-4)."""
    if xp is None:
        xp = _as_xp(rgb_work)
    to_xyz = cs.rgb_to_xyz_matrix(working_profile)
    m_proof = np.asarray(gamut_matrix_from_xyz, np.float32) @ to_xyz
    aces_from_xyz = cs.xyz_to_rgb_matrix(
        "ACESp0" if "ACESp0" in cs.MATRICES_RGB_TO_XYZ else "ProPhoto")
    m_ref_from_proof = aces_from_xyz @ np.linalg.inv(
        np.asarray(gamut_matrix_from_xyz, np.float32))
    m_ref = aces_from_xyz @ to_xyz

    c, h, w = rgb_work.shape
    flat = rgb_work.reshape(3, -1)
    scale = xp.maximum(xp.max(flat), 1e-9)
    proof = (xp.asarray(m_proof) @ flat) / scale
    clipped = xp.clip(proof, 0.0, 1.0)
    ref_round = xp.asarray(m_ref_from_proof.astype(np.float32)) @ clipped
    ref_direct = (xp.asarray(m_ref.astype(np.float32)) @ flat) / scale
    delta = xp.max(xp.abs(ref_round - ref_direct), axis=0)
    return (delta > _DELTA_MATRIX).reshape(h, w)


def gamut_warning_mask_lab(lab_proof_roundtrip, lab_direct, xp=None):
    """CLUT-profile branch: deltaE76 > 5 between the proof round trip and
    the direct Lab values (gamutwarning.cc:108-117)."""
    if xp is None:
        xp = _as_xp(lab_direct)
    d = lab_proof_roundtrip - lab_direct
    de = xp.sqrt(xp.sum(d * d, axis=0))
    return de > 4.9999


def mark_gamut(rgb_encoded01, mask, xp=None):
    """Paint masked pixels cyan, reference mark color (0, 255, 255)."""
    if xp is None:
        xp = _as_xp(rgb_encoded01)
    m = mask[None].astype(rgb_encoded01.dtype)
    cyan = xp.stack([xp.zeros_like(rgb_encoded01[0]),
                     xp.ones_like(rgb_encoded01[0]),
                     xp.ones_like(rgb_encoded01[0])])
    return rgb_encoded01 * (1.0 - m) + cyan * m


def _resolve_profile(name_or_path):
    """Profile spec (preset name or matrix .icc path) -> (rgb_to_xyz,
    trc). LUT-class .icc files raise ValueError (use the Lab branch)."""
    import os

    from art_tpu.color.iccstore import get_instance

    if isinstance(name_or_path, str) \
            and name_or_path.lower().endswith((".icc", ".icm")) \
            and os.path.isfile(name_or_path):
        from art_tpu.color.iccfile import load_icc

        prof = load_icc(name_or_path)
        if prof.get("kind") == "lut":
            raise ValueError("LUT-class proof profiles need the Lab "
                             "branch (gamut_warning_mask_lab)")
        return np.asarray(prof["rgb_to_xyz"], np.float32), prof["trc"]
    info = get_instance().output_profile(name_or_path)
    return np.asarray(info.matrix, np.float32), info.trc


def paint_gamut_warning(out_encoded01, output_profile, proof_profile):
    """Mark pixels of a developed image that fall outside a proof
    profile's gamut (the ART soft-proof preview overlay as a batch
    output: decode the output TRC, run the matrix proof round trip, and
    paint the mask cyan).

    out_encoded01: (3, H, W) encoded output in [0,1] (numpy or jnp);
    output_profile / proof_profile: preset name or matrix .icc path.
    """
    xp = _as_xp(out_encoded01)
    out_mat, out_trc = _resolve_profile(output_profile)
    proof_mat, _ = _resolve_profile(proof_profile)
    lin = cs.decode_trc(out_encoded01, out_trc, xp)
    # linear output RGB -> XYZ -> proof round trip
    c, h, w = out_encoded01.shape
    xyz = xp.asarray(out_mat) @ lin.reshape(3, -1)
    m_proof_from_xyz = np.linalg.inv(proof_mat).astype(np.float32)
    aces = cs.xyz_to_rgb_matrix(
        "ACESp0" if "ACESp0" in cs.MATRICES_RGB_TO_XYZ else "ProPhoto"
    ).astype(np.float32)
    proof = xp.asarray(m_proof_from_xyz) @ xyz
    clipped = xp.clip(proof, 0.0, 1.0)
    ref_round = xp.asarray(aces @ proof_mat) @ clipped
    ref_direct = xp.asarray(aces) @ xyz
    delta = xp.max(xp.abs(ref_round - ref_direct), axis=0)
    mask = (delta > _DELTA_MATRIX).reshape(h, w)
    return mark_gamut(out_encoded01, mask, xp), mask
