"""Raw frame model + host decode dispatch.

Reference: ``rtengine/rawimage.{h,cc}`` (RawImage owns the decoded CFA,
levels, matrices, WB) and the dcraw decode boundary. The TPU build decodes
on host (SURVEY §7 decision 2): a `RawFrame` carries everything the device
pipeline needs — the float32 CFA plane plus static metadata.

Formats: DNG (TIFF container, uncompressed/LJ92 via the native C++ decoder
in `art_tpu/io/native`) first; other formats route through external
preconverters (the reference's own escape hatch, imgiomanager.h:73).
Synthetic frames (`synthesize_bayer`) back the test oracle: mosaic a known
RGB image and the pipeline must reconstruct it.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from art_tpu.color import colorspaces as cs

RAW_EXTENSIONS = {
    ".dng", ".nef", ".cr2", ".cr3", ".arw", ".raf", ".orf", ".rw2", ".crw",
    ".pef", ".srw", ".x3f", ".3fr", ".fff", ".iiq", ".mos", ".nrw",
    ".mrw", ".kdc", ".dcr", ".sr2", ".srf", ".erf", ".mef", ".raw",
    ".qtk", ".pxn",
}


def is_raw_file(path) -> bool:
    return os.path.splitext(str(path))[1].lower() in RAW_EXTENSIONS


@dataclasses.dataclass
class RawFrame:
    """Decoded raw frame: CFA plane + static sensor/color metadata."""

    cfa: np.ndarray  # (H, W) raw ADU values, black NOT subtracted;
    # float32, or uint16 when `integral` (native-decoded counts)
    pattern: str | None = "RGGB"  # Bayer 2x2; None for non-mosaic (RGB/mono)
    xtrans: tuple | None = None  # 6x6 nested tuple of 0/1/2 when X-Trans
    black: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.float64))  # per c4 (R,G1,B,G2)
    white: np.ndarray = dataclasses.field(
        default_factory=lambda: np.full(4, 65535.0))
    cam_mul: np.ndarray | None = None  # as-shot WB multipliers (camera RGBG)
    cam_xyz: np.ndarray | None = None  # (3,3) XYZ(D65) -> camera matrix
    iso: float = 100.0
    baseline_exposure: float = 0.0  # EV (DNG BaselineExposure)
    make: str = ""
    model: str = ""
    exif: dict = dataclasses.field(default_factory=dict)
    filename: str = ""
    # non-raw passthrough: (3,H,W) float32 0..65535 already-demosaiced data
    rgb: np.ndarray | None = None
    # pixel-shift: the 3 additional frames (3,H,W), same ADU domain as cfa
    extra_frames: np.ndarray | None = None
    # cfa values are u16-exact (decoded from integer counts): the device
    # transfer may narrow to uint16 (develop.transfer_array)
    integral: bool = False

    @property
    def is_raw(self):
        return self.rgb is None

    @property
    def shape(self):
        return self.cfa.shape if self.rgb is None else self.rgb.shape[1:]

    # -- derived color data (dcraw cam_xyz_coeff equivalent) ---------------

    def color_matrices(self):
        """Return (rgb_cam, cam_rgb, pre_mul_d65).

        Mirrors dcraw's ``cam_xyz_coeff``: rows of cam_xyz @ xyz_srgb are
        normalized so camera white (1,1,1)_sRGB maps to 1 per channel; the
        row norms give the D65 pre-multiplier estimate; rgb_cam is the
        pseudo-inverse mapping camera -> linear sRGB(D65).
        """
        if self.cam_xyz is None:
            eye = np.eye(3)
            return eye, eye, np.ones(3)
        cam_rgb = self.cam_xyz @ cs.XYZ_FROM_SRGB_D65
        sums = cam_rgb.sum(axis=1, keepdims=True)
        sums[sums == 0] = 1.0
        cam_rgb = cam_rgb / sums
        pre_mul = 1.0 / sums[:, 0]
        rgb_cam = np.linalg.pinv(cam_rgb)
        return rgb_cam, cam_rgb, pre_mul

    def pre_mul(self):
        """Reference pre-multipliers: as-shot cam_mul if valid, else the
        matrix-derived D65 estimate (dcraw scale_colors semantics)."""
        if self.cam_mul is not None and np.all(np.asarray(self.cam_mul)[:3] > 0):
            m = np.asarray(self.cam_mul, dtype=np.float64)
            out = np.ones(4)
            out[: min(4, m.size)] = m[:4]
            if m.size < 4 or out[3] == 0:
                out[3] = out[1]
            return out
        _, _, pm = self.color_matrices()
        return np.array([pm[0], pm[1], pm[2], pm[1]])

    def camera_wb_mults(self):
        """As-shot ("Camera") WB in the ColorTemp multiplier convention.

        Reference: rawimagesource.cc:1376-1382 — camwb = get_pre_mul /
        pre_mul == (1,1,1), mapped through rgb_cam. Since cam_rgb rows are
        normalized to sum 1, rgb_cam @ (1,1,1) == (1,1,1): camera WB is the
        identity in this convention (scaleColors bakes the actual gains).
        """
        rgb_cam, _, _ = self.color_matrices()
        v = rgb_cam @ np.ones(3)
        if v[1] <= 0:
            return np.ones(3)
        return np.array([v[0] / v[1], 1.0, v[2] / v[1]])


# ---------------------------------------------------------------------------
# synthetic frames (test oracle)
# ---------------------------------------------------------------------------

def synthesize_bayer(rgb01, pattern="RGGB", black=512.0, white=16383.0,
                     cam_mul=(2.0, 1.0, 1.5), noise=0.0, seed=0):
    """Mosaic a linear-sRGB [0,1] image into a synthetic Bayer RawFrame.

    The inverse of the pipeline: channel / wb-multiplier scaling, then CFA
    sampling, then black/white level encoding. An identity camera matrix is
    used so the develop chain should reproduce `rgb01` up to demosaic error.
    """
    rgb01 = np.asarray(rgb01, dtype=np.float64)
    assert rgb01.ndim == 3 and rgb01.shape[0] == 3
    _, h, w = rgb01.shape
    cam_mul = np.asarray(cam_mul, dtype=np.float64)
    # camera records the scene divided by the WB gain
    sensor = rgb01 / cam_mul[:, None, None]
    from art_tpu.core.image import bayer_color_index

    cidx = bayer_color_index(pattern, (h, w))
    mosaic = np.take_along_axis(
        sensor.reshape(3, -1), cidx.reshape(1, -1), axis=0
    ).reshape(h, w)
    adu = mosaic * (white - black) + black
    if noise > 0:
        rng = np.random.default_rng(seed)
        adu = adu + rng.normal(0.0, noise, size=adu.shape)
    adu = np.clip(adu, 0, white)
    return RawFrame(
        cfa=adu.astype(np.float32),
        pattern=pattern,
        black=np.full(4, float(black)),
        white=np.full(4, float(white)),
        cam_mul=np.array([cam_mul[0], cam_mul[1], cam_mul[2], cam_mul[1]]),
        cam_xyz=None,  # identity camera
        make="ART-TPU", model="Synthetic",
        filename="<synthetic>",
    )


# canonical Fuji X-Trans pattern (dcraw ordering, 0=R 1=G 2=B)
XTRANS_CANONICAL = (
    (1, 1, 0, 1, 1, 2),
    (1, 1, 2, 1, 1, 0),
    (2, 0, 1, 0, 2, 1),
    (1, 1, 2, 1, 1, 0),
    (1, 1, 0, 1, 1, 2),
    (0, 2, 1, 2, 0, 1),
)


def synthesize_xtrans(rgb01, black=512.0, white=16383.0,
                      cam_mul=(2.0, 1.0, 1.5), pattern=XTRANS_CANONICAL):
    """X-Trans companion to synthesize_bayer."""
    rgb01 = np.asarray(rgb01, dtype=np.float64)
    _, h, w = rgb01.shape
    cam_mul = np.asarray(cam_mul, dtype=np.float64)
    sensor = rgb01 / cam_mul[:, None, None]
    from art_tpu.core.image import xtrans_color_index

    cidx = xtrans_color_index(pattern, (h, w))
    mosaic = np.take_along_axis(
        sensor.reshape(3, -1), cidx.reshape(1, -1), axis=0
    ).reshape(h, w)
    adu = np.clip(mosaic * (white - black) + black, 0, white)
    return RawFrame(
        cfa=adu.astype(np.float32),
        pattern=None,
        xtrans=pattern,
        black=np.full(4, float(black)),
        white=np.full(4, float(white)),
        cam_mul=np.array([cam_mul[0], cam_mul[1], cam_mul[2], cam_mul[1]]),
        cam_xyz=None,
        make="ART-TPU", model="SyntheticXT",
        filename="<synthetic-xtrans>",
    )


def load_raw(path) -> RawFrame:
    """Decode a raw file on host. DNG/CR2/NEF/RAF via the native decoder;
    others via registered external preconverters (imgiomanager
    semantics). Native formats: DNG, CR2, NEF, classic RAF, ARW."""
    from art_tpu.io import dng

    ext = os.path.splitext(str(path))[1].lower()
    if ext in (".dng", ".cr2", ".cr3", ".raf", ".nef", ".arw", ".rw2",
               ".pef", ".orf", ".srw", ".mrw", ".3fr", ".iiq", ".x3f",
               ".crw", ".dcr", ".kdc", ".qtk", ".pxn"):
        frame = dng.load_dng(path)
        # RW2 carries per-channel blacks in its tags; the camconst value
        # is an additional pedestal (dcraw merges `black` into cblack)
        _apply_camconst_levels(frame, black_add=(ext == ".rw2"))
        if ext != ".raf":
            try:
                from art_tpu.io.metadata import harvest

                tags, _ = harvest(path)
                frame.exif.update(tags)
            except Exception:
                pass
        return frame
    # external preconverter hook (imgiomanager.cc loadRaw :510)
    from art_tpu.io.iomanager import get_instance

    dng_path = get_instance().preconvert_raw(path)
    if dng_path:
        frame = dng.load_dng(dng_path)
        frame.filename = str(path)
        _apply_camconst_levels(frame)
        return frame
    raise NotImplementedError(
        f"raw format {ext} not natively decoded yet; convert to DNG or "
        "register an external preconverter"
    )


def _apply_camconst_levels(frame: RawFrame, black_add=False):
    """Override container levels with camconst per-ISO data when present
    (reference: camconst.cc get_Levels consulted by RawImage::get_*level).
    black_add: treat the camconst black as a pedestal added to the
    container's per-channel blacks (Panasonic RW2 semantics)."""
    try:
        from art_tpu.raw.camconst import get_instance

        cc = get_instance().get(frame.make, frame.model)
    except Exception:
        return
    if cc is None:
        return
    wl = cc.white_levels(int(frame.iso))
    if wl is not None:
        frame.white = np.asarray(wl, dtype=np.float64)
    bl = cc.black_levels(int(frame.iso))
    if bl is not None and np.any(np.asarray(bl) > 0):
        if black_add:
            frame.black = frame.black + np.asarray(bl, dtype=np.float64)
        else:
            frame.black = np.asarray(bl, dtype=np.float64)
    if frame.cam_xyz is None:
        m = cc.dcraw_matrix()
        if m and len(m) >= 9:
            frame.cam_xyz = np.asarray(m[:9], dtype=np.float64).reshape(3, 3)
            if np.abs(frame.cam_xyz).max() > 10:  # dcraw x10000 convention
                frame.cam_xyz = frame.cam_xyz / 10000.0


def synthesize_pixelshift(rgb01, pattern="RGGB", black=512.0, white=16383.0,
                          cam_mul=(2.0, 1.0, 1.5)):
    """Four pixel-shift frames of a scene (the reference's Pentax/Sony
    4-frame grid): frame k records the channel selected by the CFA
    displaced by demosaic.pixelshift.OFFSETS[k]."""
    from art_tpu.core.image import bayer_color_index
    from art_tpu.demosaic.pixelshift import OFFSETS

    rgb01 = np.asarray(rgb01, dtype=np.float64)
    _, h, w = rgb01.shape
    cam_mul = np.asarray(cam_mul, dtype=np.float64)
    sensor = rgb01 / cam_mul[:, None, None]
    frames = []
    for dy, dx in OFFSETS:
        cidx = np.roll(np.roll(
            np.asarray(bayer_color_index(pattern, (h, w))), -dy, 0), -dx, 1)
        mosaic = np.take_along_axis(
            sensor.reshape(3, -1), cidx.reshape(1, -1), axis=0
        ).reshape(h, w)
        frames.append(np.clip(mosaic * (white - black) + black, 0, white))
    base = RawFrame(
        cfa=frames[0].astype(np.float32),
        pattern=pattern,
        black=np.full(4, float(black)),
        white=np.full(4, float(white)),
        cam_mul=np.array([cam_mul[0], cam_mul[1], cam_mul[2], cam_mul[1]]),
        make="ART-TPU", model="SyntheticPS",
        filename="<synthetic-pixelshift>",
        extra_frames=np.stack(frames[1:]).astype(np.float32),
    )
    return base
