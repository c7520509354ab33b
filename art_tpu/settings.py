"""Engine settings (reference: ``rtengine/settings.h:29-96``).

The reference keeps a global ``Settings`` object configured by the embedding
app; we keep a small dataclass singleton. Only fields that affect the
headless pipeline are carried over; GUI/monitor fields are omitted.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Settings:
    verbose: bool = False
    # Output/working colorspace defaults (reference iccstore.cc:366 defaults
    # the working profile to Rec2020; output default is sRGB).
    srgb_output: str = "sRGB"
    working_profile: str = "Rec2020"
    # Host threads used for decode/encode overlap (reference sizes its
    # ThreadPool to nproc-1, init.cc:66-73).
    host_threads: int = max(1, (os.cpu_count() or 2) - 1)
    # Directory with user camconst overrides, dark frames, flat fields.
    user_dir: str | None = None
    # Auto-select scan roots (reference dfmanager/ffmanager dir options);
    # default to <user_dir>/darkframes and <user_dir>/flatfields
    dark_frames_dir: str | None = None
    flat_fields_dir: str | None = None
    # Pad images to multiples of this tile edge before jit (ARCHITECTURE.md:
    # bucket-and-pad keeps the jit cache small; 128 matches lane width).
    pad_multiple: int = 128
    # Images developed per device per dispatch in the batch queue (an
    # in-program lax.map chain; amortizes the fixed per-execute dispatch
    # cost — ~2.2ms over the axon tunnel, tools/profiling/microbw.py).
    # Partial groups are padded by repeating the last frame, so very
    # small catalogs waste compute above 1.
    device_batch: int = 4
    # XMP sidecar naming (settings.h XmpSidecarStyle): "std" = file.xmp,
    # "ext" = file.raw.xmp
    xmp_sidecar_style: str = "std"
    # lensfun XML database directory (rtlensfun.cc LFDatabase::init's
    # lensfunDbDirectory option); None = lensfun corrections disabled
    lensfun_db_dir: str | None = None
    # directory for CTL scripts / HaldCLUTs (options.clutsDir)
    cluts_dir: str | None = None
    # exiftool binary for deep makernote preservation on output
    # (settings.h:75 exiftool_path; metadata.cc embed path). The native
    # EXIF tunnel always runs; exiftool additionally copies proprietary
    # makernote blocks when the binary exists.
    exiftool_path: str = "exiftool"
    # Fold the raw head (WB+cam2work) and rgb2out tail passes into the
    # adjacent Pallas kernels on the default pipeline (perf; False keeps
    # every pass a separate XLA program region — used by parity tests)
    fuse_passes: bool = True


settings = Settings()
