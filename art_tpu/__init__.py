"""ART-TPU: a TPU-native raw photo development framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of artpixls/ART's
rtengine (reference layer map in SURVEY.md, design in ARCHITECTURE.md).

Public surface (mirrors the reference's headless path,
``rtengine/rtengine.h:550-626``):

- :func:`art_tpu.init` — global bring-up (profile store, ICC store, camconst).
- :func:`art_tpu.load_image` — host decode of a raw/non-raw file.
- :func:`art_tpu.process_image` — full develop chain on device.
- :mod:`art_tpu.parallel` — batch queue sharded over a TPU mesh.
- ``python -m art_tpu.cli`` — ART-cli compatible front end.
"""

__version__ = "0.1.0"

from art_tpu.settings import Settings, settings  # noqa: F401


def init(base_dir=None, user_settings_dir=None):
    """Global engine bring-up (reference: ``rtengine::init`` init.cc:59).

    Idempotent; loads bundled working-space data, camera constants and the
    profile store, plus user-directory state when ``user_settings_dir`` is
    given (camconst overrides, dark-frame/flat-field indexes, external
    image IO configs — the init.cc:76-140 parallel sections). Cheap
    compared to the reference because heavyweight state (LUTs, matrices)
    is built lazily by the pipeline planner.
    """
    import os

    from art_tpu.color import iccstore
    from art_tpu.raw import camconst
    from art_tpu.settings import settings

    if user_settings_dir:
        settings.user_dir = str(user_settings_dir)
        from art_tpu.io import iomanager
        from art_tpu.raw import dfff_managers

        dfff_managers.reset()
        iomanager.reset()

    iccstore.get_instance()
    cc = camconst.get_instance()
    # bundled camera DB (camconst.cc + init.cc:100-110: the store must be
    # populated out of the box; user files below override entries)
    bundled = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "camconst.json")
    if not cc.loaded_bundled and os.path.isfile(bundled):
        try:
            cc.load_json(bundled)
            cc.loaded_bundled = True
        except (OSError, ValueError):
            pass
    if settings.user_dir:
        user_cc = os.path.join(settings.user_dir, "camconst.json")
        if os.path.isfile(user_cc):
            try:
                cc.load_json(user_cc)
            except (OSError, ValueError):
                pass


def load_image(path):
    from art_tpu.io import load_image as _load

    return _load(path)


def process_image(path_or_image, params, fast=False):
    from art_tpu.pipeline import process_image as _process

    return _process(path_or_image, params, fast=fast)


def thumbnail(path, params=None, max_px=256):
    """Thumbnail as (3, H, W) float [0,1] (rtengine Thumbnail role,
    SURVEY 2.1): the embedded JPEG preview when one exists, else a
    fast-pipeline develop resized so max(H, W) <= max_px."""
    import numpy as np

    from art_tpu.io.metadata import embedded_thumb

    thumb = embedded_thumb(path)
    if thumb is None:
        from art_tpu.params import ProcParams
        from art_tpu.pipeline import process_image as _process

        pp = params or ProcParams()
        thumb = np.asarray(_process(path, pp, fast=True), np.float32)
    c, h, w = thumb.shape
    step = max(1, int(np.ceil(max(h, w) / float(max_px))))
    if step > 1:
        thumb = thumb[:, ::step, ::step]
    return thumb
