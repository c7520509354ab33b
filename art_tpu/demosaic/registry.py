"""Demosaic method registry: name -> callable(cfa, pattern, **kw)."""

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get(name):
    # populate lazily to avoid import cycles
    if not _REGISTRY:
        _populate()
    return _REGISTRY.get(name)


def _populate():
    try:
        from art_tpu.demosaic import rcd  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import amaze  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import lmmse  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import vng4  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import igv  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import dual  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import dcb  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import ahd  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import eahd  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import hphd  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import ppg  # noqa: F401
    except ImportError:
        pass
    try:
        from art_tpu.demosaic import jdl  # noqa: F401
    except ImportError:
        pass
