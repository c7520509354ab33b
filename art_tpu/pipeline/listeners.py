"""Progress/error listener surface (reference: rtengine.h:150-166
`ProgressListener` — setProgress / setProgressStr / setProgressState /
error; milestones fired through simpleprocess.cc:117-486).

The device pipeline is one compiled program, so the reference's 23
per-step callbacks collapse to phase milestones around it; the phase
set mirrors simpleprocess' stage_init / stage_denoise+transform (device)
/ stage_finish (encode) granularity.
"""

from __future__ import annotations


class ProgressListener:
    """Subclass and override; all methods optional no-ops."""

    def set_progress(self, pct: float) -> None:  # 0..1
        pass

    def set_progress_str(self, msg: str) -> None:
        pass

    def error(self, msg: str) -> None:
        pass


class CallbackListener(ProgressListener):
    """Adapter: wrap plain callables."""

    def __init__(self, on_progress=None, on_message=None, on_error=None):
        self._p = on_progress
        self._m = on_message
        self._e = on_error

    def set_progress(self, pct):
        if self._p:
            self._p(pct)

    def set_progress_str(self, msg):
        if self._m:
            self._m(msg)

    def error(self, msg):
        if self._e:
            self._e(msg)


# phase -> progress fraction at completion (decode -> device -> save),
# matching the reference's fixed milestones (simpleprocess.cc:117,294,
# 352,486)
PHASES = (("decode", 0.20), ("develop", 0.75), ("gamut", 0.80),
          ("save", 1.0))


def notify(listener, phase):
    if listener is None:
        return
    for name, pct in PHASES:
        if name == phase:
            listener.set_progress_str(phase)
            listener.set_progress(pct)
            return
