"""ICC store: working/output colorspace registry.

Reference: ``rtengine/iccstore.cc`` (lcms2-backed). The TPU build has no
lcms; instead every colorspace is reduced at plan time to a (3x3 matrix,
TRC) pair — exactly the reference's own fast path in ``iprgb2out.cc``
(matrix+TRC output transform) — and full ICC profiles are parsed/generated
by :mod:`art_tpu.color.iccfile` when files are involved.

Default working space is Rec2020 (iccstore.cc:366).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from art_tpu.color import colorspaces as cs


@dataclasses.dataclass(frozen=True)
class ProfileInfo:
    """A colorspace as the device sees it: primaries matrix + transfer curve."""

    name: str
    rgb_to_xyz: tuple  # nested tuples so the dataclass stays hashable
    trc: tuple  # ("srgb"|"gamma"|"linear", param)

    @property
    def matrix(self) -> np.ndarray:
        return np.array(self.rgb_to_xyz, dtype=np.float64)

    @property
    def inverse_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.matrix)


class ICCStore:
    def __init__(self):
        self._profiles: dict[str, ProfileInfo] = {}
        for name, mat in cs.MATRICES_RGB_TO_XYZ.items():
            trc = cs.OUTPUT_GAMMAS.get(name, ("srgb", None))
            self._profiles[name] = ProfileInfo(
                name=name,
                rgb_to_xyz=tuple(map(tuple, mat.tolist())),
                trc=trc,
            )
        # linear variants used as working spaces
        for name, mat in cs.MATRICES_RGB_TO_XYZ.items():
            lname = name + "-linear"
            self._profiles[lname] = ProfileInfo(
                name=lname,
                rgb_to_xyz=tuple(map(tuple, mat.tolist())),
                trc=("linear", None),
            )

    def working_space(self, name: str) -> ProfileInfo:
        """Working spaces are always linear regardless of the display TRC."""
        base = name.removesuffix("-linear")
        if base not in cs.MATRICES_RGB_TO_XYZ:
            base = "Rec2020"
        return self._profiles[base + "-linear"]

    def output_profile(self, name: str | None) -> ProfileInfo:
        if not name or name not in self._profiles:
            name = "sRGB"
        return self._profiles[name]

    def working_space_names(self):
        return list(cs.WORKING_SPACES)


_instance: ICCStore | None = None


def get_instance() -> ICCStore:
    global _instance
    if _instance is None:
        _instance = ICCStore()
    return _instance
