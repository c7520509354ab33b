"""Color science: curves, colorspaces, CIECAM02, white balance, LUTs.

TPU-era split of the reference's ``rtengine/color.{h,cc}`` / ``curves.cc`` /
``iccstore.cc``: heavyweight interpretation (spline fitting, matrix algebra,
profile parsing) runs on host at plan time; the device only ever sees
matrices and dense LUT arrays.
"""

from art_tpu.color import colorspaces, curves  # noqa: F401
