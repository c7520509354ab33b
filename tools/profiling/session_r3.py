"""One chip session: amaze stage timings + tonecurve tile sweep + base
isolation (minimal config). Batching amortizes the ~40s/program compile
cost of the axon tunnel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()


def main():
    print("== base isolation ==", flush=True)
    import numpy as np

    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from tools.profiling.ablate import time_config

    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    del rgb
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    print(f"minimal (scale+bilinear+matrices) {time_config(frame, pp):8.2f}"
          " ms", flush=True)

    print("== tonecurve tile sweep ==", flush=True)
    import tools.profiling.tc_sweep as tcs

    tcs.main()

    print("== amaze stages ==", flush=True)
    import tools.profiling.amaze_prof as ap

    ap.main()


if __name__ == "__main__":
    main()
