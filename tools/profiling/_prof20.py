import time
import jax, numpy as np
from art_tpu.core.image import pad_to_multiple
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import plan, _executor
from art_tpu.settings import settings
from art_tpu.color import jzazbz

h, w = 4000, 6000
rng = np.random.default_rng(0)
rgbf = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
frame = synthesize_bayer(rgbf, pattern="RGGB")
pp = ProcParams()
pp.apply_arp_text(open("/root/reference/rtdata/profiles/Standard Film Curve.arp").read())
pp.raw.bayer.method = "amaze"
pp.denoise.enabled = True
pp.denoise.luminance = 20.0
pp.denoise.chrominance = 20.0
config, data = plan(frame, pp)
inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
inp = jax.device_put(inp); data = jax.device_put(data)

def timeit(name, n=20):
    _executor.cache_clear()
    run = _executor(config)
    out = run(inp, data); np.asarray(out.ravel()[:2])
    t0 = time.time()
    for _ in range(n): out = run(inp, data)
    np.asarray(out.ravel()[:2])
    print(f"{name:46s} {(time.time()-t0)/n*1000:8.2f} ms")

timeit("full (fast PQ)")
jzazbz._pq, jzazbz._pq_inv = jzazbz._pq_exact, jzazbz._pq_inv_exact
timeit("full (exact pow PQ)")
