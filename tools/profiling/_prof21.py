import dataclasses, time
import jax, numpy as np
from art_tpu.core.image import pad_to_multiple
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.params import ProcParams
from art_tpu.pipeline.develop import plan, _executor
from art_tpu.settings import settings

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

def timeit(name, cfg, n=15):
    run = _executor(cfg)
    out = run(inp, data); np.asarray(out.ravel()[:2])
    t0 = time.time()
    for _ in range(n): out = run(inp, data)
    np.asarray(out.ravel()[:2])
    print(f"{name:46s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

nosteps = dataclasses.replace(config, steps=(), hl_mode="Off")
timeit("demosaic+scale+wb+colorspaces only", nosteps)
timeit("  ... with bilinear demosaic", dataclasses.replace(nosteps, demosaic_method="bilinear"))
timeit("full", config)
