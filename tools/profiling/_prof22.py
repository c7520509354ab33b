import time
import jax, numpy as np, jax.numpy as jnp
from art_tpu.params import ProcParams
from art_tpu.ops import tonecurve as tc_mod

pp = ProcParams()
pp.apply_arp_text(open("/root/reference/rtdata/profiles/Standard Film Curve.arp").read())
static, data = tc_mod.plan(pp, {"working_profile": "Rec2020"})
data = jax.device_put(data)
H, W = 4096, 6144
rgb = jax.device_put((np.random.rand(3, H, W) * 60000).astype(np.float32))

def timeit(name, g, *a, n=20):
    out = g(*a); np.asarray(out.ravel()[:1])
    t0 = time.time()
    for _ in range(n): out = g(*a)
    np.asarray(out.ravel()[:1])
    print(f"{name:44s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

from art_tpu.ops.tonecurve_neutral import apply_neutral
timeit("apply_neutral (pallas)", jax.jit(lambda r, d: apply_neutral(r, d, static)), rgb, data)
