import time
import jax, jax.numpy as jnp, numpy as np
from art_tpu.params import ProcParams
from art_tpu.ops import tonecurve as tc_mod
from art_tpu.ops.tonecurve_neutral import apply_neutral, _mat3, _gauss
from art_tpu.color import jzazbz
from art_tpu.core.curve1d import eval_curve
from art_tpu.core.image import MAXVAL

pp = ProcParams()
pp.apply_arp_text(open("/root/reference/rtdata/profiles/Standard Film Curve.arp").read())
ctx = {"working_profile": "Rec2020"}
planned = tc_mod.plan(pp, ctx)
static, data = planned
data = jax.device_put(data)
H, W = 4000, 6000
rgb = jax.device_put((np.random.rand(3, H, W) * 60000).astype(np.float32))

def timeit(name, g, *a):
    out = g(*a); jax.tree_util.tree_map(lambda v: np.asarray(v.ravel()[:1]), out)
    t0 = time.time(); n=10
    for _ in range(n): out = g(*a)
    jax.tree_util.tree_map(lambda v: np.asarray(v.ravel()[:1]), out)
    print(f"{name:44s} {(time.time()-t0)/n*1000:8.2f} ms")

timeit("apply_neutral full", jax.jit(lambda r, d: apply_neutral(r, d, static)), rgb, data)
timeit("rgb_to_jzczhz", jax.jit(lambda r, d: jzazbz.rgb_to_jzczhz(r[0]/MAXVAL, r[1]/MAXVAL, r[2]/MAXVAL, d["ws"])), rgb, data)
timeit("jz fwd (no hue)", jax.jit(lambda r, d: jzazbz.xyz_to_jzazbz(r[0]/MAXVAL, r[1]/MAXVAL, r[2]/MAXVAL)), rgb, data)
timeit("jzczhz_to_rgb", jax.jit(lambda r, d: jzazbz.jzczhz_to_rgb(r[0]/MAXVAL, r[1]/MAXVAL*0.1, r[2]/MAXVAL, d["iws"])), rgb, data)
timeit("eval_curve 3pl", jax.jit(lambda r, d: eval_curve(r, d["coeffs"])), rgb, data)
timeit("gamut compress-ish", jax.jit(lambda r, d: _mat3(d["to_out"], r)), rgb, data)
