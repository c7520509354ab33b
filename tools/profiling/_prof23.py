import time
import jax, jax.numpy as jnp, numpy as np
from art_tpu.demosaic.amaze import amaze_demosaic
from art_tpu.demosaic.amaze_pallas import amaze_pallas
from art_tpu.core.image import bayer_color_index

# correctness: pallas vs whole-plane XLA amaze on a synthetic mosaic
rng = np.random.default_rng(0)
h, w = 1024, 4096
base = rng.uniform(0.05, 0.95, size=(3, h // 8, w // 8))
import cv2
rgb = np.stack([cv2.resize(base[c], (w, h), interpolation=cv2.INTER_CUBIC)
                for c in range(3)])
rgb = np.clip(rgb, 0, 1) * 60000.0
cidx = bayer_color_index("RGGB", (h, w))
cfa = np.take_along_axis(rgb.reshape(3, -1), cidx.reshape(1, -1),
                         axis=0).reshape(h, w).astype(np.float32)
cfa_d = jax.device_put(cfa)

pal = np.asarray(amaze_pallas(cfa_d, "RGGB", 60000.0, 60000.0 * 0.8))
import art_tpu.demosaic.amaze as am
ref = np.asarray(jax.jit(lambda c: am.amaze_demosaic(
    c, "RGGB", clip_pt=60000.0, clip_pt8=60000.0 * 0.8,
    use_pallas=False))(cfa_d))
inner = (slice(None), slice(32, -32), slice(32, -32))
d = np.abs(pal[inner] - ref[inner])
print("pallas-vs-xla amaze: max", d.max(), "mean", d.mean())

# perf: 24MP
H, W = 4096, 6144
big = jax.device_put(rng.uniform(100, 60000, size=(H, W)).astype(np.float32))
fn = jax.jit(lambda c: amaze_pallas(c, "RGGB", 65535.0, 65535.0 * 0.8))
out = fn(big); np.asarray(out.ravel()[:1])
t0 = time.time(); n = 20
for _ in range(n):
    out = fn(big)
np.asarray(out.ravel()[:1])
print(f"amaze_pallas 24MP: {(time.time()-t0)/n*1000:.2f} ms")
