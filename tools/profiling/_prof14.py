import time
import jax, jax.numpy as jnp, numpy as np
from art_tpu.ops.wavelet_pallas import wavelet_denoise_pallas
from art_tpu.ops.wavelet import mad_sigma, _sep_blur, _B3

H, W = 4096, 6144
x = jax.device_put(np.random.rand(H, W).astype(np.float32))

def timeit(name, g, *a, n=10):
    out = g(*a); jax.tree_util.tree_map(lambda v: np.asarray(v.ravel()[:1]), out)
    t0 = time.time()
    for _ in range(n): out = g(*a)
    jax.tree_util.tree_map(lambda v: np.asarray(v.ravel()[:1]), out)
    print(f"{name:40s} {(time.time()-t0)/n*1000:8.2f} ms")

def prelude(x):
    crop = x[1536:2560, 2560:3584]
    fine = crop - _sep_blur(crop, _B3, 1)
    return mad_sigma(fine)
timeit("MAD prelude (1024^2 crop)", jax.jit(prelude), x)
timeit("wavelet kernel 1 plane", jax.jit(lambda x: wavelet_denoise_pallas(x, 0.01, 1.0, 0.1)), x)
def full3(x):
    return [wavelet_denoise_pallas(x, prelude(x), 1.0, 0.1) for _ in range(3)]
timeit("3x (prelude+kernel)", jax.jit(full3), x)
