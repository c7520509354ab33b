import time
import jax, jax.numpy as jnp, numpy as np
from art_tpu.color.jzazbz import _pq, _pq_inv

H, W = 4096, 6144
x = jax.device_put((np.random.rand(H, W).astype(np.float32) * 1.2))

def timeit(name, g, *a, n=20):
    out = g(*a); np.asarray(out.ravel()[:1])
    t0 = time.time()
    for _ in range(n): out = g(*a)
    np.asarray(out.ravel()[:1])
    print(f"{name:44s} {(time.time()-t0)/n*1000:8.3f} ms")

timeit("_pq 1 plane", jax.jit(_pq), x)
timeit("_pq_inv 1 plane", jax.jit(lambda v: _pq_inv(v * 0.2)), x)
timeit("pow(x, 0.159)", jax.jit(lambda v: jnp.power(v, 0.159)), x)
timeit("exp2(x)", jax.jit(lambda v: jnp.exp2(v)), x)
timeit("log2(x)", jax.jit(lambda v: jnp.log2(jnp.maximum(v, 1e-10))), x)
timeit("atan2", jax.jit(lambda v: jnp.arctan2(v, 1.0 - v)), x)
timeit("sqrt x3", jax.jit(lambda v: jnp.sqrt(jnp.sqrt(jnp.sqrt(v)))), x)

def cheb(v, deg):
    t = 2.0 * jnp.sqrt(jnp.sqrt(jnp.sqrt(v))) - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(t); b2 = jnp.zeros_like(t)
    c = np.random.rand(deg).astype(np.float32)
    for kk in range(deg - 1, 0, -1):
        b1, b2 = c[kk] + t2 * b1 - b2, b1
    return c[0] + t * b1 - b2
timeit("cheb deg16 (warp x^1/8)", jax.jit(lambda v: cheb(v, 16)), x)
timeit("cheb deg24 (warp x^1/8)", jax.jit(lambda v: cheb(v, 24)), x)
timeit("cheb deg32 (warp x^1/8)", jax.jit(lambda v: cheb(v, 32)), x)
