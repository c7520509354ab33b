import time
import jax, jax.numpy as jnp, numpy as np
H, W = 4096, 6144
xf = jax.device_put(np.random.rand(H, W).astype(np.float32))
xb = jax.device_put(np.random.rand(H, W).astype(np.float32).astype(jnp.bfloat16))

def timeit(name, g, *a):
    out = g(*a); np.asarray(out.ravel()[:1])
    t0 = time.time(); n=20
    for _ in range(n): out = g(*a)
    np.asarray(out.ravel()[:1])
    print(f"{name:36s} {(time.time()-t0)/n*1000:8.3f} ms")

def chain100(x):
    for i in range(100): x = x * 1.0001 + 0.01
    return x
def rolls20(x):
    acc = x
    for i in range(10):
        acc = acc + jnp.roll(x, i+1, axis=1) * 0.1
        acc = acc + jnp.roll(x, -(i+1), axis=0) * 0.1
    return acc
timeit("f32 100 muladd", jax.jit(chain100), xf)
timeit("bf16 100 muladd", jax.jit(chain100), xb)
timeit("f32 20 rolls", jax.jit(rolls20), xf)
timeit("bf16 20 rolls", jax.jit(rolls20), xb)
def divs20(x):
    acc = x
    for i in range(20): acc = acc / (x + float(i+1))
    return acc
timeit("f32 20 div", jax.jit(divs20), xf)
timeit("bf16 20 div", jax.jit(divs20), xb)
def wheres40(x):
    acc = x
    for i in range(40): acc = jnp.where(acc > float(i)*0.01, acc * 0.999, acc)
    return acc
timeit("f32 40 where", jax.jit(wheres40), xf)
timeit("bf16 40 where", jax.jit(wheres40), xb)
