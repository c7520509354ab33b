import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 4096, 6144
xf = jax.device_put(np.random.rand(H, W).astype(np.float32))

def timeit(name, g, *a):
    out = g(*a); np.asarray(out.ravel()[:1])
    t0 = time.time(); n=20
    for _ in range(n): out = g(*a)
    np.asarray(out.ravel()[:1])
    print(f"{name:40s} {(time.time()-t0)/n*1000:8.3f} ms")

def rollsA(x):
    acc = x
    for i in range(20): acc = acc + jnp.roll(x, i+1, axis=0)
    return acc
def rollsB(x):
    acc = x
    for i in range(20): acc = acc + jnp.roll(x, i+1, axis=1)
    return acc
timeit("20 row rolls (axis0)", jax.jit(rollsA), xf)
timeit("20 col rolls (axis1)", jax.jit(rollsB), xf)

# pallas: value-roll vs scratch offset loads, 20 col taps
TY, TX, P = 256, 1024, 64
def k_roll(x_hbm, o_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(i*TY, TY+2*P), pl.ds(j*TX, TX+2*P)], win, sem)
    c.start(); c.wait()
    x = win[:]
    acc = x
    for d in range(20):
        acc = acc + jnp.roll(x, d+1, axis=1)
    o_ref[:] = acc[P:P+TY, P:P+TX]
def k_load(x_hbm, o_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(i*TY, TY+2*P), pl.ds(j*TX, TX+2*P)], win, sem)
    c.start(); c.wait()
    acc = win[P:P+TY, P:P+TX]
    for d in range(20):
        acc = acc + win[P:P+TY, P-d-1:P-d-1+TX]
    o_ref[:] = acc
def mk(kern):
    @jax.jit
    def go(x):
        xp = jnp.pad(x, P, mode="reflect")
        return pl.pallas_call(
            kern, grid=(H//TY, W//TX),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TY, TX), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), x.dtype),
            scratch_shapes=[pltpu.VMEM((TY+2*P, TX+2*P), jnp.float32), pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024),
        )(xp)
    return go
timeit("pallas 20 col value-rolls", mk(k_roll), xf)
timeit("pallas 20 col ref-loads", mk(k_load), xf)

def k_roll_r(x_hbm, o_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(i*TY, TY+2*P), pl.ds(j*TX, TX+2*P)], win, sem)
    c.start(); c.wait()
    x = win[:]
    acc = x
    for d in range(20):
        acc = acc + jnp.roll(x, d+1, axis=0)
    o_ref[:] = acc[P:P+TY, P:P+TX]
def k_load_r(x_hbm, o_ref, win, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    c = pltpu.make_async_copy(x_hbm.at[pl.ds(i*TY, TY+2*P), pl.ds(j*TX, TX+2*P)], win, sem)
    c.start(); c.wait()
    acc = win[P:P+TY, P:P+TX]
    for d in range(20):
        acc = acc + win[P-d-1:P-d-1+TY, P:P+TX]
    o_ref[:] = acc
timeit("pallas 20 row value-rolls", mk(k_roll_r), xf)
timeit("pallas 20 row ref-loads", mk(k_load_r), xf)
