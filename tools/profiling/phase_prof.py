"""Per-phase 24MP timings for the bench config (run on the real chip)."""
import os
import sys
import time

# repo root on sys.path (PYTHONPATH breaks the axon jax-plugin discovery)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from art_tpu.core import compilecache

compilecache.enable()

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    # tiny-slice readback: block_until_ready does not reliably fence on
    # the axon tunnel, and a full np.asarray would ship 72MB through it
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 2),) if leaf.ndim else ()
    np.asarray(leaf[idx] if leaf.ndim else leaf)


def timeit(name, fn, *args, n=10):
    _fence(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    import os

    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _build_run, plan
    from art_tpu.settings import settings

    h, w = 4000, 6000
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, h, w)).astype(np.float32)
    frame = synthesize_bayer(rgb, pattern="RGGB")
    del rgb

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    arp = os.path.join(repo, "art_tpu", "data", "profiles",
                       "Standard Film Curve.arp")

    def make_pp():
        pp = ProcParams()
        pp.apply_arp_text(open(arp).read())
        pp.raw.bayer.method = "amaze"
        pp.denoise.enabled = True
        pp.denoise.luminance = 20.0
        pp.denoise.chrominance = 20.0
        return pp

    pp = make_pp()
    config, data = plan(frame, pp)
    print("steps:", [(s[0], s[2]) for s in config.steps])
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)
    inp = jax.device_put(inp)
    data = jax.device_put(data)

    # individual phases
    from art_tpu.demosaic.amaze_pallas import amaze_pallas
    from art_tpu.raw import preprocess as rawpre

    scale_fn = jax.jit(lambda x: rawpre.apply_scale(
        x, data["raw_offset"], data["raw_scale"], jnp))
    cfa = jax.block_until_ready(scale_fn(inp))
    timeit("raw scale", scale_fn, inp)

    am_fn = jax.jit(lambda c: amaze_pallas(c, "RGGB", 65535.0,
                                           65535.0 * 0.8))
    rgbp = jax.block_until_ready(am_fn(cfa))
    timeit("amaze_pallas", am_fn, cfa)

    from art_tpu import ops as ops_pkg
    for name, static, stage in config.steps:
        mod = ops_pkg.get_op(name)
        fn = jax.jit(lambda x, d, _m=mod, _s=static: _m.apply(x, d, _s))
        d = data[f"op:{name}"]
        timeit(f"op:{name}", fn, rgbp, d)

    # matrices + TRC encode
    from art_tpu.color import colorspaces as cs
    from art_tpu.pipeline.develop import _mat3

    def tail(x):
        y = _mat3(data["work2out"], x)
        y = jnp.clip(y / 65535.0, 0.0, 1.0)
        return cs.encode_trc(y, config.out_trc, jnp)

    timeit("work2out+TRC", jax.jit(tail), rgbp)

    def head(x):
        y = _mat3(data["cam2work"], x * data["rgb_mults"][:, None, None])
        return jnp.clip(y, 0.0, 65535.0)

    timeit("mults+cam2work+clip", jax.jit(head), rgbp)

    run = jax.jit(_build_run(config))
    timeit("FULL PROGRAM", run, inp, data)


if __name__ == "__main__":
    main()
