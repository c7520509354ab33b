"""Multi-chip dry run on a virtual CPU device mesh (driver gate).

The production scaling story is batch-axis data parallelism over images:
each image's develop program is independent (SURVEY §2.11 — the reference's
batch queue is a serial worker, `simpleprocess.cc:586-612`; ours shards the
queue across chips).  This module jits the full develop step over an
``n_devices`` mesh with real batch shardings and runs one step on a tiny
frame.

It is designed to run in a SUBPROCESS with ``JAX_PLATFORMS=cpu`` and
``--xla_force_host_platform_device_count=N`` exported *before* jax
initializes — see ``__graft_entry__.dryrun_multichip`` which execs
``python -m art_tpu.parallel.dryrun N`` with that environment.  Running it
in-process in an environment that already has a TPU client would pick up
the wrong backend (the round-1 failure mode).
"""

from __future__ import annotations

import sys


def run(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, backend '{jax.default_backend()}' "
            f"has {len(devs)} — the host platform device count was not "
            "forced before jax initialized")

    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io.rawfile import synthesize_bayer
    from art_tpu.params import ProcParams
    from art_tpu.pipeline.develop import _build_run, plan
    from art_tpu.settings import settings

    # Cheap-but-real config: the full plan/execute machinery with the
    # bilinear kernel so one host core can compile+run the 8-way program
    # in seconds.  The point of the gate is the sharding, not the kernels.
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.02, 0.95, size=(3, 64, 96))
    frame = synthesize_bayer(rgb, pattern="RGGB")
    pp = ProcParams()
    pp.raw.bayer.method = "bilinear"
    config, data = plan(frame, pp)
    inp, _ = pad_to_multiple(frame.cfa, settings.pad_multiple)

    mesh = Mesh(np.array(devs[:n_devices]), axis_names=("batch",))
    batch_sharding = NamedSharding(mesh, P("batch", None, None))
    replicated = NamedSharding(mesh, P())

    batch = np.stack([inp] * n_devices)  # one image per device
    batch_dev = jax.device_put(batch, batch_sharding)
    data_dev = jax.device_put(data, replicated)

    fn = _build_run(config)
    batched = jax.jit(
        jax.vmap(fn, in_axes=(0, None)),
        in_shardings=(batch_sharding, replicated),
        out_shardings=batch_sharding,
    )
    out = batched(batch_dev, data_dev)
    out.block_until_ready()
    assert out.shape[0] == n_devices, out.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # prove the output really lives sharded across the mesh
    assert len(out.sharding.device_set) == n_devices, out.sharding

    # Second gate: the PRODUCTION path — parallel.queue.process_batch
    # (streaming decode -> shard_map device step -> encode), not just the
    # vmap plumbing above. 2 mesh passes of tiny DNGs, files on disk.
    import tempfile

    from art_tpu.io.dngwrite import write_dng
    from art_tpu.parallel.queue import process_batch

    with tempfile.TemporaryDirectory() as td:
        mosaic = np.asarray(frame.cfa).astype(np.uint16)
        jobs = []
        for i in range(2 * n_devices):
            p = f"{td}/in_{i}.dng"
            write_dng(p, mosaic, pattern="RGGB", black=512, white=16383)
            ppq = ProcParams()
            ppq.raw.bayer.method = "bilinear"
            jobs.append((p, ppq, f"{td}/out_{i}.png"))
        stats: dict = {}
        oks = process_batch(jobs, devices=devs[:n_devices], stats=stats)
        assert all(oks), oks
        import os as _os

        assert all(_os.path.exists(j[2]) for j in jobs)
        assert stats["peak_in_flight"] <= stats["window"], stats

    print(f"dryrun_multichip: OK on {n_devices} {jax.default_backend()} "
          f"devices, out {out.shape}; queue {2 * n_devices} jobs "
          f"(peak in-flight {stats['peak_in_flight']})")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
