"""Batch queue: persistent jobs + mesh-sharded execution.

Reference semantics carried over (rtgui/batchqueue.cc):
- jobs persist to disk and survive restarts (save/load JSON next to the
  queue file; `imageReady` chaining becomes a completion callback);
- each job = (input path, composed ProcParams, output path).

TPU-native execution (replaces the serial batchProcessingThread):
- jobs are grouped by PipelineConfig (same compiled program);
- groups are chunked to the mesh size and mapped over a `batch` axis with
  `shard_map` (one image per device per step; vmap cannot batch the
  Pallas kernels' ANY-memory-space blocks);
- host threads decode the next chunk and encode finished outputs while the
  device works (double buffering), keeping HBM fed.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from art_tpu.settings import settings


class BatchQueue:
    """Persistent job queue (batchqueue.cc save/load semantics)."""

    def __init__(self, path=None):
        self.path = path
        self.jobs: list[dict] = []
        if path and os.path.exists(path):
            self.load()

    def add(self, input_path, output_path, params_text=""):
        self.jobs.append({
            "input": str(input_path),
            "output": str(output_path),
            "params": params_text,
            "done": False,
        })
        if self.path:
            self.save()

    def pending(self):
        return [j for j in self.jobs if not j["done"]]

    def mark_done(self, job):
        job["done"] = True
        if self.path:
            self.save()

    def save(self):
        with open(self.path, "w") as f:
            json.dump(self.jobs, f)

    def load(self):
        with open(self.path) as f:
            self.jobs = json.load(f)

    def process(self, devices=None, progress=None):
        from art_tpu.params import ProcParams

        def make_job(j):
            pp = ProcParams()
            if j["params"]:
                pp.apply_arp_text(j["params"])
            return (j["input"], pp, j["output"], j)

        jobs = [make_job(j) for j in self.pending()]
        results = process_batch(
            [(inp, pp, outp) for inp, pp, outp, _ in jobs],
            devices=devices, progress=progress)
        for (_, _, _, raw), ok in zip(jobs, results):
            if ok:
                self.mark_done(raw)
        return results


def process_batch(jobs, devices=None, progress=None):
    """jobs: list of (input_path, ProcParams, output_path).

    Returns a list of bools (success per job). Groups jobs by compiled
    config and shards each group's batch axis over the mesh.
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from art_tpu.core.image import pad_to_multiple
    from art_tpu.io import load_image
    from art_tpu.io.imagefile import save_image
    from art_tpu.pipeline.develop import _build_run, plan

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), axis_names=("batch",))
    batch_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    pool = ThreadPoolExecutor(max_workers=settings.host_threads)

    # host decode (parallel) — keyed by job index
    def decode(job):
        inp, pp, outp = job
        try:
            frame = load_image(inp)
            config, data = plan(frame, pp)
            arr = frame.cfa if frame.is_raw else frame.rgb
            padded, _ = pad_to_multiple(arr, settings.pad_multiple)
            return (config, data, padded, outp)
        except Exception as e:  # per-file errors don't kill the queue
            return e

    decoded = list(pool.map(decode, jobs))

    # group by config so each group shares one compiled program
    groups: dict = {}
    for idx, d in enumerate(decoded):
        if isinstance(d, Exception):
            continue
        config = d[0]
        groups.setdefault(config, []).append(idx)

    results = [False] * len(jobs)
    encode_futures = []
    compiled_cache = {}

    for config, indices in groups.items():
        if config not in compiled_cache:
            fn = _build_run(config)

            def _per_device(inp, data, _fn=fn):
                out = _fn(inp[0], jax.tree.map(lambda x: x[0], data))
                return out[None]

            from jax.sharding import PartitionSpec as _P

            try:
                from jax import shard_map
            except ImportError:
                from jax.experimental.shard_map import shard_map

            batched = jax.jit(shard_map(
                _per_device, mesh=mesh,
                in_specs=(_P("batch"), _P("batch")),
                out_specs=_P("batch"), check_vma=False))
            compiled_cache[config] = batched
        batched = compiled_cache[config]

        # chunk to multiples of the mesh size (pad by repeating the last)
        for c0 in range(0, len(indices), n_dev):
            chunk = indices[c0 : c0 + n_dev]
            pad_n = n_dev - len(chunk)
            sel = chunk + [chunk[-1]] * pad_n
            inputs = np.stack([decoded[i][2] for i in sel])
            datas = [decoded[i][1] for i in sel]
            data_stack = jax.tree.map(
                lambda *xs: np.stack(xs), *datas)
            out = batched(
                jax.device_put(inputs, batch_sharding),
                jax.device_put(data_stack, batch_sharding))
            out_np = np.asarray(out)
            for k, i in enumerate(chunk):
                outp = decoded[i][3]
                arr = out_np[k]

                def enc(arr=arr, outp=outp, i=i):
                    save_image(outp, arr)
                    results[i] = True
                    if progress:
                        progress(i, outp)

                encode_futures.append(pool.submit(enc))

    for f in encode_futures:
        f.result()
    pool.shutdown()
    return results
