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


def process_batch(jobs, devices=None, progress=None, prefetch=2,
                  stats=None):
    """jobs: list of (input_path, ProcParams, output_path).

    Returns a list of bools (success per job). Groups jobs by compiled
    config and shards each group's batch axis over the mesh.

    Streaming pipeline (the 1000-image catalog of BASELINE config 5 must
    not decode up-front — 1000x24MP is ~100GB host RAM):
    - a feeder thread submits decodes gated by a semaphore of
      `prefetch * n_dev` frames, so peak decoded-frames-in-flight is
      O(mesh size), not O(catalog);
    - the consumer buckets decoded frames by compiled config and
      dispatches a device step as soon as a bucket fills one mesh pass
      (JAX dispatch is async, so decode of chunk N+1 overlaps device
      execution of chunk N);
    - the blocking device readback + encode happen on worker threads,
      which also release the semaphore — true double buffering.

    stats: optional dict; gets "peak_in_flight" (max decoded frames
    held at once) for tests.
    """
    import queue as queue_mod
    import threading

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

    # per-device batching: each device develops `device_batch` images
    # per dispatch through an in-program lax.map chain — the serial
    # per-execute dispatch overhead (~2.2ms on the tunnel, microbw.py)
    # amortizes across the batch. vmap cannot batch the Pallas ANY-
    # memspace buffers; lax.map compiles the body once.
    dev_batch = max(1, int(getattr(settings, "device_batch", 1)))
    group_size = n_dev * dev_batch

    pool = ThreadPoolExecutor(max_workers=settings.host_threads)
    # the decode window must cover a full group or batching never kicks in
    window = max(group_size + 1, prefetch * group_size)
    sem = threading.Semaphore(window)
    done_q: "queue_mod.Queue" = queue_mod.Queue()
    in_flight = [0]
    peak = [0]
    count_lock = threading.Lock()

    def _track(delta):
        with count_lock:
            in_flight[0] += delta
            peak[0] = max(peak[0], in_flight[0])

    import time as time_mod

    stage_s = {"decode": 0.0, "device": 0.0, "encode": 0.0}

    def _stage(name, dt):
        with count_lock:
            stage_s[name] += dt

    def decode(idx, job):
        inp, pp, outp = job
        t0 = time_mod.monotonic()
        try:
            frame = load_image(inp)
            # 8-bit JPEG outputs convert to u8 on device: the host
            # float->u8 pass (~0.9s/24MP on 1 core) would cap the queue
            config, data = plan(
                frame, pp,
                out_u8=str(outp).lower().endswith((".jpg", ".jpeg")))
            arr = frame.cfa if frame.is_raw else frame.rgb
            padded, _ = pad_to_multiple(arr, settings.pad_multiple)
            if frame.is_raw and frame.integral:
                from art_tpu.pipeline.develop import transfer_array

                padded = transfer_array(padded)
            _track(+1)
            _stage("decode", time_mod.monotonic() - t0)
            done_q.put((idx, (config, data, padded, outp)))
        except Exception as e:  # per-file errors don't kill the queue
            done_q.put((idx, e))

    def feeder():
        for idx, job in enumerate(jobs):
            sem.acquire()
            pool.submit(decode, idx, job)

    threading.Thread(target=feeder, daemon=True).start()

    results = [False] * len(jobs)
    encode_futures = []
    compiled_cache = {}

    def get_compiled(config):
        if config not in compiled_cache:
            fn = _build_run(config)

            if dev_batch == 1:
                def _per_device(inp, data, _fn=fn):
                    out = _fn(inp[0], jax.tree.map(lambda x: x[0], data))
                    return out[None]
            else:
                def _per_device(inp, data, _fn=fn):
                    return jax.lax.map(
                        lambda xd: _fn(xd[0], xd[1]), (inp, data))

            try:
                from jax import shard_map
            except ImportError:
                from jax.experimental.shard_map import shard_map

            compiled_cache[config] = jax.jit(shard_map(
                _per_device, mesh=mesh,
                in_specs=(P("batch"), P("batch")),
                out_specs=P("batch"), check_vma=False))
        return compiled_cache[config]

    def run_group(config, items):
        """items: list of (idx, (config, data, padded, outp)); dispatches
        one mesh pass (pad by repeating the last frame) and hands the
        blocking readback + encode to a worker thread."""
        batched = get_compiled(config)
        sel = items + [items[-1]] * (group_size - len(items))
        inputs = np.stack([d[2] for _, d in sel])
        data_stack = jax.tree.map(
            lambda *xs: np.stack(xs), *[d[1] for _, d in sel])
        out = batched(jax.device_put(inputs, batch_sharding),
                      jax.device_put(data_stack, batch_sharding))

        def drain(out=out, items=list(items)):
            try:
                from art_tpu.pipeline.develop import crop_result

                t0 = time_mod.monotonic()
                out_np = np.asarray(out)  # blocks until the device step
                _stage("device", time_mod.monotonic() - t0)
                t0 = time_mod.monotonic()
                for k, (i, d) in enumerate(items):
                    save_image(d[3], crop_result(out_np[k], d[0]))
                    results[i] = True
                    if progress:
                        progress(i, d[3])
                _stage("encode", time_mod.monotonic() - t0)
            finally:
                for _ in items:
                    _track(-1)
                    sem.release()

        encode_futures.append(pool.submit(drain))

    buckets: dict = {}
    held = 0
    for _ in range(len(jobs)):
        idx, d = done_q.get()
        if isinstance(d, Exception):
            sem.release()
            continue
        config = d[0]
        buckets.setdefault(config, []).append((idx, d))
        held += 1
        if len(buckets[config]) == group_size:
            run_group(config, buckets.pop(config))
            held -= group_size
        # many distinct configs can starve the decode window while every
        # bucket sits below a full group: flush the fullest to keep
        # frames moving
        while held >= window - n_dev and buckets:
            cfg = max(buckets, key=lambda c: len(buckets[c]))
            items = buckets.pop(cfg)
            run_group(cfg, items)
            held -= len(items)
    for cfg in list(buckets):
        run_group(cfg, buckets.pop(cfg))

    for f in encode_futures:
        f.result()
    pool.shutdown()
    if stats is not None:
        stats["peak_in_flight"] = peak[0]
        stats["window"] = window
        # cumulative worker-seconds per stage (overlapped wall time is
        # max(stage) on a wide host, sum on a 1-core host)
        stats["stage_seconds"] = {k: round(v, 3)
                                  for k, v in stage_s.items()}
    return results
