"""Batch queue tests on the virtual 8-device CPU mesh."""

import numpy as np

from art_tpu.io.dngwrite import write_dng
from art_tpu.io.rawfile import synthesize_bayer
from art_tpu.parallel import BatchQueue, process_batch
from art_tpu.params import ProcParams


def make_dngs(tmp_path, n):
    paths = []
    rng = np.random.default_rng(1)
    for i in range(n):
        rgb = rng.uniform(0.1, 0.8, size=(3, 48, 64))
        syn = synthesize_bayer(rgb, black=512, white=16383)
        p = tmp_path / f"img{i}.dng"
        write_dng(p, syn.cfa.astype(np.uint16), black=512, white=16383,
                  cam_mul=(2.0, 1.0, 1.5), compress=True)
        paths.append(p)
    return paths


def test_process_batch_sharded(tmp_path):
    import jax

    paths = make_dngs(tmp_path, 10)  # more jobs than devices
    jobs = [(str(p), ProcParams(), str(tmp_path / f"out{i}.jpg"))
            for i, p in enumerate(paths)]
    results = process_batch(jobs, devices=jax.devices())
    assert all(results)
    for i in range(10):
        assert (tmp_path / f"out{i}.jpg").exists()


def test_batch_determinism_vs_single(tmp_path):
    """Sharded batch output must match single-image develop."""
    import jax
    from art_tpu.io import load_image
    from art_tpu.pipeline import develop
    from PIL import Image

    paths = make_dngs(tmp_path, 3)
    jobs = [(str(p), ProcParams(), str(tmp_path / f"b{i}.png"))
            for i, p in enumerate(paths)]
    process_batch(jobs, devices=jax.devices())
    for i, p in enumerate(paths):
        single = develop(load_image(str(p)), ProcParams())
        batched = np.asarray(Image.open(tmp_path / f"b{i}.png"),
                             dtype=np.float32) / 255.0
        single_u8 = np.moveaxis(single, 0, -1)
        assert np.abs(single_u8 - batched).max() < 0.01


def test_batch_streaming_bounded_memory(tmp_path):
    """32+ jobs: peak decoded-frames-in-flight stays O(mesh), not
    O(catalog) (the 1000x24MP config-5 catalog must not be decoded
    up-front)."""
    import jax

    from art_tpu.settings import settings

    paths = make_dngs(tmp_path, 33)
    jobs = [(str(p), ProcParams(), str(tmp_path / f"s{i}.jpg"))
            for i, p in enumerate(paths)]
    stats = {}
    # the decode window scales with device_batch (it must cover a full
    # group); pin batch=1 here so the catalog exceeds the window and the
    # streaming invariant is actually exercised
    prev = settings.device_batch
    settings.device_batch = 1
    try:
        results = process_batch(jobs, devices=jax.devices(), prefetch=2,
                                stats=stats)
    finally:
        settings.device_batch = prev
    assert all(results)
    n_dev = len(jax.devices())
    assert stats["peak_in_flight"] <= 2 * n_dev
    assert stats["peak_in_flight"] < len(jobs)


def test_batch_queue_persistence(tmp_path):
    paths = make_dngs(tmp_path, 3)
    qfile = tmp_path / "queue.json"
    q = BatchQueue(str(qfile))
    for i, p in enumerate(paths):
        q.add(str(p), str(tmp_path / f"q{i}.jpg"))
    assert len(q.pending()) == 3
    # reload from disk (restart semantics, batchqueue.cc:287-332)
    q2 = BatchQueue(str(qfile))
    assert len(q2.pending()) == 3
    q2.process()
    assert len(q2.pending()) == 0
    q3 = BatchQueue(str(qfile))
    assert len(q3.pending()) == 0


def test_batch_bad_file_continues(tmp_path):
    paths = make_dngs(tmp_path, 2)
    bad = tmp_path / "broken.dng"
    bad.write_bytes(b"not a dng")
    jobs = [(str(paths[0]), ProcParams(), str(tmp_path / "g0.jpg")),
            (str(bad), ProcParams(), str(tmp_path / "g1.jpg")),
            (str(paths[1]), ProcParams(), str(tmp_path / "g2.jpg"))]
    results = process_batch(jobs)
    assert results == [True, False, True]
