"""Parallel runtime: batch queue sharded over a device mesh.

The reference's batch queue is one worker thread processing images serially
(simpleprocess.cc:586-612, batchqueue.cc). The TPU replacement shards the
*batch axis* across chips — images are independent work units (SURVEY
§2.11), so the only collectives are the implicit batch scatter/gather.
"""

from art_tpu.parallel.queue import BatchQueue, process_batch  # noqa: F401
