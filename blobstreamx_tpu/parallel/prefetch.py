"""Async witness pipeline: overlap witness fetching with proving.

The reference overlaps witness acquisition with proof generation via
async hints — `DataCommitmentOffchainInputs` is an `AsyncHint` whose
fetches run on a tokio pool with 200+ concurrent requests while the
prover works (reference circuits/data_commitment.rs:18-45,
circuits/input.rs:125-126). Here the same overlap is a fetcher
decorator: `PrefetchingFetcher.prefetch(...)` schedules a batch's
witness fetch on a thread pool, and the circuit hint's synchronous
`get_data_commitment_inputs(...)` call collects the future — blocking
only if the fetch hasn't landed yet. The device never idles on IO that
was announced ahead of time, and the orchestration stays deterministic
(hints still observe exactly the bytes they asked for).

`MapReduceProver` announces every map job's batch at prove() entry, so
job k's RPC fetch rides under job k-1's proving (parallel/mapreduce.py).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, Tuple


class PrefetchingFetcher:
    """Wraps any InputDataFetcher; passes every other attribute through.

    Thread-safety: futures are keyed by the exact (start, end, batch_size)
    triple the map circuit's hint computes, so a collected result is
    byte-identical to a synchronous fetch.
    """

    def __init__(self, inner, max_concurrent: int = 8):
        self._inner = inner
        self._pool = ThreadPoolExecutor(max_workers=max_concurrent,
                                        thread_name_prefix="witness-prefetch")
        self._futures: Dict[Tuple[int, int, int], Future] = {}
        self._lock = threading.Lock()

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def prefetch(self, start: int, end: int, batch_size: int) -> None:
        """Announce a batch; idempotent per key."""
        key = (start, end, batch_size)
        with self._lock:
            if key not in self._futures:
                self._futures[key] = self._pool.submit(
                    self._inner.get_data_commitment_inputs,
                    start, end, batch_size)

    def prefetch_jobs(self, start_block: int, end_block: int,
                      batch_size: int, nb_jobs: int) -> None:
        """Announce every map job of a range, mirroring the clamp logic of
        the map circuit's hint (circuits/map_job.py fetch closure)."""
        for j in range(nb_jobs):
            bs_start = start_block + j * batch_size
            bs_end = max(bs_start, min(bs_start + batch_size, end_block))
            self.prefetch(bs_start, bs_end, batch_size)

    def get_data_commitment_inputs(self, start: int, end: int,
                                   batch_size: int):
        with self._lock:
            fut = self._futures.pop((start, end, batch_size), None)
        if fut is not None:
            return fut.result()
        return self._inner.get_data_commitment_inputs(start, end, batch_size)

    def shutdown(self):
        self._pool.shutdown(wait=False)
