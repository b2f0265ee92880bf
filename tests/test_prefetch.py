"""Async witness pipeline (parallel/prefetch.py) — reference parity for
the async-hint overlap of witness fetching with proving (reference
circuits/data_commitment.rs:18-45 AsyncHint, circuits/input.rs:125-126
concurrent fetches; VERDICT r4 Missing #6)."""

import time

from blobstreamx_tpu.circuits.input import InputDataFetcher
from blobstreamx_tpu.parallel.prefetch import PrefetchingFetcher


class SlowFetcher:
    """Records call wall-times; each fetch takes `delay` seconds."""

    def __init__(self, delay=0.25):
        self.delay = delay
        self.calls = []

    def get_data_commitment_inputs(self, start, end, batch_size):
        self.calls.append((start, end, batch_size, time.perf_counter()))
        time.sleep(self.delay)
        return ("inputs", start, end, batch_size)

    def get_header(self, h):
        raise AssertionError("not used")


def test_prefetch_overlaps_fetches():
    inner = SlowFetcher(delay=0.25)
    f = PrefetchingFetcher(inner, max_concurrent=8)
    t0 = time.perf_counter()
    f.prefetch_jobs(10000, 10008, 2, 4)
    # announcing is non-blocking
    assert time.perf_counter() - t0 < 0.2
    # collecting all four costs ~one delay, not four (they ran concurrently)
    got = [f.get_data_commitment_inputs(10000 + 2 * j,
                                        min(10000 + 2 * j + 2, 10008), 2)
           for j in range(4)]
    assert time.perf_counter() - t0 < 3 * inner.delay
    assert got[0] == ("inputs", 10000, 10002, 2)
    assert got[3] == ("inputs", 10006, 10008, 2)
    assert len(inner.calls) == 4
    f.shutdown()


def test_prefetch_clamps_final_partial_batch():
    inner = SlowFetcher(delay=0.0)
    f = PrefetchingFetcher(inner)
    # range [10000, 10003) with batch_size=2 x 2 jobs: second batch clamps
    f.prefetch_jobs(10000, 10003, 2, 2)
    f.get_data_commitment_inputs(10000, 10002, 2)
    f.get_data_commitment_inputs(10002, 10003, 2)
    starts_ends = [(c[0], c[1]) for c in inner.calls]
    assert sorted(starts_ends) == [(10000, 10002), (10002, 10003)]
    f.shutdown()


def test_uncached_key_falls_through():
    inner = SlowFetcher(delay=0.0)
    f = PrefetchingFetcher(inner)
    assert f.get_data_commitment_inputs(5, 7, 2) == ("inputs", 5, 7, 2)
    f.shutdown()


def test_attribute_passthrough_and_byte_identity():
    """The wrapper is witness-transparent: same bytes as the raw fetcher."""
    raw = InputDataFetcher()
    f = PrefetchingFetcher(raw)
    assert f.fixture_path == raw.fixture_path
    f.prefetch(10000, 10002, 2)
    a = f.get_data_commitment_inputs(10000, 10002, 2)
    b = raw.get_data_commitment_inputs(10000, 10002, 2)
    assert a == b
    f.shutdown()


def test_mapreduce_prover_announces_jobs(monkeypatch):
    """MapReduceProver(prefetch=True) announces every job's batch at
    prove() entry before any proving starts."""
    from blobstreamx_tpu.parallel import mapreduce as mr

    announced = []

    prover = mr.MapReduceProver(batch_size=2, nb_map_jobs=2, prefetch=True)
    assert hasattr(prover.fetcher, "prefetch_jobs")
    monkeypatch.setattr(
        prover.fetcher, "prefetch_jobs",
        lambda s, e, bs, n: announced.append((s, e, bs, n)))
    # stub out proving: we only care about the announcement contract
    import types

    def fake_job(self, job, start_block, global_end, geh):
        raise RuntimeError("stop-after-announce")

    monkeypatch.setattr(mr.MapReduceProver, "_prove_job", fake_job)
    try:
        prover.prove(10000, 10004)
    except RuntimeError:
        pass
    assert announced == [(10000, 10004, 2, 2)]
