"""Distributed MapReduce proving — the TPU-native counterpart of the
reference's MapReduce recursive aggregation (SURVEY.md D9;
builder.mapreduce, reference circuits/builder.rs:273-409, and the hosted
platform's one-machine-per-map-job scheduling).

Design (TPU-first, documented divergence from the reference):

  * **map**: each batch of `batch_size` blocks is proved as an independent
    `SubchainMapCircuit` STARK (circuits/map_job.py). Jobs are
    embarrassingly parallel — the scheduler fans them out over local
    devices (`jax.default_device` round-robin) and, across hosts, over the
    prover service.
  * **reduce**: adjacency/linkage checks and the sha256(0x01‖l‖r) root
    combination are *verifier-side recomputations from the leaf proofs'
    public values* (the reference runs them inside recursive reduce
    circuits). The aggregate artifact therefore carries all leaf proofs;
    `verify()` re-verifies every leaf and replays the reduce tree. This is
    transparent (non-succinct) aggregation; in-circuit recursion that
    compresses the forest to one proof is the roadmap item (PARITY.md D6b).
  * **checkpoint/resume**: every completed leaf proof is persisted
    (proof/serde.py JSON) keyed by (batch_start, global ctx); a restarted
    prover reloads and *re-verifies* checkpointed leaves instead of
    re-proving — the prover-side fault tolerance the reference lacks
    (SURVEY.md §5 checkpoint/resume: "none for proving").
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ..circuits.input import InputDataFetcher
from ..utils import timing
from ..circuits.map_job import (
    IN_BYTES, OUT_DATA_ROOT, OUT_END_HEADER, OUT_START_HEADER,
    SubchainMapCircuit,
)
from ..proof import serde

log = logging.getLogger("blobstreamx_tpu.mapreduce")


@dataclass
class LeafProof:
    job: int
    batch_start: int
    publics: List[int]
    proof: object  # SystemProof


@dataclass
class MapReduceProof:
    """Aggregate artifact: the proof forest + the claimed statement."""

    start_block: int
    end_block: int
    batch_size: int
    global_end_header: bytes
    leaves: List[LeafProof]
    data_commitment: bytes


@dataclass
class SuccinctProof:
    """Succinct aggregate: ONE root proof whose statement covers the whole
    range — verify cost independent of nb_map_jobs (the reference's
    recursive MapReduce capability, circuits/builder.rs:301-396)."""

    start_block: int
    end_block: int
    batch_size: int
    nb_map_jobs: int
    global_end_header: bytes
    data_commitment: bytes
    root_proof: object       # SystemProof of the top ReduceCircuit
    root_publics: List[int]  # its 144 public bytes


@dataclass
class _Subchain:
    """Native mirror of MapReduceSubchainVariable for the reduce walk."""

    is_enabled: bool
    start_block: int
    start_header: bytes
    end_block: int
    end_header: bytes
    data_merkle_root: bytes


def _inner_hash(left: bytes, right: bytes) -> bytes:
    return hashlib.sha256(b"\x01" + left + right).digest()


def _leaf_to_subchain(leaf: LeafProof, batch_size: int,
                      global_end: int) -> _Subchain:
    pb = bytes(leaf.publics)
    batch_start = int.from_bytes(pb[0:8], "big")
    end_block = max(batch_start, min(batch_start + batch_size, global_end))
    return _Subchain(
        is_enabled=batch_start < global_end,
        start_block=batch_start,
        start_header=pb[OUT_START_HEADER],
        end_block=end_block,
        end_header=pb[OUT_END_HEADER],
        data_merkle_root=pb[OUT_DATA_ROOT],
    )


def _reduce(left: _Subchain, right: _Subchain) -> _Subchain:
    """Reference reduce closure semantics (circuits/builder.rs:337-395),
    replayed natively by prover and verifier alike."""
    if right.is_enabled:
        if left.end_header != right.start_header:
            raise ValueError("subchain headers not linked")
        if left.end_block != right.start_block:
            raise ValueError("subchain blocks not linked")
        root = _inner_hash(left.data_merkle_root, right.data_merkle_root)
        return _Subchain(left.is_enabled, left.start_block,
                         left.start_header, right.end_block,
                         right.end_header, root)
    return left


def _reduce_tree(subchains: Sequence[_Subchain]) -> _Subchain:
    level = list(subchains)
    while len(level) > 1:
        assert len(level) % 2 == 0
        level = [_reduce(level[i], level[i + 1])
                 for i in range(0, len(level), 2)]
    return level[0]


class MapReduceProver:
    """Schedules map-job proofs over devices, reduces natively, checkpoints.

    nb_map_jobs × batch_size plays the role of the reference's
    NB_MAP_JOBS × BATCH_SIZE const generics (bin/header_range_1024.rs:7-9).
    """

    def __init__(self, batch_size: int, nb_map_jobs: int,
                 fetcher: InputDataFetcher = None, cfg=None,
                 checkpoint_dir: Optional[str] = None,
                 max_workers: int = 1, devices: Optional[list] = None,
                 succinct: bool = False, prefetch: bool = True):
        assert nb_map_jobs & (nb_map_jobs - 1) == 0, "power-of-two tree"
        self.batch_size = batch_size
        self.nb_map_jobs = nb_map_jobs
        self.fetcher = fetcher or InputDataFetcher()
        if prefetch:
            # async witness pipeline: every map job's fetch is announced at
            # prove() entry and overlaps with proving (parallel/prefetch.py;
            # reference async hints, circuits/input.rs:125-126)
            from .prefetch import PrefetchingFetcher

            self.fetcher = PrefetchingFetcher(self.fetcher)
        self.cfg = cfg
        self.checkpoint_dir = checkpoint_dir
        self.max_workers = max_workers
        self.devices = devices
        self.template = SubchainMapCircuit(batch_size, self.fetcher)
        # succinct mode: one ReduceCircuit template per tree level; level L
        # verifies two level-(L-1) proofs in-circuit (circuits/aggregate.py)
        self.succinct = succinct
        self.reduce_templates: List[object] = []
        if succinct:
            from ..circuits.aggregate import ReduceCircuit

            child = self.template.circuit
            span = batch_size * 2
            while span <= batch_size * nb_map_jobs and nb_map_jobs > 1:
                rc = ReduceCircuit(child, span, self.cfg)
                self.reduce_templates.append(rc)
                child = rc.circuit
                span *= 2

    # -- checkpointing ------------------------------------------------------

    def _ckpt_path(self, batch_start: int, global_end: int,
                   global_end_header: bytes) -> Optional[str]:
        if not self.checkpoint_dir:
            return None
        key = hashlib.sha256(
            f"{self.batch_size}:{batch_start}:{global_end}:".encode()
            + global_end_header
        ).hexdigest()[:24]
        return os.path.join(self.checkpoint_dir, f"leaf_{key}.json")

    def _load_ckpt(self, path: Optional[str]) -> Optional[Tuple[object, List[int]]]:
        if not path or not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                d = json.load(f)
            proof = serde.system_proof_from_json(d["proof"])
            publics = [int(v) for v in d["publics"]]
            # never trust disk blindly: re-verify before reuse
            if not self.template.verify(proof, publics, self.cfg):
                log.warning("checkpoint %s failed verification; discarding",
                            path)
                return None
            return proof, publics
        except Exception as e:
            log.warning("checkpoint %s unreadable (%s); discarding", path, e)
            return None

    def _save_ckpt(self, path: Optional[str], proof, publics: List[int]):
        if not path:
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"proof": serde.system_proof_to_json(proof),
                       "publics": list(map(int, publics))}, f)
        os.replace(tmp, path)

    def _announce_prefetch(self, start_block: int, end_block: int) -> None:
        if hasattr(self.fetcher, "prefetch_jobs"):
            self.fetcher.prefetch_jobs(start_block, end_block,
                                       self.batch_size, self.nb_map_jobs)

    # -- proving ------------------------------------------------------------

    @timing.timed("mapreduce.map_job")
    def _prove_job(self, job: int, start_block: int, global_end: int,
                   global_end_header: bytes) -> LeafProof:
        batch_start = start_block + job * self.batch_size
        path = self._ckpt_path(batch_start, global_end, global_end_header)
        cached = self._load_ckpt(path)
        if cached is not None:
            log.info("map job %d: resumed from checkpoint", job)
            proof, publics = cached
        else:
            if self.devices:
                import jax

                dev = self.devices[job % len(self.devices)]
                with jax.default_device(dev):
                    proof, publics = self.template.prove(
                        batch_start, global_end, global_end_header, self.cfg)
            else:
                proof, publics = self.template.prove(
                    batch_start, global_end, global_end_header, self.cfg)
            self._save_ckpt(path, proof, publics)
        return LeafProof(job, batch_start, list(publics), proof)

    def prove(self, start_block: int, end_block: int,
              global_end_header: Optional[bytes] = None) -> MapReduceProof:
        assert end_block - start_block <= self.batch_size * self.nb_map_jobs
        if global_end_header is None:
            global_end_header = self.fetcher.get_header(end_block).hash()
        self._announce_prefetch(start_block, end_block)

        jobs = range(self.nb_map_jobs)
        if self.max_workers > 1:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                leaves = list(pool.map(
                    lambda j: self._prove_job(j, start_block, end_block,
                                              global_end_header), jobs))
        else:
            leaves = [self._prove_job(j, start_block, end_block,
                                      global_end_header) for j in jobs]

        final = _reduce_tree([
            _leaf_to_subchain(lf, self.batch_size, end_block)
            for lf in leaves
        ])
        # reference final asserts (circuits/builder.rs:400-406)
        if final.end_block != end_block or final.end_header != global_end_header:
            raise ValueError("reduce tree does not reach the global end")
        return MapReduceProof(
            start_block=start_block, end_block=end_block,
            batch_size=self.batch_size,
            global_end_header=global_end_header,
            leaves=leaves, data_commitment=final.data_merkle_root,
        )

    # -- verification -------------------------------------------------------

    def verify(self, agg: MapReduceProof,
               start_header: Optional[bytes] = None) -> bool:
        """Re-verify every leaf proof, re-derive the reduce tree, and check
        the claimed statement (incl. public-input binding per leaf)."""
        if len(agg.leaves) != self.nb_map_jobs:
            return False
        subchains = []
        for j, leaf in enumerate(agg.leaves):
            pb = bytes(leaf.publics)
            want_start = agg.start_block + j * self.batch_size
            bound = (want_start.to_bytes(8, "big")
                     + agg.end_block.to_bytes(8, "big")
                     + agg.global_end_header)
            if pb[:IN_BYTES] != bound:
                return False
            if not self.template.verify(leaf.proof, leaf.publics, self.cfg):
                return False
            subchains.append(
                _leaf_to_subchain(leaf, self.batch_size, agg.end_block))
        try:
            final = _reduce_tree(subchains)
        except ValueError:
            return False
        if start_header is not None and final.start_header != start_header:
            return False
        return (final.start_block == agg.start_block
                and final.end_block == agg.end_block
                and final.end_header == agg.global_end_header
                and final.data_merkle_root == agg.data_commitment)

    # -- succinct aggregation ----------------------------------------------

    @timing.timed("mapreduce.prove_succinct")
    def prove_succinct(self, start_block: int, end_block: int,
                       global_end_header: Optional[bytes] = None
                       ) -> SuccinctProof:
        """Prove all leaves, then walk the reduce tree with in-circuit
        verification of child proofs: the result is ONE proof (reference
        circuits/builder.rs:301-396 + plonky2 recursion)."""
        assert self.succinct, "construct MapReduceProver(succinct=True)"
        assert end_block - start_block <= self.batch_size * self.nb_map_jobs
        if global_end_header is None:
            global_end_header = self.fetcher.get_header(end_block).hash()
        self._announce_prefetch(start_block, end_block)

        jobs = range(self.nb_map_jobs)
        if self.max_workers > 1:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                leaves = list(pool.map(
                    lambda j: self._prove_job(j, start_block, end_block,
                                              global_end_header), jobs))
        else:
            leaves = [self._prove_job(j, start_block, end_block,
                                      global_end_header) for j in jobs]

        level: List[Tuple[object, List[int]]] = [
            (lf.proof, lf.publics) for lf in leaves]
        span = self.batch_size * 2
        for rc in self.reduce_templates:
            nxt = []
            for i in range(0, len(level), 2):
                node_start = start_block + (i // 2) * span
                proof, publics = rc.prove(
                    node_start, end_block, global_end_header,
                    level[i], level[i + 1], self.cfg)
                nxt.append((proof, list(publics)))
            level = nxt
            span *= 2
        assert len(level) == 1
        root_proof, root_publics = level[0]
        pb = bytes(root_publics)
        data_commitment = pb[OUT_DATA_ROOT]
        if pb[OUT_END_HEADER] != global_end_header:
            raise ValueError("root subchain does not reach the global end")
        return SuccinctProof(
            start_block=start_block, end_block=end_block,
            batch_size=self.batch_size, nb_map_jobs=self.nb_map_jobs,
            global_end_header=global_end_header,
            data_commitment=data_commitment,
            root_proof=root_proof, root_publics=list(root_publics),
        )

    def verify_succinct(self, agg: SuccinctProof,
                        start_header: Optional[bytes] = None) -> bool:
        """Verify exactly ONE proof — the root of the reduce tree — and
        bind its public bytes to the claimed statement. Cost is independent
        of nb_map_jobs (contrast with `verify`, which re-verifies every
        leaf)."""
        if agg.nb_map_jobs != self.nb_map_jobs or not self.reduce_templates:
            return False
        root = self.reduce_templates[-1]
        pb = bytes(agg.root_publics)
        bound = (agg.start_block.to_bytes(8, "big")
                 + agg.end_block.to_bytes(8, "big")
                 + agg.global_end_header)
        if pb[:IN_BYTES] != bound:
            return False
        if pb[OUT_END_HEADER] != agg.global_end_header:
            return False
        if pb[OUT_DATA_ROOT] != agg.data_commitment:
            return False
        if start_header is not None and pb[OUT_START_HEADER] != start_header:
            return False
        return root.verify(agg.root_proof, agg.root_publics, self.cfg)


# -- artifact serde -----------------------------------------------------------

def mapreduce_proof_to_json(agg: MapReduceProof) -> dict:
    return {
        "start_block": agg.start_block,
        "end_block": agg.end_block,
        "batch_size": agg.batch_size,
        "global_end_header": agg.global_end_header.hex(),
        "data_commitment": agg.data_commitment.hex(),
        "leaves": [
            {"job": lf.job, "batch_start": lf.batch_start,
             "publics": list(map(int, lf.publics)),
             "proof": serde.system_proof_to_json(lf.proof)}
            for lf in agg.leaves
        ],
    }


def mapreduce_proof_from_json(d: dict) -> MapReduceProof:
    return MapReduceProof(
        start_block=d["start_block"], end_block=d["end_block"],
        batch_size=d["batch_size"],
        global_end_header=bytes.fromhex(d["global_end_header"]),
        data_commitment=bytes.fromhex(d["data_commitment"]),
        leaves=[LeafProof(x["job"], x["batch_start"],
                          [int(v) for v in x["publics"]],
                          serde.system_proof_from_json(x["proof"]))
                for x in d["leaves"]],
    )
