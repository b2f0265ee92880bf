"""Succinct header_range: ONE final proof composing the skip proof with
the succinct MapReduce aggregation root (reference semantics:
circuits/header_range.rs:32-59 — builder.skip + prove_data_commitment in
one statement, with the data commitment's MapReduce children verified
recursively, circuits/builder.rs:301-409).

`HeaderRangeJoinCircuit` verifies BOTH child proofs in-circuit
(proof/recursion.py):

  * a `SkipCircuit` proof (circuits/header_range.py):
      in  = trusted_block (8) ‖ trusted_header (32) ‖ target_block (8)
      out = target_header_hash (32)
  * the root `ReduceCircuit` proof of a MapReduceProver(succinct=True)
    tree (circuits/aggregate.py + parallel/mapreduce.py):
      in  = start_block (8) ‖ global_end_block (8) ‖ global_end_header (32)
      out = start_header (32) ‖ end_header (32) ‖ data_merkle_root (32)

and binds them: the aggregation's start/global-end blocks are the
trusted/target blocks, its global_end_header is the skip-proven target
hash, its start_header must equal the trusted header and its end_header
the target hash (reference final asserts, circuits/builder.rs:400-406).
Public surface equals the reference header_range function:

  evm_read : trusted_block (8) ‖ trusted_header (32) ‖ target_block (8)
  evm_write: target_header_hash (32) ‖ data_commitment (32)

Verify cost: one proof, independent of NB_MAP_JOBS.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..frontend.builder import (
    CircuitBuilder, CompiledCircuit, Variable,
)
from ..chips import channels as ch
from ..proof import recursion as rec
from ..proof import stark

SKIP_IN = 48
SKIP_PUB = 80   # 48 in + 32 out
AGG_IN = 48
AGG_PUB = 144   # 48 in + 96 out


class HeaderRangeJoinCircuit:
    """Joins a SkipCircuit proof with a succinct-aggregation root proof."""

    def __init__(self, skip_compiled: CompiledCircuit,
                 root_compiled: CompiledCircuit,
                 cfg: Optional[stark.StarkConfig] = None):
        self.cfg = cfg or stark.StarkConfig()
        self.skip_shapes = rec.inner_shapes(skip_compiled, self.cfg)
        self.root_shapes = rec.inner_shapes(root_compiled, self.cfg)
        # witness slot: (skip_proof, skip_publics, root_proof, root_publics)
        self._pending: Optional[tuple] = None
        self._define()

    def _define(self):
        b = CircuitBuilder()
        cfg = self.cfg
        trusted_block = b.evm_read_u64()
        trusted_header = b.evm_read_bytes32()
        target_block = b.evm_read_u64()

        # witnessed child outputs
        target_hash = [b.free_byte() for _ in range(32)]
        agg_out = [b.free_byte() for _ in range(96)]

        pend = self

        def fetch_skip_out(vals):
            return [int(v) for v in pend._pending[1][SKIP_IN:SKIP_PUB]]

        def fetch_agg_out(vals):
            return [int(v) for v in pend._pending[3][AGG_IN:AGG_PUB]]

        b.hint_into([], [x.wire for x in target_hash], fetch_skip_out)
        b.hint_into([], [x.wire for x in agg_out], fetch_agg_out)

        # the two verifiers + proof witness
        rv_skip = rec.RecursiveVerifier(b, self.skip_shapes, cfg)
        skip_pw, skip_flat = rv_skip.alloc_proof()
        rv_root = rec.RecursiveVerifier(b, self.root_shapes, cfg)
        root_pw, root_flat = rv_root.alloc_proof()
        b.hint_into([], skip_flat, lambda v: rec.flatten_system_proof(
            pend._pending[0], self.skip_shapes, cfg))
        b.hint_into([], root_flat, lambda v: rec.flatten_system_proof(
            pend._pending[2], self.root_shapes, cfg))

        tb_bytes = b.u64_to_be_bytes(trusted_block)
        gb_bytes = b.u64_to_be_bytes(target_block)

        # skip publics: own inputs ‖ target_hash
        skip_in = (list(tb_bytes) + list(trusted_header.bytes)
                   + list(gb_bytes))
        msgs = [(ch.PUBLIC, [pos, Variable(x.wire)], -1)
                for pos, x in enumerate(skip_in)]
        msgs += [(ch.PUBLIC, [SKIP_IN + j, Variable(x.wire)], -1)
                 for j, x in enumerate(target_hash)]
        rv_skip.verify(skip_pw, msgs)

        # aggregation publics: trusted_block ‖ target_block ‖ target_hash
        # ‖ agg outputs — global_end_header IS the skip-proven target hash
        # (same wires), so the two statements are bound by construction
        agg_in = list(tb_bytes) + list(gb_bytes) + list(target_hash)
        msgs = [(ch.PUBLIC, [pos, Variable(x.wire)], -1)
                for pos, x in enumerate(agg_in)]
        msgs += [(ch.PUBLIC, [AGG_IN + j, Variable(x.wire)], -1)
                 for j, x in enumerate(agg_out)]
        rv_root.verify(root_pw, msgs)

        # final asserts (reference circuits/builder.rs:400-406):
        # commitment chain starts at the trusted header ...
        for j in range(32):
            b.assert_is_equal(Variable(agg_out[j].wire),
                              Variable(trusted_header.bytes[j].wire))
        # ... and ends at the skip-proven target header
        for j in range(32):
            b.assert_is_equal(Variable(agg_out[32 + j].wire),
                              Variable(target_hash[j].wire))

        from ..frontend.builder import Bytes32Variable

        b.evm_write_bytes32(Bytes32Variable(tuple(target_hash)))
        b.evm_write_bytes32(Bytes32Variable(tuple(agg_out[64:96])))
        self.builder = b
        self.circuit: CompiledCircuit = b.build()

    # -- proving -------------------------------------------------------------

    def make_public_inputs(self, trusted_block: int, trusted_header: bytes,
                           target_block: int) -> Dict[int, int]:
        data = (trusted_block.to_bytes(8, "big") + trusted_header
                + target_block.to_bytes(8, "big"))
        return {i: v for i, v in enumerate(data)}

    def _with_pending(self, skip: Tuple[object, List[int]],
                      root: Tuple[object, List[int]]):
        self._pending = (skip[0], skip[1], root[0], root[1])

    def prove(self, trusted_block: int, trusted_header: bytes,
              target_block: int, skip: Tuple[object, List[int]],
              root: Tuple[object, List[int]], cfg=None, pks=None):
        """skip/root: (child SystemProof, child publics)."""
        self._with_pending(skip, root)
        try:
            pub_in = self.make_public_inputs(trusted_block, trusted_header,
                                             target_block)
            return self.circuit.prove(pub_in, cfg or self.cfg, pks)
        finally:
            self._pending = None

    def witness_ok(self, trusted_block: int, trusted_header: bytes,
                   target_block: int, skip, root) -> bool:
        """Fast oracle: every constraint of the join circuit holds
        (proof/check.witness_check) without proving the outer proof."""
        from ..proof.check import witness_check

        self._with_pending(skip, root)
        try:
            pub_in = self.make_public_inputs(trusted_block, trusted_header,
                                             target_block)
            return witness_check(self.circuit, pub_in)
        finally:
            self._pending = None

    def verify(self, proof, publics, cfg=None, vks=None) -> bool:
        return self.circuit.verify(proof, publics, cfg or self.cfg, vks)


class HeaderRangeSuccinct:
    """End-to-end succinct header_range prover: skip proof + succinct
    MapReduce aggregation + join, yielding ONE final proof.

    The TPU-native production shape of R8: the inline
    `HeaderRangeCircuit` monolith stays for small configs, while
    production ranges run the data commitment through map jobs
    (fan-out over devices, parallel/mapreduce.py) and this join."""

    def __init__(self, chain_id: str = "mocha-4", vss: int = 2,
                 nb_map_jobs: int = 2, batch_size: int = 2,
                 fetcher=None, cfg: Optional[stark.StarkConfig] = None,
                 ed_nbits=None, max_workers: int = 1,
                 checkpoint_dir: Optional[str] = None):
        from .header_range import SkipCircuit
        from .input import SkipInputFetcher
        from ..parallel.mapreduce import MapReduceProver

        self.cfg = cfg or stark.StarkConfig()
        self.fetcher = fetcher or SkipInputFetcher()
        self.skip = SkipCircuit(chain_id, vss, self.fetcher, ed_nbits)
        self.mr = MapReduceProver(
            batch_size, nb_map_jobs, self.fetcher, cfg=self.cfg,
            succinct=True, max_workers=max_workers,
            checkpoint_dir=checkpoint_dir)
        root_compiled = (self.mr.reduce_templates[-1].circuit
                         if self.mr.reduce_templates
                         else self.mr.template.circuit)
        self.join = HeaderRangeJoinCircuit(self.skip.circuit, root_compiled,
                                           self.cfg)

    @property
    def circuit(self) -> CompiledCircuit:
        """The final (join) circuit — the one proof a consumer verifies;
        also gives the function CLI its public-input metadata."""
        return self.join.circuit

    def templates(self) -> Dict[str, CompiledCircuit]:
        """Every compiled circuit the pipeline proves, by stage name (the
        reference's build artifact is likewise a set: map circuit, reduce
        circuit, outer circuit — circuits/builder.rs:301-396)."""
        d = {"skip": self.skip.circuit, "map": self.mr.template.circuit}
        for i, rc in enumerate(self.mr.reduce_templates):
            d[f"reduce{i}"] = rc.circuit
        d["join"] = self.join.circuit
        return d

    def build_function_keys(self, build_dir: str, name: str, cfg=None):
        """Function-CLI `build`: preprocessed keys for every stage circuit
        (runtime/function.py protocol for orchestrated multi-proof
        entrypoints)."""
        import os

        from ..proof import serde

        cfg = cfg or self.cfg
        tables = []
        for tname, c in self.templates().items():
            pks, vks = c.build_keys(cfg)
            serde.save_keys(
                os.path.join(build_dir, f"{name}.{tname}.keys"), pks, vks)
            tables.extend(f"{tname}:{t}" for t in c._table_names())
        return tables

    def prove_function(self, input_bytes: bytes, cfg=None, **_):
        """Function-CLI `prove`: ABI-packed input bytes -> (proof, publics)
        of the ONE final join proof (runtime/function.py protocol)."""
        assert len(input_bytes) == SKIP_IN, (
            f"header_range input must be {SKIP_IN} bytes "
            f"(trusted_block ‖ trusted_header ‖ target_block)")
        trusted_block = int.from_bytes(input_bytes[:8], "big")
        trusted_header = bytes(input_bytes[8:40])
        target_block = int.from_bytes(input_bytes[40:48], "big")
        proof, publics, _, _ = self.prove(trusted_block, target_block,
                                          trusted_header=trusted_header)
        return proof, publics

    def prove(self, trusted_block: int, target_block: int,
              trusted_header: Optional[bytes] = None):
        if trusted_header is None:
            trusted_header = self.fetcher.get_header(trusted_block).hash()
        skip_proof, skip_publics = self.skip.prove(trusted_block,
                                                   target_block, self.cfg)
        target_hash = bytes(skip_publics[SKIP_IN:SKIP_PUB])
        agg = self.mr.prove_succinct(trusted_block, target_block,
                                     target_hash)
        proof, publics = self.join.prove(
            trusted_block, trusted_header, target_block,
            (skip_proof, skip_publics),
            (agg.root_proof, agg.root_publics))
        target_hash_out = bytes(publics[48:80])
        data_commitment = bytes(publics[80:112])
        return proof, publics, target_hash_out, data_commitment

    def verify(self, proof, publics) -> bool:
        """ONE proof verifies the whole header_range statement."""
        return self.join.verify(proof, publics, self.cfg)
