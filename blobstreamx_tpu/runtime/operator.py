"""Operator loop — parity with reference bin/blobstreamx.rs (R11).

Continuous light-client driver: read contract state, look at the chain
head, binary-search the farthest valid skip target, request a header_range
(skip) or next_header (step) proof, and commit the verified output.

The chain + prover boundaries are injected (fixture-backed in tests, RPC +
TPU prover service in production), mirroring the reference's operator that
talks to Tendermint RPC and the Succinct platform.
"""

from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass
from typing import Optional

from ..circuits.input import StepInputFetcher
from ..tendermint import vote as tvote
from .contract import BlobstreamXContract
from .service import LocalProverService

log = logging.getLogger("blobstreamx_tpu.operator")


class FixtureChainFetcher(StepInputFetcher):
    """Operator-side chain access over recorded fixtures — the counterpart
    of reference circuits/fetcher.rs (R7)."""

    def __init__(self, fixture_path: str, head: int):
        super().__init__(fixture_path)
        self.head = head

    def get_latest_block_number(self) -> int:
        return self.head

    def get_validators(self, height: int):
        blk = self.get_signed_block(height)
        return [tvote.Validator.from_json(v)
                for v in blk["validator_set"]["validators"]]

    def get_commit(self, height: int) -> tvote.Commit:
        return tvote.Commit.from_json(self.get_signed_block(height)["commit"])

    def get_chain_id(self, height: int) -> str:
        return self.get_signed_block(height)["header"]["chain_id"]

    def is_valid_skip(self, trusted_block: int, target_block: int) -> bool:
        """>=1/3 of the trusted set's power signed the target commit
        (reference circuits/fetcher.rs:76-85)."""
        trusted = self.get_validators(trusted_block)
        commit = self.get_commit(target_block)
        return tvote.is_valid_skip(trusted, commit, self.get_chain_id(target_block))

    def find_block_to_request(self, trusted_block: int, max_end: int) -> int:
        """Binary search for the farthest valid skip target
        (reference circuits/fetcher.rs:60-87)."""
        lo, hi = trusted_block + 1, max_end
        best = trusted_block + 1
        while lo <= hi:
            mid = (lo + hi) // 2
            if self.is_valid_skip(trusted_block, mid):
                best = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return best


@dataclass
class OperatorConfig:
    """Reference env defaults (bin/blobstreamx.rs:329-354)."""

    loop_delay_secs: float = 300.0
    update_delay_blocks: int = 300
    data_commitment_max: int = 1000
    block_interval: int = 1  # round target down to a multiple


class BlobstreamXOperator:
    def __init__(self, contract: BlobstreamXContract,
                 fetcher: FixtureChainFetcher,
                 service: LocalProverService,
                 header_range_function_id: bytes,
                 next_header_function_id: bytes,
                 config: OperatorConfig = OperatorConfig()):
        self.contract = contract
        self.fetcher = fetcher
        self.service = service
        self.header_range_fid = header_range_function_id
        self.next_header_fid = next_header_function_id
        self.config = config
        self._commit_lock = threading.Lock()
        # bumped by run() for every new iteration; a zombie iteration from
        # an older generation has its commit dropped (reference's tokio
        # timeout cancels the task outright; Python can't cancel compute,
        # so instead the zombie finishes its RPC/prove work lock-free and
        # only its final commit is fenced)
        self._generation = 0

    # -- request encoding (reference bin/blobstreamx.rs:25-27) -------------
    def _header_range_input(self, trusted_block: int, trusted_header: bytes,
                            target_block: int) -> bytes:
        return (trusted_block.to_bytes(8, "big") + trusted_header
                + target_block.to_bytes(8, "big"))

    def _next_header_input(self, trusted_block: int,
                           trusted_header: bytes) -> bytes:
        return trusted_block.to_bytes(8, "big") + trusted_header

    # -- commit fencing ----------------------------------------------------
    def _try_commit(self, generation: Optional[int], latest_seen: int,
                    do_commit) -> bool:
        """Serialize contract commits and drop stale ones: a commit is
        applied only if (a) no newer iteration has started since this one
        (generation fence) and (b) the contract's latest_block is still the
        one this iteration planned against (staleness check)."""
        with self._commit_lock:
            if generation is not None and generation != self._generation:
                log.warning("dropping zombie commit (generation %d != %d)",
                            generation, self._generation)
                return False
            if self.contract.latest_block != latest_seen:
                log.warning("dropping stale commit: contract moved "
                            "(%d != planned %d)", self.contract.latest_block,
                            latest_seen)
                return False
            do_commit()
            return True

    # -- one loop iteration (reference :177-301) ---------------------------
    def process_iteration(self, generation: Optional[int] = None
                          ) -> Optional[str]:
        c = self.contract
        latest = c.latest_block
        trusted_header = c.block_height_to_header_hash[latest]
        head = self.fetcher.get_latest_block_number()
        max_block = min(head - 1, latest + self.config.data_commitment_max)
        if self.config.block_interval > 1:
            max_block -= max_block % self.config.block_interval
        if max_block <= latest:
            log.info("contract is up to date (latest=%d head=%d)", latest, head)
            return None
        target = self.fetcher.find_block_to_request(latest, max_block)
        if target - latest == 1:
            log.info("step %d -> %d", latest, target)
            rid = self.service.submit_request(
                self.next_header_fid,
                self._next_header_input(latest, trusted_header),
            )
            req = self.service.get_request(rid)
            if req.status != "success":
                log.error("next_header proof failed: %s", req.error)
                return rid
            next_header = req.output_bytes[:32]
            commitment = req.output_bytes[32:64]
            self._try_commit(
                generation, latest,
                lambda: c.commit_next_header(latest, next_header, commitment))
        else:
            log.info("skip %d -> %d", latest, target)
            rid = self.service.submit_request(
                self.header_range_fid,
                self._header_range_input(latest, trusted_header, target),
            )
            req = self.service.get_request(rid)
            if req.status != "success":
                log.error("header_range proof failed: %s", req.error)
                return rid
            target_header = req.output_bytes[:32]
            commitment = req.output_bytes[32:64]
            self._try_commit(
                generation, latest,
                lambda: c.commit_header_range(latest, target, target_header,
                                              commitment))
        return rid

    def run(self, max_iterations: int = None, iteration_timeout: float = 180.0):
        """Reference run loop (bin/blobstreamx.rs:304-321): each iteration is
        hard-bounded by `iteration_timeout` (reference's 3-minute tokio
        timeout, :39,308-316) — a stuck iteration is abandoned and the loop
        moves on instead of blocking the light client forever. The abandoned
        iteration keeps running on a daemon thread (Python can't cancel
        compute) but WITHOUT holding any lock, so new iterations make
        progress immediately; a zombie's late commit is dropped by the
        generation fence in `_try_commit` (it can never overwrite the work
        of a newer iteration)."""
        i = 0
        while max_iterations is None or i < max_iterations:
            done = threading.Event()
            result: dict = {}
            self._generation = i
            gen = i

            def _iter(done=done, result=result, gen=gen):
                try:
                    result["rid"] = self.process_iteration(generation=gen)
                except Exception:
                    log.exception("iteration failed; continuing")
                finally:
                    done.set()

            t = threading.Thread(target=_iter, daemon=True)
            t.start()
            if not done.wait(iteration_timeout):
                log.error("iteration %d exceeded %.0fs timeout; abandoning",
                          i, iteration_timeout)
            i += 1
            if max_iterations is None:
                time.sleep(self.config.loop_delay_secs)
