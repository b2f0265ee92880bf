"""Fiat-Shamir transcript (Poseidon duplex challenger) — host-side.

Capability parity with the reference prover's challenger (SURVEY.md D5's
"challenge transcript on host"; plonky2 Challenger semantics: duplex sponge
with input/output buffering). Runs on python ints: transcript traffic is a
few hundred elements per proof, far off the device hot path, and must be
replayed identically by the verifier.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import goldilocks as gl
from ..ops import poseidon as pos


class Transcript:
    def __init__(self):
        self.state = [0] * pos.WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    # -- observing ---------------------------------------------------------

    def observe_element(self, x: int):
        assert 0 <= x < gl.P
        self.output_buffer.clear()
        self.input_buffer.append(x)
        if len(self.input_buffer) == pos.RATE:
            self._duplex()

    def observe_elements(self, xs: Sequence[int]):
        for x in xs:
            self.observe_element(int(x))

    def observe_extension(self, x):
        self.observe_element(int(x[0]))
        self.observe_element(int(x[1]))

    def observe_digest(self, digest: Sequence[int]):
        self.observe_elements(digest)

    def observe_cap(self, cap: Sequence[Sequence[int]]):
        for digest in cap:
            self.observe_digest(digest)

    def observe_bytes32(self, data: bytes):
        """Absorb 32 bytes as four 8-byte chunks split into 2x32-bit halves
        (each < 2^32 < p, so no reduction ambiguity)."""
        assert len(data) == 32
        for off in range(0, 32, 4):
            self.observe_element(int.from_bytes(data[off:off + 4], "big"))

    # -- challenges --------------------------------------------------------

    def _duplex(self):
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = pos.permute_ref(self.state)
        self.output_buffer[:] = self.state[: pos.RATE]

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        return (self.get_challenge(), self.get_challenge())

    def get_indices(self, n: int, domain_bits: int) -> List[int]:
        """n query indices in [0, 2^domain_bits) (64-bit challenge mod 2^k)."""
        return [self.get_challenge() & ((1 << domain_bits) - 1) for _ in range(n)]

    def fork(self) -> "Transcript":
        t = Transcript()
        t.state = list(self.state)
        t.input_buffer = list(self.input_buffer)
        t.output_buffer = list(self.output_buffer)
        return t
