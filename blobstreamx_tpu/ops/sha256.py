"""SHA-256: batched host-side implementation with full round-trace export.

Capability parity with the reference's SHA-256 gadget stack (SURVEY.md D10:
plonky2x ``builder.sha256`` backed by a Curta STARK accelerator — see
reference circuits/builder.rs:364). In this framework SHA-256 is proved by a
dedicated uniform AIR table (proof/sha_air.py); this module provides:

  * ``sha256`` — plain digest (delegates to hashlib; correctness anchor)
  * ``pad_message`` — FIPS-180-4 padding to 512-bit blocks
  * ``compress_blocks`` — vectorized numpy compression over a batch of
    blocks, optionally exporting every intermediate round state (the AIR
    trace witness).

All word arithmetic is uint32 (wrapping), matching what the TPU-side AIR
constraints check bit-wise.
"""

from __future__ import annotations

import hashlib

import numpy as np

H0 = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

K = np.array(
    [0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
     0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
     0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
     0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
     0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
     0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
     0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
     0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
     0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
     0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
     0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2],
    dtype=np.uint32,
)


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def pad_message(msg: bytes) -> np.ndarray:
    """FIPS-180-4 pad -> (n_blocks, 16) uint32 big-endian words."""
    length = len(msg)
    padded = bytearray(msg)
    padded.append(0x80)
    while len(padded) % 64 != 56:
        padded.append(0)
    padded += (8 * length).to_bytes(8, "big")
    arr = np.frombuffer(bytes(padded), dtype=">u4").astype(np.uint32)
    return arr.reshape(-1, 16)


def _rotr(x: np.ndarray, n: int) -> np.ndarray:
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _shr(x: np.ndarray, n: int) -> np.ndarray:
    return x >> np.uint32(n)


def message_schedule(blocks: np.ndarray) -> np.ndarray:
    """(B, 16) -> (B, 64) expanded schedule w."""
    B = blocks.shape[0]
    w = np.zeros((B, 64), dtype=np.uint32)
    w[:, :16] = blocks
    for t in range(16, 64):
        s0 = _rotr(w[:, t - 15], 7) ^ _rotr(w[:, t - 15], 18) ^ _shr(w[:, t - 15], 3)
        s1 = _rotr(w[:, t - 2], 17) ^ _rotr(w[:, t - 2], 19) ^ _shr(w[:, t - 2], 10)
        w[:, t] = w[:, t - 16] + s0 + w[:, t - 7] + s1
    return w


def compress_blocks(blocks: np.ndarray, state_in: np.ndarray, trace: bool = False):
    """Vectorized compression.

    blocks: (B, 16) uint32; state_in: (B, 8) uint32.
    Returns state_out (B, 8); if trace, also a dict with per-round arrays:
      w (B, 64), state (B, 65, 8) where state[:, t] is (a..h) *before* round t.
    """
    blocks = np.ascontiguousarray(blocks, dtype=np.uint32)
    state_in = np.ascontiguousarray(state_in, dtype=np.uint32)
    B = blocks.shape[0]
    w = message_schedule(blocks)
    vars_ = [state_in[:, i].copy() for i in range(8)]
    states = np.zeros((B, 65, 8), dtype=np.uint32) if trace else None
    for t in range(64):
        a, b, c, d, e, f, g, h = vars_
        if trace:
            states[:, t] = np.stack(vars_, axis=1)
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + K[t] + w[:, t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        vars_ = [t1 + t2, a, b, c, d + t1, e, f, g]
    if trace:
        states[:, 64] = np.stack(vars_, axis=1)
    state_out = np.stack(vars_, axis=1) + state_in
    if trace:
        return state_out, {"w": w, "state": states}
    return state_out


PALLAS_THRESHOLD = 2048  # messages; below this the numpy path wins


def sha256_fixed_len(msgs: np.ndarray) -> np.ndarray:
    """Batch-hash equal-length messages.

    msgs: (B, L) uint8. Returns (B, 32) uint8 digests. Vectorized across the
    batch (all messages share the same padding/block count). Large batches
    on TPU run the fused Pallas kernel (ops/pallas/sha256.py: all blocks and
    all 64 rounds VMEM-resident).
    """
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    if msgs.shape[0] >= PALLAS_THRESHOLD:
        from .poseidon import _on_tpu

        if _on_tpu():
            from .pallas import sha256 as psha

            return psha.sha256_fixed_len(msgs)
    B, L = msgs.shape
    pad = bytearray(b"\x80")
    while (L + len(pad)) % 64 != 56:
        pad.append(0)
    pad += (8 * L).to_bytes(8, "big")
    padded = np.concatenate(
        [msgs, np.broadcast_to(np.frombuffer(bytes(pad), dtype=np.uint8), (B, len(pad)))],
        axis=1,
    )
    words = padded.reshape(B, -1, 4)
    words = (
        words[..., 0].astype(np.uint32) << 24
    ) | (words[..., 1].astype(np.uint32) << 16) | (
        words[..., 2].astype(np.uint32) << 8
    ) | words[..., 3].astype(np.uint32)
    n_blocks = words.shape[1] // 16
    state = np.broadcast_to(H0, (B, 8)).copy()
    for blk in range(n_blocks):
        state = compress_blocks(words[:, blk * 16:(blk + 1) * 16], state)
    out = np.zeros((B, 32), dtype=np.uint8)
    for i in range(8):
        out[:, 4 * i] = state[:, i] >> 24
        out[:, 4 * i + 1] = (state[:, i] >> 16) & 0xFF
        out[:, 4 * i + 2] = (state[:, i] >> 8) & 0xFF
        out[:, 4 * i + 3] = state[:, i] & 0xFF
    return out
