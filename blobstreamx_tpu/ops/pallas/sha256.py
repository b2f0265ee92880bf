"""Pallas TPU kernel for batched SHA-256 over fixed-length messages.

TPU-native counterpart of the reference's Curta SHA-256 accelerator input
path (SURVEY.md D10; reference circuits/builder.rs:364 `builder.sha256`):
the witness side hashes thousands of equal-length messages (64-byte
data-root tuple leaves, 68-byte inner nodes) per proof. The XLA/numpy path
(ops/sha256.py) round-trips the 64-round state through HBM between fused
chunks; this kernel keeps the whole multi-block compression VMEM-resident,
so HBM traffic is one read of the padded message words and one write of the
digests.

Layout (Mosaic-friendly): the batch is tiled as (S sublanes, 128 lanes)
planes — every round operation is a full-width (S, 128) u32 VPU op. Word t
of block b for a tile lives at rows [(b*16+t)*S : (b*16+t+1)*S). The 64-entry
message schedule is held as unrolled per-word planes (python list), so the
whole compression is straight-line u32 vector code.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import sha256 as sha

S = 8          # sublanes per plane
LANES = 128
TILE_B = S * LANES  # messages per grid step


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _kernel(n_blocks: int, words_ref, dig_ref):
    state = [jnp.full((S, LANES), np.uint32(h)) for h in sha.H0]
    for b in range(n_blocks):
        w = [words_ref[(b * 16 + t) * S:(b * 16 + t + 1) * S]
             for t in range(16)]
        for t in range(16, 64):
            s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
            s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
            w.append(w[t - 16] + s0 + w[t - 7] + s1)
        a, b_, c, d, e, f, g, h = state
        for t in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + np.uint32(int(sha.K[t])) + w[t]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b_) ^ (a & c) ^ (b_ & c)
            t2 = S0 + maj
            a, b_, c, d, e, f, g, h = t1 + t2, a, b_, c, d + t1, e, f, g
        state = [x + y for x, y in zip(state, [a, b_, c, d, e, f, g, h])]
    for i in range(8):
        dig_ref[i * S:(i + 1) * S] = state[i]


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _compress(words: jnp.ndarray, n_blocks: int, interpret: bool = False):
    """words: (tiles * n_blocks*16*S, 128) u32 -> digests (tiles * 8*S, 128)."""
    rows_in = n_blocks * 16 * S
    tiles = words.shape[0] // rows_in
    return pl.pallas_call(
        functools.partial(_kernel, n_blocks),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((rows_in, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8 * S, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * 8 * S, LANES), jnp.uint32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=tiles * TILE_B * n_blocks * 64 * 32,
            bytes_accessed=4 * tiles * LANES * (rows_in + 8 * S),
            transcendentals=0,
        ),
    )(words)


@functools.partial(jax.jit, static_argnames=("L", "Bp", "interpret"),
                   backend=None)
def _hash_padded(msgs: jnp.ndarray, L: int, Bp: int, interpret: bool):
    """Device-side pad/pack/transpose around the kernel.

    msgs: (B, L) u8 device array -> (Bp, 32) u8 digests (rows >= B junk).
    Keeping the byte->word marshalling in XLA matters on this 2-vCPU host:
    it is ~4x the kernel time if done in numpy.
    """
    B = msgs.shape[0]
    pad = bytearray(b"\x80")
    while (L + len(pad)) % 64 != 56:
        pad.append(0)
    pad += (8 * L).to_bytes(8, "big")
    padded = jnp.concatenate(
        [msgs, jnp.broadcast_to(jnp.asarray(np.frombuffer(bytes(pad),
                                                          dtype=np.uint8)),
                                (B, len(pad)))], axis=1)
    if Bp != B:
        padded = jnp.pad(padded, [(0, Bp - B), (0, 0)])
    w4 = padded.reshape(Bp, -1, 4).astype(jnp.uint32)
    words = (w4[..., 0] << 24) | (w4[..., 1] << 16) | (w4[..., 2] << 8) | w4[..., 3]
    W = words.shape[1]
    n_blocks = W // 16
    tiles = Bp // TILE_B
    # (tiles, S, 128, W) -> (tiles, W, S, 128) -> (tiles*W*S, 128)
    planes = words.reshape(tiles, S, LANES, W).transpose(0, 3, 1, 2)
    dig = _compress(planes.reshape(tiles * W * S, LANES), n_blocks,
                    interpret=interpret)
    dig = dig.reshape(tiles, 8, S, LANES).transpose(0, 2, 3, 1).reshape(Bp, 8)
    out = jnp.stack([(dig >> 24) & 0xFF, (dig >> 16) & 0xFF,
                     (dig >> 8) & 0xFF, dig & 0xFF], axis=-1)
    return out.astype(jnp.uint8).reshape(Bp, 32)


def sha256_fixed_len(msgs: np.ndarray, interpret: bool = False) -> np.ndarray:
    """Batch-hash equal-length messages on TPU. msgs: (B, L) u8 -> (B, 32) u8.

    Drop-in for ops.sha256.sha256_fixed_len (same FIPS-180-4 padding).
    """
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    B, L = msgs.shape
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    out = _hash_padded(jnp.asarray(msgs), L, Bp, interpret)
    return np.asarray(out)[:B]
