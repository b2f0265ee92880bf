"""Batched SHA-256 vs hashlib."""

import hashlib

import numpy as np

from blobstreamx_tpu.ops import sha256 as sha

RNG = np.random.default_rng(2)


def test_pad_and_compress_single():
    for msg in [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 64, b"a" * 100]:
        blocks = sha.pad_message(msg)
        state = np.broadcast_to(sha.H0, (1, 8)).copy()
        for i in range(blocks.shape[0]):
            state = sha.compress_blocks(blocks[i][None], state)
        digest = b"".join(int(w).to_bytes(4, "big") for w in state[0])
        assert digest == hashlib.sha256(msg).digest(), msg


def test_fixed_len_batch():
    for L in [1, 32, 34, 55, 64, 65, 72, 100]:
        msgs = RNG.integers(0, 256, size=(7, L), dtype=np.uint8)
        got = sha.sha256_fixed_len(msgs)
        for i in range(7):
            assert bytes(got[i]) == hashlib.sha256(bytes(msgs[i])).digest(), L


def test_trace_final_state_consistency():
    msgs = RNG.integers(0, 256, size=(3, 64), dtype=np.uint8)
    words = msgs.reshape(3, 16, 4)
    blocks = (
        (words[..., 0].astype(np.uint32) << 24)
        | (words[..., 1].astype(np.uint32) << 16)
        | (words[..., 2].astype(np.uint32) << 8)
        | words[..., 3]
    )
    state_in = np.broadcast_to(sha.H0, (3, 8)).copy()
    out, tr = sha.compress_blocks(blocks, state_in, trace=True)
    assert np.array_equal(out, tr["state"][:, 64] + state_in)
    assert np.array_equal(tr["state"][:, 0], state_in)
    assert tr["w"].shape == (3, 64)
