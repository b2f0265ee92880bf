"""SHA-512 chip: witness correctness, bus-balanced prove/verify, rejection.

Mirrors tests/test_sha256_air.py; word args travel as u32 halves
(halfslot = 2*slot + half, half 0 = lo).
"""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu.chips import channels as ch
from blobstreamx_tpu.chips import sha512 as chip
from blobstreamx_tpu.ops import sha512 as sha
from blobstreamx_tpu.proof import stark, system

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)
N_ROWS = 256  # three 84-row segments + tail


def digests(messages):
    outs = []
    for blocks in messages:
        state = sha.H0[None].copy()
        for blk in np.asarray(blocks, dtype=np.uint64):
            state = sha.compress_blocks(blk[None], state)
        outs.append([int(v) for v in state[0]])
    return outs


def public_messages_for(messages):
    pubs = []
    for inst, blocks in enumerate(messages):
        for blk_i, blk in enumerate(np.asarray(blocks, dtype=np.uint64)):
            for slot in range(16):
                w = int(blk[slot])
                pubs.append((ch.SHA512_W, [inst, blk_i, 2 * slot, w & 0xFFFFFFFF], +1))
                pubs.append((ch.SHA512_W, [inst, blk_i, 2 * slot + 1, w >> 32], +1))
    for inst, words in enumerate(digests(messages)):
        for j in range(4):
            wa, we = words[j], words[4 + j]
            pubs.append((ch.SHA512_OUT_A, [inst, 2 * j, wa & 0xFFFFFFFF], -1))
            pubs.append((ch.SHA512_OUT_A, [inst, 2 * j + 1, wa >> 32], -1))
            pubs.append((ch.SHA512_OUT_E, [inst, 2 * j, we & 0xFFFFFFFF], -1))
            pubs.append((ch.SHA512_OUT_E, [inst, 2 * j + 1, we >> 32], -1))
    return pubs


def setup(messages):
    sched = chip.schedule_for(messages, N_ROWS)
    air = chip.Sha512Air(sched, N_ROWS)
    trace = chip.build_trace(messages, N_ROWS, sched)
    return air, trace, public_messages_for(messages)


def test_digests_match_hashlib():
    messages = [sha.pad_message(b"abc"), sha.pad_message(b"a" * 200)]
    got = digests(messages)
    for data, words in zip([b"abc", b"a" * 200], got):
        digest = b"".join(int(w).to_bytes(8, "big") for w in words)
        assert digest == hashlib.sha512(data).digest()


def test_prove_verify_single_and_chained():
    # one single-block message + one 2-block (chained) message
    messages = [sha.pad_message(b"abc"), sha.pad_message(b"a" * 200)]
    air, trace, pubs = setup(messages)
    spec = system.TableSpec("sha512", air, trace, [])
    proof = system.prove_system([spec], CFG)
    assert system.verify_system([air], [[]], proof, CFG, public_messages=pubs)


def test_rejects_wrong_digest_claim():
    messages = [sha.pad_message(b"abc")]
    air, trace, pubs = setup(messages)
    spec = system.TableSpec("sha512", air, trace, [])
    proof = system.prove_system([spec], CFG)
    bad = [p for p in pubs]
    chan, args, sign = bad[-1]
    bad[-1] = (chan, [args[0], args[1], (args[2] + 1) % (1 << 32)], sign)
    assert not system.verify_system([air], [[]], proof, CFG, public_messages=bad)


def test_rejects_tampered_round():
    messages = [sha.pad_message(b"abc")]
    air, trace, pubs = setup(messages)
    trace[23, chip.COL_W + 5] ^= 1
    spec = system.TableSpec("sha512", air, trace, [])
    proof = system.prove_system([spec], CFG)
    assert not system.verify_system([air], [[]], proof, CFG, public_messages=pubs)
