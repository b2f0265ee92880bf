"""SHA-256 chip: witness correctness, bus-balanced prove/verify, rejection.

The chip is proved standalone; the verifier plays the CPU's role through
public bus messages (sends the message words, receives the digests).
"""

import hashlib

import numpy as np
import pytest

from blobstreamx_tpu.chips import channels as ch
from blobstreamx_tpu.chips import sha256 as chip
from blobstreamx_tpu.ops import sha256 as sha
from blobstreamx_tpu.proof import stark, system

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)
N_ROWS = 256  # three 68-row segments + tail


def message_blocks(data: bytes) -> np.ndarray:
    return sha.pad_message(data)


def public_messages_for(messages):
    """Bus messages the verifier contributes: +W words, -digest words."""
    pubs = []
    for inst, blocks in enumerate(messages):
        for blk_i, blk in enumerate(np.asarray(blocks, dtype=np.uint32)):
            for slot in range(16):
                pubs.append((ch.SHA_W, [inst, blk_i, slot, int(blk[slot])], +1))
    for inst, words in enumerate(chip.digests(messages)):
        for j in range(4):
            pubs.append((ch.SHA_OUT_A, [inst, j, words[j]], -1))
            pubs.append((ch.SHA_OUT_E, [inst, j, words[4 + j]], -1))
    return pubs


def setup(messages):
    sched = chip.schedule_for(messages, N_ROWS)
    air = chip.Sha256Air(sched, N_ROWS)
    trace = chip.build_trace(messages, N_ROWS, sched)
    return air, trace, public_messages_for(messages)


def test_digests_match_hashlib():
    messages = [message_blocks(b"abc"), message_blocks(b"a" * 100)]
    got = chip.digests(messages)
    for data, words in zip([b"abc", b"a" * 100], got):
        digest = b"".join(int(w).to_bytes(4, "big") for w in words)
        assert digest == hashlib.sha256(data).digest()


def test_prove_verify_single_and_chained():
    # one single-block message + one 2-block (chained) message
    messages = [message_blocks(b"abc"), message_blocks(b"a" * 100)]
    air, trace, pubs = setup(messages)
    spec = system.TableSpec("sha", air, trace, [])
    proof = system.prove_system([spec], CFG)
    assert system.verify_system([air], [[]], proof, CFG, public_messages=pubs)


def test_rejects_wrong_digest_claim():
    messages = [message_blocks(b"abc")]
    air, trace, pubs = setup(messages)
    spec = system.TableSpec("sha", air, trace, [])
    proof = system.prove_system([spec], CFG)
    bad = [p for p in pubs]
    # claim a digest word off by one
    chan, args, sign = bad[-1]
    bad[-1] = (chan, [args[0], args[1], (args[2] + 1) % (1 << 32)], sign)
    assert not system.verify_system([air], [[]], proof, CFG, public_messages=bad)


def test_rejects_tampered_round():
    messages = [message_blocks(b"abc")]
    air, trace, pubs = setup(messages)
    trace[23, chip.COL_W + 5] ^= 1
    spec = system.TableSpec("sha", air, trace, [])
    proof = system.prove_system([spec], CFG)
    assert not system.verify_system([air], [[]], proof, CFG, public_messages=pubs)
