"""Ed25519 EC chip: toy-scalar prove/verify of [S]B == R + [k]A.

The toy config (16-bit scalars) exercises every row type and constraint of
the chip on a 64-row trace; the production config (512/256-bit scalars,
2048 rows/signature) is the same template and is exercised by the slow
next-header circuit test. The chip proves only the EC equation for
bus-provided scalars/points — the link k = SHA512(R||A||M) is enforced by
the CPU + SHA-512 chips in the full circuit.
"""

from dataclasses import dataclass

import numpy as np
import pytest

from blobstreamx_tpu.chips import bytes as bytes_chip
from blobstreamx_tpu.chips import ed25519 as chip
from blobstreamx_tpu.chips import range16
from blobstreamx_tpu.proof import stark, system
from blobstreamx_tpu.tendermint import ed25519 as ed

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)
NBITS = 16


@dataclass
class ToySig(chip.SigWitness):
    k_toy: int = 0

    def k512(self) -> int:
        return self.k_toy


def neg(p):
    x, y, z, t = p
    return (ed.P - x, y, z, ed.P - t)


def make_toy_sig(seed: int) -> ToySig:
    import random

    rng = random.Random(seed)
    a = rng.randrange(1, ed.L)
    A = ed.scalar_mul(a, ed.BASE)
    k = rng.randrange(0, 1 << NBITS)
    s = rng.randrange(1, 1 << NBITS)
    # R = [s]B - [k]A so that [s]B == R + [k]A holds for the toy scalars
    R = ed.point_add(ed.scalar_mul(s, ed.BASE), ed.scalar_mul(k, neg(A)))
    sig = ed.compress(R) + s.to_bytes(32, "little")
    return ToySig(pubkey=ed.compress(A), msg=b"", signature=sig, k_toy=k)


def setup(sigs):
    air = chip.Ed25519Air(
        [chip.SigInfo(i) for i in range(len(sigs))],
        n_rows=64 * len(sigs),
        nbits_a=NBITS, nbits_b=NBITS,
    )
    trace = chip.build_trace(air, sigs)
    return air, trace


def test_witness_constraints_vanish():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from air_debug import check_air_on_trace

    air, trace = setup([make_toy_sig(3)])
    fails = check_air_on_trace(air, trace)
    assert fails == [], fails[:5]


def test_invalid_equation_rejected_at_witness():
    sig = make_toy_sig(4)
    sig.k_toy ^= 1  # equation no longer holds
    air = chip.Ed25519Air([chip.SigInfo(0)], 64, NBITS, NBITS)
    with pytest.raises(AssertionError):
        chip.build_trace(air, [sig])


@pytest.mark.slow
def test_prove_verify_toy():
    sigs = [make_toy_sig(5)]
    air, trace = setup(sigs)
    r16, r8 = chip.range_counts(air, trace)
    specs = [
        system.TableSpec("ed", air, trace, []),
        system.TableSpec("range16", range16.Range16Air(), range16.build_trace(r16), []),
        system.TableSpec("bytes", bytes_chip.BytesAir(), bytes_chip.build_trace(r8), []),
    ]
    proof = system.prove_system(specs, CFG)
    airs = [air, range16.Range16Air(), bytes_chip.BytesAir()]
    pubs = chip.public_messages_for(air, sigs)
    assert system.verify_system(airs, [[], [], []], proof, CFG, public_messages=pubs)
    # wrong claimed scalar limb must fail
    bad = list(pubs)
    for i, (c, args, s) in enumerate(bad):
        if c == chip.ch.ED_SCALAR:
            bad[i] = (c, [args[0], args[1], args[2], args[3] ^ 1], s)
            break
    assert not system.verify_system(airs, [[], [], []], proof, CFG, public_messages=bad)
