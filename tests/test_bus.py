"""LogUp bus across tables: multiset balance, public messages, rejection."""

import numpy as np
import pytest

from blobstreamx_tpu.proof import stark, system
from blobstreamx_tpu.proof.air import Air

pytestmark = pytest.mark.proof  # tiny-config proving tier (see pytest.ini)

CFG = stark.StarkConfig(
    rate_bits=3, cap_height=1, num_query_rounds=8, pow_bits=4, final_poly_bits=2
)
CH = 7


class SenderAir(Air):
    """cols (val, mult): sends (CH, [val]) with multiplicity `mult`."""

    width = 2
    max_constraint_degree = 3

    def eval(self, b):
        b.send(CH, [b.local(0)], b.local(1))


class ReceiverAir(Air):
    """col (val): receives (CH, [val]) once per row."""

    width = 1
    max_constraint_degree = 3

    def eval(self, b):
        b.receive(CH, [b.local(0)], b.const(1))


def make_specs():
    a = np.array([[5, 2], [9, 1], [0, 0], [0, 0]], dtype=np.uint64)
    r = np.array([[5], [5], [9], [13]], dtype=np.uint64)
    return [
        system.TableSpec("sender", SenderAir(), a, []),
        system.TableSpec("receiver", ReceiverAir(), r, []),
    ]


PUB = [(CH, [13], +1)]


def test_bus_roundtrip():
    specs = make_specs()
    proof = system.prove_system(specs, CFG)
    assert system.verify_system(
        [s.air for s in specs], [[], []], proof, CFG, public_messages=PUB
    )


def test_bus_rejects_unbalanced():
    specs = make_specs()
    specs[1].trace[3, 0] = 14  # receiver claims a value nobody sent
    proof = system.prove_system(specs, CFG)
    assert not system.verify_system(
        [s.air for s in specs], [[], []], proof, CFG, public_messages=PUB
    )


def test_bus_rejects_missing_public():
    specs = make_specs()
    proof = system.prove_system(specs, CFG)
    assert not system.verify_system(
        [s.air for s in specs], [[], []], proof, CFG, public_messages=[]
    )


def test_bus_rejects_forged_total():
    specs = make_specs()
    proof = system.prove_system(specs, CFG)
    t = proof.bus_totals[0]
    proof.bus_totals[0] = ((t[0] + 1) % stark.gl.P, t[1])
    assert not system.verify_system(
        [s.air for s in specs], [[], []], proof, CFG, public_messages=PUB
    )
