"""Adversarial tests of the Tendermint light-client circuits (VERDICT item:
attack the circuits, not just the chips): forged signature, insufficient
quorum, broken header linkage, wrong chain-id, bad trusted overlap — every
attack must be rejected, either by witness-generation asserts or by the
witness-level constraint/bus check (proof.check.witness_check evaluates
exactly what the STARK enforces; see its docstring).

Reference counterpart: tendermintx's step/skip security properties
(SURVEY.md D13/D14); the reference repo itself never tests these (gap).
"""

import pytest

from blobstreamx_tpu.circuits.input import (
    SkipInputFetcher, StepInputFetcher,
)
from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
from blobstreamx_tpu.circuits.header_range import HeaderRangeCircuit
from blobstreamx_tpu.proof.check import witness_check

pytestmark = pytest.mark.proof


def rejected(circuit, pub_in) -> bool:
    """An attack is rejected if witness generation blows up or the witness
    fails constraints/bus balance."""
    try:
        return not witness_check(circuit.circuit, pub_in)
    except Exception:
        return True


# -- tamper hooks -------------------------------------------------------------

class TamperStepFetcher(StepInputFetcher):
    def __init__(self, tamper, *a, **kw):
        super().__init__(*a, **kw)
        self.tamper = tamper

    def get_step_inputs(self, prev_block, vss):
        inp = super().get_step_inputs(prev_block, vss)
        self.tamper(inp)
        return inp


class TamperSkipFetcher(SkipInputFetcher):
    def __init__(self, tamper, *a, **kw):
        super().__init__(*a, **kw)
        self.tamper = tamper

    def get_skip_inputs(self, trusted_block, target_block, vss):
        inp = super().get_skip_inputs(trusted_block, target_block, vss)
        self.tamper(inp)
        return inp


def step_circuit(tamper):
    return NextHeaderCircuit(vss=2, fetcher=TamperStepFetcher(tamper))


def skip_circuit(tamper):
    return HeaderRangeCircuit(vss=2, nb_map_jobs=1, batch_size=4,
                              fetcher=TamperSkipFetcher(tamper))


def step_inputs(c):
    return c.make_public_inputs(10000, c.fetcher.get_header(10000).hash())


def skip_inputs(c):
    return c.make_public_inputs(10000, c.fetcher.get_header(10000).hash(),
                                10004)


# -- baseline: honest witness passes the same oracle --------------------------

def test_honest_step_witness_passes():
    c = NextHeaderCircuit(vss=2)
    assert witness_check(c.circuit, step_inputs(c))


def test_honest_skip_witness_passes():
    c = HeaderRangeCircuit(vss=2, nb_map_jobs=1, batch_size=4)
    assert witness_check(c.circuit, skip_inputs(c))


# -- step attacks -------------------------------------------------------------

def test_forged_signature_rejected():
    """Flip one byte of a signed validator's Ed25519 signature."""
    def tamper(inp):
        for v in inp.validators:
            if v.signed:
                sig = bytearray(v.signature)
                sig[0] ^= 1
                v.signature = bytes(sig)
                return
        raise AssertionError("no signed validator in fixture")

    c = step_circuit(tamper)
    assert rejected(c, step_inputs(c))


def test_insufficient_target_quorum_rejected():
    """Claim the signer did not sign: voting power below 2/3."""
    def tamper(inp):
        for v in inp.validators:
            if v.signed:
                v.signed = False
                v.signature = bytes(64)
                v.msg = b""

    c = step_circuit(tamper)
    assert rejected(c, step_inputs(c))


def test_broken_header_link_rejected():
    """prev_header public input not the real parent hash: the
    last_block_id linkage + next_validators_hash binds must fail."""
    c = NextHeaderCircuit(vss=2)
    pub = step_inputs(c)
    pub[8] = (pub[8] + 1) % 256  # first byte of prev_header_hash
    assert rejected(c, pub)


def test_wrong_chain_id_rejected():
    """Circuit pinned to a different chain id: fixture votes sign
    'mocha-4' messages, the circuit demands 'mocha-5' sign-bytes."""
    c = NextHeaderCircuit(chain_id="mocha-5",
                          fetcher=StepInputFetcher(), vss=2)
    assert rejected(c, step_inputs(c))


def test_forged_vote_message_rejected():
    """Signed validator presents a sign-bytes blob for a different header
    (swap in another height's vote message)."""
    def tamper(inp):
        f = StepInputFetcher()
        other = f.get_step_inputs(10001, 2)  # votes for height 10002
        for v, o in zip(inp.validators, other.validators):
            if v.signed and o.signed:
                v.msg = o.msg
                v.signature = o.signature
                return

    c = step_circuit(tamper)
    assert rejected(c, step_inputs(c))


# -- skip attacks -------------------------------------------------------------

def test_insufficient_trusted_overlap_rejected():
    """No trusted validator marked as overlapping: <1/3 trusted power."""
    def tamper(inp):
        for v in inp.trusted_validators:
            v.signed = False

    c = skip_circuit(tamper)
    assert rejected(c, skip_inputs(c))


def test_overlap_points_to_nonsigner_rejected():
    """Trusted validator claims overlap with a target slot that did not
    sign (or has a different pubkey)."""
    def tamper(inp):
        # find an unsigned target slot, point every overlap at it
        bad = next(i for i, v in enumerate(inp.target_validators)
                   if not v.signed)
        inp.overlap_indices = [bad] * len(inp.overlap_indices)

    c = skip_circuit(tamper)
    assert rejected(c, skip_inputs(c))


def test_tampered_trusted_val_hash_rejected():
    """Trusted-validators inclusion proof against a tampered leaf."""
    def tamper(inp):
        leaf, aunts = inp.trusted_val_proof
        leaf = bytearray(leaf)
        leaf[5] ^= 1
        inp.trusted_val_proof = (bytes(leaf), aunts)

    c = skip_circuit(tamper)
    assert rejected(c, skip_inputs(c))
