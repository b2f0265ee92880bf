"""Executable soundness-boundary vectors (VERDICT r4 Weak #7): the
PARITY.md "documented divergences" pinned by concrete adversarial inputs
instead of prose.

1. Ed25519 small-order components: the chip computes [k512]A with the
   FULL 512-bit challenge (chips/ed25519.py:6-8) while the host layer
   reduces k mod L (tendermint/ed25519.py:verify). For prime-order keys
   the two are IDENTICAL ([k512]A = [k512 mod L]A when ord(A) = L).
   A key with a small-order component can make them diverge; these tests
   construct the explicit divergent vector and pin why Celestia reality
   makes it safe: witness generation gates every signature through the
   host verifier first, so a chip-stricter rejection can only cost
   liveness (a proof fails to build), never safety — and all fixture
   validator keys are verified prime-order, where no divergence exists.

2. Nonzero-round commits: the circuit pins the round-0 canonical
   precommit layout (circuits/tendermint.py:215-260 — byte 12 must be the
   block_id tag 0x22, which a round field would displace). A synthetic
   chain honestly signed at round 1 verifies at the HOST layer (vote.py
   supports any round) but must be rejected by the CIRCUIT: a liveness
   divergence (the light client stalls until a round-0 commit exists),
   never acceptance of a forged header.
"""

import pytest

from blobstreamx_tpu.tendermint import ed25519 as ed

L, P8 = ed.L, 8


def _small_order_point():
    """Find a point of order 8 (kill the prime-order part of a mixed
    point with [L])."""
    for i in range(256):
        cand = ed.decompress(bytes([i]) + bytes(31))
        if cand is None:
            continue
        t = ed.scalar_mul(L, cand)
        if (ed.point_equal(ed.scalar_mul(8, t), ed.IDENTITY)
                and not ed.point_equal(ed.scalar_mul(4, t), ed.IDENTITY)
                and not ed.point_equal(ed.scalar_mul(2, t), ed.IDENTITY)
                and not ed.point_equal(t, ed.IDENTITY)):
            return t
    raise AssertionError("no order-8 point found")


def _accepts(e: int, m: int) -> bool:
    """Acceptance predicate for pubkey T (order 8), R = [r]B + [m]T,
    S = r, challenge scalar e:  [S]B == R + [e]T  <=>  8 | (m + e)."""
    return (m + e) % 8 == 0


def test_prime_order_keys_reduced_and_unreduced_agree():
    """For every fixture validator key (prime order), [k512]A equals
    [k512 mod L]A — the chip and host semantics are identical on all
    honest Celestia keys."""
    import base64
    import json

    from blobstreamx_tpu.circuits.input import DEFAULT_FIXTURES

    blk = json.load(open(
        f"{DEFAULT_FIXTURES}/10001/signed_block.json"))["result"]
    for v in blk["validator_set"]["validators"]:
        a = ed.decompress(base64.b64decode(v["pub_key"]["value"]))
        assert a is not None
        # prime order: [L]A == identity (no small-order component)
        assert ed.point_equal(ed.scalar_mul(L, a), ed.IDENTITY)
        # hence [k512]A == [k512 mod L]A for any k512
        k512 = 1234567890123456789012345678901234567890 + 7 * L
        assert ed.point_equal(ed.scalar_mul(k512, a),
                              ed.scalar_mul(k512 % L, a))


def test_small_order_key_divergent_vector():
    """The explicit gray-zone vector: a pubkey that IS a small-order
    point, and a signature the host (reduced-k) verifier ACCEPTS but the
    chip's unreduced [k512] semantics REJECTS."""
    t_pt = _small_order_point()
    a_bytes = ed.compress(t_pt)
    r_scalar = 12345

    found = None
    for msg_i in range(64):
        msg = b"divergence-%d" % msg_i
        for m in range(8):
            r_pt = ed.point_add(ed.scalar_mul(r_scalar, ed.BASE),
                                ed.scalar_mul(m, t_pt))
            r_bytes = ed.compress(r_pt)
            sig = r_bytes + r_scalar.to_bytes(32, "little")
            w = ed.verify_witness(a_bytes, msg, sig)
            acc_reduced = _accepts(w.k % 8, m)
            acc_unreduced = _accepts(w.k512 % 8, m)
            # sanity: the host verifier implements the reduced semantics
            assert ed.verify(a_bytes, msg, sig) == acc_reduced
            if acc_reduced and not acc_unreduced:
                found = (msg, m, w)
                break
        if found:
            break
    assert found is not None, "no divergent vector found (unexpected)"
    msg, m, w = found
    # pin the divergence direction: host accepts, chip is STRICTER
    # (rejects) — can only cost liveness, never admit a forged vote.
    assert ed.verify(a_bytes, msg, ed.compress(
        ed.point_add(ed.scalar_mul(r_scalar, ed.BASE),
                     ed.scalar_mul(m, t_pt))) +
        r_scalar.to_bytes(32, "little"))
    assert not _accepts(w.k512 % 8, m)
    # and witness generation gates on the host verifier, so the divergent
    # signature would be marked signed=True only after host acceptance;
    # the chip then refuses to prove it: no soundness path exists where
    # the chip accepts something the host rejected for a prime-order key.


def test_synthetic_round1_commit_host_accepts():
    """Host layer verifies commits at any round (vote.py encodes the
    round field)."""
    import tempfile

    from blobstreamx_tpu.circuits.input import StepInputFetcher
    from blobstreamx_tpu.testing.synthetic import make_chain_dir
    from blobstreamx_tpu.tendermint import vote as tvote

    d = tempfile.mkdtemp()
    make_chain_dir(d, n_validators=2, start=10000, n_blocks=2,
                   commit_round=1)
    f = StepInputFetcher(d)
    blk = f.get_signed_block(10001)
    commit = tvote.Commit.from_json(blk["commit"])
    vals = [tvote.Validator.from_json(v)
            for v in blk["validator_set"]["validators"]]
    assert all(tvote.verify_commit(commit, vals, "mocha-4"))
    # round-1 sign bytes are 9 bytes longer (0x19 tag + sfixed64 round)
    s0 = commit.signatures[0]
    assert len(commit.vote_sign_bytes("mocha-4", 0)) == 9 + len(
        tvote.canonical_vote_bytes(10001, 0, commit.block_id_hash, 1,
                                   commit.part_hash, s0.time_seconds,
                                   s0.time_nanos, "mocha-4"))


@pytest.mark.proof
def test_circuit_rejects_round1_commit():
    """The circuit's pinned round-0 layout must reject an honestly-signed
    round-1 commit (liveness divergence, documented in PARITY.md)."""
    import tempfile

    from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
    from blobstreamx_tpu.circuits.input import StepInputFetcher
    from blobstreamx_tpu.proof.check import witness_check

    d = tempfile.mkdtemp()
    from blobstreamx_tpu.testing.synthetic import make_chain_dir

    make_chain_dir(d, n_validators=2, start=10000, n_blocks=2,
                   commit_round=1, ranges=[(10000, 10001)])
    nh = NextHeaderCircuit(vss=2, fetcher=StepInputFetcher(d))
    f = nh.fetcher
    pub_in = nh.make_public_inputs(10000, f.get_header(10000).hash())
    try:
        ok = witness_check(nh.circuit, pub_in)
    except Exception:
        ok = False
    assert not ok


@pytest.mark.proof
def test_circuit_accepts_synthetic_round0_chain():
    """Control: the same synthetic generator at round 0 proves cleanly —
    the rejection above is caused by the round, not the synthesis."""
    import tempfile

    from blobstreamx_tpu.circuits.next_header import NextHeaderCircuit
    from blobstreamx_tpu.circuits.input import StepInputFetcher
    from blobstreamx_tpu.proof.check import witness_check
    from blobstreamx_tpu.testing.synthetic import make_chain_dir

    d = tempfile.mkdtemp()
    chain = make_chain_dir(d, n_validators=2, start=10000, n_blocks=2,
                           commit_round=0, ranges=[(10000, 10001)])
    nh = NextHeaderCircuit(vss=2, fetcher=StepInputFetcher(d))
    f = nh.fetcher
    pub_in = nh.make_public_inputs(10000, f.get_header(10000).hash())
    assert witness_check(nh.circuit, pub_in)
    vals = nh.circuit.generate_witness(pub_in)
    publics = nh.circuit.public_values(vals)
    assert bytes(publics[40:72]) == chain.headers[10001].hash()
