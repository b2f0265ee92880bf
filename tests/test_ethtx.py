"""Ethereum tx path (runtime/ethtx.py) — R12 parity: signed raw
transactions, EIP-155 vectors, sender recovery, mock-node relay round trip
(reference bin/local_relay.rs:60-80).
"""

import pytest

from blobstreamx_tpu.runtime import ethtx as et


def test_keccak256_vectors():
    assert et.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert et.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # block-boundary lengths exercise the padding edge cases
    assert et.keccak256(b"x" * 135) != et.keccak256(b"x" * 136)
    import hashlib
    # keccak != sha3-256 (different padding)
    assert et.keccak256(b"abc") != hashlib.sha3_256(b"abc").digest()


def test_rlp_roundtrip():
    cases = [
        b"",
        b"\x00",
        b"\x7f",
        b"\x80",
        b"dog",
        b"x" * 55,
        b"x" * 56,
        b"y" * 300,
        [b"cat", b"dog"],
        [],
        [[], [b""], [b"a", [b"b"]]],
    ]
    for c in cases:
        enc = et.rlp_encode(c)
        assert et.rlp_decode(enc) == c
    # known vectors
    assert et.rlp_encode(b"dog") == b"\x83dog"
    assert et.rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert et.rlp_encode(b"") == b"\x80"
    assert et.rlp_encode([]) == b"\xc0"


def test_eip155_spec_vector():
    """The transaction from the EIP-155 specification itself."""
    priv = bytes.fromhex("46" * 32)
    tx = et.Transaction(
        nonce=9, gas_price=20 * 10**9, gas_limit=21000,
        to=bytes.fromhex("3535353535353535353535353535353535353535"),
        value=10**18, data=b"", chain_id=1,
    )
    assert tx.signing_hash().hex() == (
        "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53")
    et.sign_tx(tx, priv)
    assert tx.v == 37
    assert tx.raw().hex() == (
        "f86c098504a817c800825208943535353535353535353535353535353535353535"
        "880de0b6b3a76400008025a028ef61340bd939bc2195fe537567866003e1a15d3c"
        "71ff63e1590620aa636276a067cbe9d8997f761aecb703304b3800ccf555c9f3dc"
        "64214b297fb1966a3b6d83")


def test_sign_decode_recover_roundtrip():
    priv = bytes.fromhex("aa" * 32)
    tx = et.Transaction(
        nonce=3, gas_price=5 * 10**9, gas_limit=500_000,
        to=b"\x11" * 20, value=0,
        data=et.commit_calldata(et.SEL_COMMIT_HEADER_RANGE, 10004),
        chain_id=11155111,
    )
    et.sign_tx(tx, priv)
    raw = tx.raw()
    dec = et.decode_raw_tx(raw)
    assert (dec.nonce, dec.gas_price, dec.gas_limit) == (3, 5 * 10**9, 500_000)
    assert dec.to == b"\x11" * 20
    assert dec.data == tx.data
    assert dec.chain_id == 11155111
    assert et.recover_sender(dec) == et.privkey_to_address(priv)
    # tampered calldata changes the signing hash -> recovers a different
    # (wrong) sender
    bad = et.decode_raw_tx(raw)
    bad.data = bad.data[:-1] + bytes([bad.data[-1] ^ 1])
    assert et.recover_sender(bad) != et.privkey_to_address(priv)


def test_local_relayer_against_mock_node():
    node = et.MockEthNode(chain_id=11155111)
    client = et.EthRpcClient(node.call)
    priv = bytes.fromhex("bb" * 32)
    relayer = et.LocalRelayer(client, priv, b"\x22" * 20, 11155111)

    out = relayer.relay(et.commit_calldata(et.SEL_COMMIT_NEXT_HEADER, 10001))
    assert out["receipt"]["status"] == "0x1"
    sender, tx = node.transactions[0]
    assert sender == relayer.address
    assert tx.data[:4] == et.SEL_COMMIT_NEXT_HEADER
    assert int.from_bytes(tx.data[4:], "big") == 10001
    assert tx.gas_limit == 500_000  # reference relay gas cap

    # nonce advances on the next relay
    out2 = relayer.relay(et.commit_calldata(et.SEL_COMMIT_HEADER_RANGE, 10004))
    assert node.transactions[1][1].nonce == 1
    assert out2["receipt"]["status"] == "0x1"

    # wrong chain id is rejected by the node
    bad_relayer = et.LocalRelayer(client, priv, b"\x22" * 20, 1)
    with pytest.raises(RuntimeError, match="chain id"):
        bad_relayer.relay(b"")


def test_cli_relay_signs_commit_tx(tmp_path, capsys):
    """cmd_relay turns a prover output.json into a signed raw commit tx
    that decodes back to the right calldata and sender."""
    import json

    from blobstreamx_tpu.runtime import cli

    input_bytes = ((10000).to_bytes(8, "big") + b"\x33" * 32
                   + (10004).to_bytes(8, "big"))
    out = {"data": {"input": "0x" + input_bytes.hex(),
                    "output": "0x" + (b"\x44" * 64).hex()}}
    path = tmp_path / "output.json"
    path.write_text(json.dumps(out))

    cli.main(["relay", "--output", str(path), "--private-key", "cc" * 32,
              "--contract-address", "11" * 20, "--chain-id", "5",
              "--nonce", "7"])
    result = json.loads(capsys.readouterr().out)
    assert result["relay"] == "commitHeaderRange"
    tx = et.decode_raw_tx(bytes.fromhex(result["raw"][2:]))
    assert tx.data[:4] == et.SEL_COMMIT_HEADER_RANGE
    assert int.from_bytes(tx.data[4:], "big") == 10004
    assert tx.nonce == 7 and tx.chain_id == 5
    sender = et.recover_sender(tx)
    assert "0x" + sender.hex() == result["from"]
