"""Production entrypoint registry + build/prove function CLI (R10/D17) —
VERDICT r4 Weak #4: the CLI had zero test coverage and `_n_inputs` always
recorded 0.

Runs the real CLI (`entrypoints next_header_mocha build` then
`prove input.json`) at a scaled shape via BLOBSTREAMX_SCALE, and checks
output.json bytes against the fixture chain (reference
succinct.json:4-52 entrypoint contract + bin/next_header_mocha.rs).
"""

import json
import os

import pytest

from blobstreamx_tpu.circuits.input import InputDataFetcher
from blobstreamx_tpu.runtime import entrypoints


def test_registry_matches_reference_shapes():
    r = entrypoints.REGISTRY
    assert set(r) == {"next_header", "next_header_mocha", "header_range_1024",
                      "header_range_2048", "header_range_mocha"}
    assert r["header_range_1024"].skip_max == 1024
    assert r["header_range_2048"].skip_max == 2048
    assert r["header_range_mocha"].skip_max == 1024
    for name in ("next_header", "header_range_1024", "header_range_2048"):
        assert r[name].chain_id == "celestia"
    manifest = entrypoints.load_manifest()
    assert set(e["name"] for e in manifest["entrypoints"]) == set(r)


def test_usage_errors():
    assert entrypoints.main([]) == 2
    assert entrypoints.main(["nope"]) == 2
    assert entrypoints.main(["next_header"]) == 2  # missing subcommand


@pytest.mark.proof
def test_build_prove_cli_roundtrip(tmp_path, monkeypatch):
    """Full CLI: build writes keys + meta (with a real n_public_inputs),
    prove writes output.json whose output bytes match the fixture chain."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("BLOBSTREAMX_SCALE", json.dumps({"vss": 2}))
    monkeypatch.setenv("BLOBSTREAMX_BUILD_DIR", str(tmp_path / "build"))
    monkeypatch.setenv(
        "BLOBSTREAMX_CFG",
        json.dumps({"rate_bits": 3, "cap_height": 1, "num_query_rounds": 8,
                    "pow_bits": 4, "final_poly_bits": 2}))

    assert entrypoints.main(["next_header_mocha", "build"]) == 0
    meta = json.load(open(tmp_path / "build" / "next_header_mocha.json"))
    assert meta["n_public_inputs"] == 40  # u64 block + bytes32 header
    assert os.path.exists(tmp_path / "build" / "next_header_mocha.keys")

    f = InputDataFetcher()
    input_bytes = (10000).to_bytes(8, "big") + f.get_header(10000).hash()
    (tmp_path / "input.json").write_text(json.dumps(
        {"data": {"input": "0x" + input_bytes.hex()}}))
    assert entrypoints.main(["next_header_mocha", "prove",
                             str(tmp_path / "input.json")]) == 0

    out = json.load(open(tmp_path / "output.json"))
    output_bytes = bytes.fromhex(out["data"]["output"][2:])
    assert output_bytes[:32] == f.get_header(10001).hash()
    assert output_bytes[32:64] == f.get_data_commitment(10000, 10001)

    # the emitted proof verifies against input ‖ output
    from blobstreamx_tpu.proof import serde, stark

    cfg = stark.StarkConfig(rate_bits=3, cap_height=1, num_query_rounds=8,
                            pow_bits=4, final_poly_bits=2)
    circ = entrypoints.make_circuit(
        entrypoints.REGISTRY["next_header_mocha"], scale={"vss": 2})
    proof = serde.system_proof_from_json(out["data"]["proof"])
    assert circ.circuit.verify(
        proof, list(input_bytes) + list(output_bytes), cfg)
