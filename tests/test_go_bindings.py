"""Go bindings generator: output covers the full ABI surface (R16)."""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import gen_go_bindings as g  # noqa: E402


def test_bindings_cover_abi():
    with open(g.ABI_PATH) as f:
        abi = json.load(f)
    src = g.gen(abi)
    for entry in abi:
        kind, name = entry.get("type"), entry.get("name", "")
        if kind == "function":
            want = name[0].upper() + name[1:]
            assert f"{want}(opts" in src, f"missing method {name}"
        elif kind == "event":
            assert f"type BlobstreamX{name} struct" in src
            assert f"Parse{name}(log types.Log)" in src
    # tuple structs present
    for s in ("BlobstreamXInitParameters", "DataRootTuple", "BinaryMerkleProof"):
        assert f"type {s} struct" in src
    # embedded ABI round-trips
    abi_str = src.split('ABI: "', 1)[1].split('",\n', 1)[0]
    assert json.loads(abi_str.replace('\\"', '"')) == abi


def test_generated_file_current():
    """bindings/BlobstreamX.go matches a fresh generator run."""
    with open(g.ABI_PATH) as f:
        abi = json.load(f)
    with open(g.OUT_PATH) as f:
        assert f.read() == g.gen(abi)
