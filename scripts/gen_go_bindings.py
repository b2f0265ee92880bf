#!/usr/bin/env python3
"""Generate Go bindings for BlobstreamX.sol from its ABI.

TPU-framework counterpart of the reference's `scripts/binding.sh` +
`bindings/BlobstreamX.go` (SURVEY.md R16: abigen output consumed by e.g.
Celestia's Go relayer). No Go toolchain ships in this image, so instead of
shelling out to abigen we emit the abigen-v1-style surface directly from
`contracts/abi/BlobstreamX.abi.json`: a `BlobstreamX` wrapper over
`bind.BoundContract` with typed Caller/Transactor methods, tuple structs,
and event parse helpers. Deterministic output; re-run after editing the ABI.

    python scripts/gen_go_bindings.py   # writes bindings/BlobstreamX.go
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABI_PATH = os.path.join(ROOT, "contracts", "abi", "BlobstreamX.abi.json")
OUT_PATH = os.path.join(ROOT, "bindings", "BlobstreamX.go")

GO_TYPES = {
    "address": "common.Address",
    "bool": "bool",
    "string": "string",
    "bytes": "[]byte",
    "bytes32": "[32]byte",
    "bytes32[]": "[][32]byte",
    "uint8": "uint8",
    "uint32": "uint32",
    "uint64": "uint64",
    "uint256": "*big.Int",
    "uint256[]": "[]*big.Int",
}

TUPLE_NAMES = {
    # (fn name, arg name) -> Go struct name
    ("initialize", "p"): "BlobstreamXInitParameters",
    ("verifyAttestation", "tuple"): "DataRootTuple",
    ("verifyAttestation", "proof"): "BinaryMerkleProof",
}


def go_type(arg, fn_name=""):
    t = arg["type"]
    if t == "tuple":
        return TUPLE_NAMES[(fn_name, arg.get("name", ""))]
    if t not in GO_TYPES:
        raise KeyError(f"unmapped solidity type {t}")
    return GO_TYPES[t]


def camel(name, upper=True):
    if not name:
        return ""
    out = name[0].upper() + name[1:] if upper else name
    return out


def gen(abi):
    tuples, callers, transactors, events = [], [], [], []
    seen_tuples = set()

    for entry in abi:
        kind = entry.get("type")
        name = entry.get("name", "")
        if kind == "function":
            for arg in entry.get("inputs", []):
                if arg["type"] == "tuple":
                    sname = TUPLE_NAMES[(name, arg.get("name", ""))]
                    if sname in seen_tuples:
                        continue
                    seen_tuples.add(sname)
                    fields = "\n".join(
                        f"\t{camel(c['name'])} {GO_TYPES[c['type']]}"
                        for c in arg["components"])
                    tuples.append(
                        f"// {sname} is an auto generated low-level Go "
                        f"binding around a user-defined struct.\n"
                        f"type {sname} struct {{\n{fields}\n}}\n")
            mut = entry.get("stateMutability", "nonpayable")
            ins = entry.get("inputs", [])
            args_sig = "".join(
                f", {a['name'] or 'arg%d' % i} {go_type(a, name)}"
                for i, a in enumerate(ins))
            args_pass = "".join(
                f", {a['name'] or 'arg%d' % i}" for i, a in enumerate(ins))
            if mut in ("view", "pure"):
                outs = entry.get("outputs", [])
                ret = go_type(outs[0], name) if outs else ""
                zero = {
                    "bool": "false", "string": '""', "uint64": "0",
                    "uint32": "0", "uint8": "0",
                }.get(ret, f"*new({ret})")
                callers.append(f"""\
// {camel(name)} is a free data retrieval call binding the contract method.
//
// Solidity: function {name}(...) {mut} returns({', '.join(o['type'] for o in outs)})
func (c *BlobstreamXCaller) {camel(name)}(opts *bind.CallOpts{args_sig}) ({ret}, error) {{
\tvar out []interface{{}}
\terr := c.contract.Call(opts, &out, "{name}"{args_pass})
\tif err != nil {{
\t\treturn {zero}, err
\t}}
\tout0 := *abi.ConvertType(out[0], new({ret})).(*{ret})
\treturn out0, err
}}
""")
            else:
                transactors.append(f"""\
// {camel(name)} is a paid mutator transaction binding the contract method.
//
// Solidity: function {name}(...) {mut}
func (t *BlobstreamXTransactor) {camel(name)}(opts *bind.TransactOpts{args_sig}) (*types.Transaction, error) {{
\treturn t.contract.Transact(opts, "{name}"{args_pass})
}}
""")
        elif kind == "event":
            fields = "\n".join(
                f"\t{camel(a['name'])} {GO_TYPES[a['type']]}"
                for a in entry.get("inputs", []))
            events.append(f"""\
// BlobstreamX{name} represents a {name} event raised by the BlobstreamX contract.
type BlobstreamX{name} struct {{
{fields}
\tRaw types.Log // Blockchain specific contextual infos
}}

// Parse{name} is a log parse operation binding the contract event.
func (f *BlobstreamXFilterer) Parse{name}(log types.Log) (*BlobstreamX{name}, error) {{
\tevent := new(BlobstreamX{name})
\tif err := f.contract.UnpackLog(event, "{name}", log); err != nil {{
\t\treturn nil, err
\t}}
\tevent.Raw = log
\treturn event, nil
}}
""")

    abi_json = json.dumps(abi, separators=(",", ":")).replace('"', '\\"')
    return f"""\
// Code generated via scripts/gen_go_bindings.py - DO NOT EDIT.
//
// Go bindings for contracts/src/BlobstreamX.sol (capability parity with the
// reference repo's abigen-generated bindings/BlobstreamX.go).

package bindings

import (
\t"math/big"
\t"strings"

\tethereum "github.com/ethereum/go-ethereum"
\t"github.com/ethereum/go-ethereum/accounts/abi"
\t"github.com/ethereum/go-ethereum/accounts/abi/bind"
\t"github.com/ethereum/go-ethereum/common"
\t"github.com/ethereum/go-ethereum/core/types"
)

// Reference imports to suppress errors if they are not otherwise used.
var (
\t_ = big.NewInt
\t_ = strings.NewReader
\t_ = ethereum.NotFound
\t_ = bind.Bind
\t_ = common.Big1
\t_ = types.BloomLookup
\t_ = abi.ConvertType
)

{chr(10).join(tuples)}
// BlobstreamXMetaData contains all meta data concerning the BlobstreamX contract.
var BlobstreamXMetaData = &bind.MetaData{{
\tABI: "{abi_json}",
}}

// BlobstreamXABI is the input ABI used to generate the binding from.
var BlobstreamXABI = BlobstreamXMetaData.ABI

// BlobstreamX is an auto generated Go binding around an Ethereum contract.
type BlobstreamX struct {{
\tBlobstreamXCaller
\tBlobstreamXTransactor
\tBlobstreamXFilterer
}}

// BlobstreamXCaller is an auto generated read-only Go binding around an Ethereum contract.
type BlobstreamXCaller struct {{
\tcontract *bind.BoundContract
}}

// BlobstreamXTransactor is an auto generated write-only Go binding around an Ethereum contract.
type BlobstreamXTransactor struct {{
\tcontract *bind.BoundContract
}}

// BlobstreamXFilterer is an auto generated log filtering Go binding around an Ethereum contract events.
type BlobstreamXFilterer struct {{
\tcontract *bind.BoundContract
}}

// NewBlobstreamX creates a new instance of BlobstreamX, bound to a specific deployed contract.
func NewBlobstreamX(address common.Address, backend bind.ContractBackend) (*BlobstreamX, error) {{
\tparsed, err := abi.JSON(strings.NewReader(BlobstreamXABI))
\tif err != nil {{
\t\treturn nil, err
\t}}
\tcontract := bind.NewBoundContract(address, parsed, backend, backend, backend)
\treturn &BlobstreamX{{
\t\tBlobstreamXCaller{{contract: contract}},
\t\tBlobstreamXTransactor{{contract: contract}},
\t\tBlobstreamXFilterer{{contract: contract}},
\t}}, nil
}}

{chr(10).join(callers)}
{chr(10).join(transactors)}
{chr(10).join(events)}\
"""


def main():
    with open(ABI_PATH) as f:
        abi = json.load(f)
    src = gen(abi)
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        f.write(src)
    print(f"wrote {OUT_PATH} ({len(src.splitlines())} lines)")


if __name__ == "__main__":
    main()
