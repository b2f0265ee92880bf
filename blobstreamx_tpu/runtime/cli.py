"""Small CLIs — parity with reference bin/genesis.rs, bin/fetch.rs,
bin/local_relay.rs (R12/R13).

  python -m blobstreamx_tpu.runtime.cli genesis --block 10000
  python -m blobstreamx_tpu.runtime.cli fetch --block 10001
  python -m blobstreamx_tpu.runtime.cli relay --request-id <id>
"""

from __future__ import annotations

import argparse
import json
import sys

from ..circuits.input import DEFAULT_FIXTURES, StepInputFetcher


def cmd_genesis(args):
    """Print GENESIS_HEIGHT / GENESIS_HEADER for contract init
    (reference bin/genesis.rs:31-47)."""
    fetcher = StepInputFetcher(args.fixtures)
    header = fetcher.get_header(args.block)
    print(f"GENESIS_HEIGHT={args.block}")
    print(f"GENESIS_HEADER=0x{header.hash().hex()}")


def cmd_fetch(args):
    """Summarize (and in RPC mode, record) the fixtures for a block
    (reference bin/fetch.rs:27-48)."""
    fetcher = StepInputFetcher(args.fixtures)
    header = fetcher.get_header(args.block)
    blk = fetcher.get_signed_block(args.block)
    out = {
        "height": args.block,
        "header_hash": header.hash().hex().upper(),
        "data_hash": header.data_hash.hex().upper(),
        "n_validators": len(blk["validator_set"]["validators"]),
        "n_signatures": len(blk["commit"]["signatures"]),
    }
    print(json.dumps(out, indent=2))


def cmd_relay(args):
    """One-shot relay of an existing proof request (reference
    bin/local_relay.rs:60-80): load output.json, build the commit
    transaction, sign it (EIP-155), and either submit it over JSON-RPC
    (--rpc-url) or print the signed raw transaction for out-of-band
    submission."""
    from . import ethtx as et

    with open(args.output) as f:
        out = json.load(f)
    data = out["data"]
    input_hex = data["input"][2:] if data["input"].startswith("0x") \
        else data["input"]
    input_bytes = bytes.fromhex(input_hex)
    if len(input_bytes) == 48:  # trusted_block(8) ‖ header(32) ‖ target(8)
        method = "commitHeaderRange"
        calldata = et.commit_calldata(
            et.SEL_COMMIT_HEADER_RANGE,
            int.from_bytes(input_bytes[40:48], "big"))
    else:  # trusted_block(8) ‖ header(32)
        method = "commitNextHeader"
        calldata = et.commit_calldata(
            et.SEL_COMMIT_NEXT_HEADER,
            int.from_bytes(input_bytes[0:8], "big"))

    result = {
        "request": args.request_id,
        "input": data["input"],
        "output": data["output"],
        "relay": method,
        "calldata": "0x" + calldata.hex(),
    }
    if args.private_key:
        priv = bytes.fromhex(args.private_key.replace("0x", ""))
        contract = bytes.fromhex(args.contract_address.replace("0x", ""))
        if args.rpc_url:
            import urllib.request

            def transport(payload):
                req = urllib.request.Request(
                    args.rpc_url, data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=30) as resp:
                    return json.load(resp)

            client = et.EthRpcClient(transport)
            relayer = et.LocalRelayer(client, priv, contract, args.chain_id)
            result.update(relayer.relay(calldata))
        else:
            tx = et.Transaction(
                nonce=args.nonce, gas_price=args.gas_price,
                gas_limit=500_000, to=contract, value=0, data=calldata,
                chain_id=args.chain_id)
            et.sign_tx(tx, priv)
            result["raw"] = "0x" + tx.raw().hex()
            result["tx_hash"] = "0x" + tx.tx_hash().hex()
            result["from"] = "0x" + et.privkey_to_address(priv).hex()
    print(json.dumps(result, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="blobstreamx-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("genesis")
    g.add_argument("--block", type=int, required=True)
    g.add_argument("--fixtures", default=DEFAULT_FIXTURES)
    g.set_defaults(fn=cmd_genesis)
    f = sub.add_parser("fetch")
    f.add_argument("--block", type=int, required=True)
    f.add_argument("--fixtures", default=DEFAULT_FIXTURES)
    f.set_defaults(fn=cmd_fetch)
    r = sub.add_parser("relay")
    r.add_argument("--request-id", default="local")
    r.add_argument("--output", default="output.json")
    r.add_argument("--private-key", default=None,
                   help="hex key; when set, sign the commit tx")
    r.add_argument("--contract-address", default="00" * 20)
    r.add_argument("--chain-id", type=int, default=11155111)
    r.add_argument("--rpc-url", default=None,
                   help="JSON-RPC endpoint; when set, submit the tx")
    r.add_argument("--nonce", type=int, default=0)
    r.add_argument("--gas-price", type=int, default=10**9)
    r.set_defaults(fn=cmd_relay)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
