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
    bin/local_relay.rs): load output.json and print the commit call data."""
    with open(args.output) as f:
        out = json.load(f)
    data = out["data"]
    print(json.dumps({
        "request": args.request_id,
        "input": data["input"],
        "output": data["output"],
        "relay": "commitHeaderRange" if len(data["input"]) == 2 + 96 else "commitNextHeader",
    }, indent=2))


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
    r.set_defaults(fn=cmd_relay)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
