#!/usr/bin/env bash
# Regenerate contracts/abi/BlobstreamX.abi.json from the Solidity source —
# parity with the reference's scripts/abi.sh (forge inspect). Requires forge
# (not shipped in the build image; run where foundry is installed).
set -euo pipefail
cd "$(dirname "$0")/../contracts"
command -v forge >/dev/null || { echo "forge not installed" >&2; exit 1; }
forge inspect src/BlobstreamX.sol:BlobstreamX abi > abi/BlobstreamX.abi.json
echo "wrote contracts/abi/BlobstreamX.abi.json"
