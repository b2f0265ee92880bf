#!/usr/bin/env bash
# Regenerate Go bindings from the ABI — parity with the reference's
# scripts/binding.sh. Uses the in-repo generator (no abigen needed).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/gen_go_bindings.py
