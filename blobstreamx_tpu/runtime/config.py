"""Env-driven runtime configuration — parity with the reference's dotenv
catalog (SURVEY.md section 5 config; reference .env.example:1-29 and operator
env parsing bin/blobstreamx.rs:43-68,329-354).

`load_env()` reads a `.env` file (KEY=VALUE lines, # comments) and overlays
process env vars on top — process env wins, matching dotenv semantics.
`OperatorEnv.from_env()` maps the catalog to typed fields with the
reference's code defaults.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional


def load_env(path: str = ".env", environ: Optional[dict] = None) -> Dict[str, str]:
    """Parse a dotenv file and overlay the process environment."""
    out: Dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                out[k.strip()] = v.strip().strip('"').strip("'")
    out.update(environ if environ is not None else os.environ)
    return out


def _get_bytes32(env: Dict[str, str], key: str) -> Optional[bytes]:
    v = env.get(key)
    if not v:
        return None
    v = v[2:] if v.startswith("0x") else v
    b = bytes.fromhex(v)
    assert len(b) == 32, f"{key} must be 32 bytes"
    return b


@dataclass
class OperatorEnv:
    """Full catalog of reference .env.example:1-29 plus operator tunables
    with the reference code defaults (bin/blobstreamx.rs:329-354)."""

    # Ethereum config
    private_key: Optional[str] = None
    rpc_url: Optional[str] = None
    # Tendermint config (comma-separated failover list, .env.example:5-6)
    tendermint_rpc_urls: List[str] = field(default_factory=list)
    # Platform / service config
    succinct_rpc_url: Optional[str] = None
    succinct_api_key: Optional[str] = None
    chain_id: Optional[int] = None
    contract_address: Optional[str] = None
    next_header_function_id: Optional[bytes] = None
    header_range_function_id: Optional[bytes] = None
    # Operator tunables (defaults: loop 5 min, interval 300, max 1000)
    loop_delay_mins: float = 5.0
    update_delay_blocks: int = 300
    data_commitment_max: int = 1000
    # Local proving/relay switches (.env.example:20-26)
    local_prove_mode: bool = False
    local_relay_mode: bool = False
    prove_binaries: Dict[str, str] = field(default_factory=dict)
    wrapper_binary: Optional[str] = None
    gateway_address: Optional[str] = None

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None,
                 dotenv_path: str = ".env") -> "OperatorEnv":
        env = env if env is not None else load_env(dotenv_path)

        def flag(key: str) -> bool:
            return env.get(key, "").lower() in ("1", "true", "yes")

        tm = env.get("TENDERMINT_RPC_URL", "")
        return cls(
            private_key=env.get("PRIVATE_KEY") or None,
            rpc_url=env.get("RPC_URL") or None,
            tendermint_rpc_urls=[u.strip() for u in tm.split(",") if u.strip()],
            succinct_rpc_url=env.get("SUCCINCT_RPC_URL") or None,
            succinct_api_key=env.get("SUCCINCT_API_KEY") or None,
            chain_id=int(env["CHAIN_ID"]) if env.get("CHAIN_ID") else None,
            contract_address=env.get("CONTRACT_ADDRESS") or None,
            next_header_function_id=_get_bytes32(env, "NEXT_HEADER_FUNCTION_ID"),
            header_range_function_id=_get_bytes32(env, "HEADER_RANGE_FUNCTION_ID"),
            loop_delay_mins=float(env.get("LOOP_DELAY_MINS") or 5.0),
            update_delay_blocks=int(env.get("UPDATE_DELAY_BLOCKS") or 300),
            data_commitment_max=int(env.get("DATA_COMMITMENT_MAX") or 1000),
            local_prove_mode=flag("LOCAL_PROVE_MODE"),
            local_relay_mode=flag("LOCAL_RELAY_MODE"),
            prove_binaries={
                k[len("PROVE_BINARY_"):]: v
                for k, v in env.items() if k.startswith("PROVE_BINARY_")
            },
            wrapper_binary=env.get("WRAPPER_BINARY") or None,
            gateway_address=env.get("GATEWAY_ADDRESS") or None,
        )

    def operator_config(self):
        from .operator import OperatorConfig

        return OperatorConfig(
            loop_delay_secs=self.loop_delay_mins * 60.0,
            update_delay_blocks=self.update_delay_blocks,
            data_commitment_max=self.data_commitment_max,
        )
