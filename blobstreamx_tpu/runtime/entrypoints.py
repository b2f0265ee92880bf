"""Production entrypoint registry — parity with the reference's per-config
circuit binaries and platform manifest (SURVEY.md R10; reference
succinct.json:4-52, bin/header_range_1024.rs:7-9, bin/header_range_2048.rs:7-9,
bin/next_header.rs:6-7).

The reference declares five entrypoints, each a standalone binary that
instantiates a circuit template with const-generic production parameters
and exposes a build/prove CLI. Here the same five names are declared in
`functions.json` at the repo root; each maps to a circuit factory below and
is runnable as:

    python -m blobstreamx_tpu.runtime.entrypoints <name> build
    python -m blobstreamx_tpu.runtime.entrypoints <name> prove input.json

Divergence (documented): the reference uses VALIDATOR_SET_SIZE_MAX=100;
our validator-set hashing tree requires a power of two, so production
entrypoints use VSS=128 (a superset — any real mocha-4/celestia set fits).
`scale` lets tests instantiate the same template at reduced shape without
changing the registry.
"""

from __future__ import annotations

import json
import os
import sys
from dataclasses import dataclass
from typing import Callable, Dict, Optional

from . import function as function_cli


@dataclass(frozen=True)
class EntrypointSpec:
    """Circuit-shape parameters (the reference's const generics)."""

    name: str
    kind: str                 # "header_range" | "next_header"
    chain_id: str             # vote-message domain (config.rs chain ids)
    vss: int                  # VALIDATOR_SET_SIZE_MAX (128 vs reference 100)
    nb_map_jobs: int = 0
    batch_size: int = 0

    @property
    def skip_max(self) -> int:
        return self.nb_map_jobs * self.batch_size


# Reference production table (bin/*.rs:6-9). celestia = mainnet chain id.
REGISTRY: Dict[str, EntrypointSpec] = {
    s.name: s
    for s in [
        EntrypointSpec("next_header", "next_header", "celestia", 128),
        EntrypointSpec("next_header_mocha", "next_header", "mocha-4", 128),
        EntrypointSpec("header_range_1024", "header_range", "celestia", 128, 32, 32),
        EntrypointSpec("header_range_2048", "header_range", "celestia", 128, 32, 64),
        EntrypointSpec("header_range_mocha", "header_range", "mocha-4", 128, 32, 32),
    ]
}


def make_circuit(spec: EntrypointSpec, scale: Optional[dict] = None,
                 fetcher=None, cfg=None):
    """Instantiate the circuit template for an entrypoint.

    scale: optional dict overriding {vss, nb_map_jobs, batch_size, ed_nbits}
    for CPU-provable test shapes (the reference's small/medium/large test
    template pattern, SURVEY.md section 4)."""
    scale = scale or {}
    vss = scale.get("vss", spec.vss)
    ed_nbits = scale.get("ed_nbits")
    if spec.kind == "next_header":
        from ..circuits.next_header import NextHeaderCircuit

        return NextHeaderCircuit(chain_id=spec.chain_id, vss=vss,
                                 fetcher=fetcher, ed_nbits=ed_nbits)
    nb_map_jobs = scale.get("nb_map_jobs", spec.nb_map_jobs)
    batch_size = scale.get("batch_size", spec.batch_size)
    if nb_map_jobs > 1:
        # Production shape: the data commitment runs through map jobs +
        # succinct MapReduce aggregation, composed with the skip proof by
        # the join circuit — ONE final proof (reference
        # circuits/builder.rs:301-409). The inline monolith below is only
        # for degenerate single-job shapes (its event list scales with
        # nb_map_jobs*batch_size and is infeasible at 32x32).
        from ..circuits.combined import HeaderRangeSuccinct

        return HeaderRangeSuccinct(
            chain_id=spec.chain_id, vss=vss, nb_map_jobs=nb_map_jobs,
            batch_size=batch_size, fetcher=fetcher, ed_nbits=ed_nbits,
            cfg=cfg)
    from ..circuits.header_range import HeaderRangeCircuit

    return HeaderRangeCircuit(
        chain_id=spec.chain_id, vss=vss,
        nb_map_jobs=nb_map_jobs,
        batch_size=batch_size,
        fetcher=fetcher, ed_nbits=ed_nbits,
    )


def load_manifest(path: Optional[str] = None) -> dict:
    """functions.json — the succinct.json equivalent."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "functions.json",
        )
    with open(path) as f:
        return json.load(f)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in REGISTRY:
        names = ", ".join(sorted(REGISTRY))
        print(f"usage: entrypoints <name> build|prove <input.json>\n"
              f"names: {names}")
        return 2
    spec = REGISTRY[argv[0]]
    # BLOBSTREAMX_SCALE='{"vss":2,...}' instantiates the same template at a
    # reduced shape (the reference's small/medium/large test pattern);
    # production shape when unset.
    scale = None
    if os.environ.get("BLOBSTREAMX_SCALE"):
        scale = json.loads(os.environ["BLOBSTREAMX_SCALE"])
    build_dir = os.environ.get("BLOBSTREAMX_BUILD_DIR", "build")
    cfg = None
    if os.environ.get("BLOBSTREAMX_CFG"):
        from ..proof import stark

        cfg = stark.StarkConfig(**json.loads(os.environ["BLOBSTREAMX_CFG"]))
    factory: Callable[[], object] = lambda: make_circuit(spec, scale=scale,
                                                        cfg=cfg)
    return function_cli.entrypoint(factory, spec.name, argv[1:],
                                   cfg=cfg, build_dir=build_dir)


if __name__ == "__main__":
    raise SystemExit(main())
