"""Live Tendermint RPC witness/chain access — parity with the reference's
tendermintx ``InputDataFetcher`` RPC mode (SURVEY.md D16; reference
circuits/input.rs:67-110 RPC route, circuits/fetcher.rs retrying client)
plus fixture recording (``save`` mode, reference circuits/input.rs:89-95).

Design: stdlib-only (urllib) so the framework carries no extra deps.
Failover across a comma-separated RPC url list, exponential-backoff retry
(3 tries, 10 s timeout — reference circuits/fetcher.rs:17-18,30-41), and a
bounded thread pool for the batched header fetches the witness pipeline
needs (reference fetches 200+ heights concurrently,
circuits/input.rs:125-126).
"""

from __future__ import annotations

import json
import logging
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

from ..tendermint import vote as tvote
from ..tendermint.header import Header
from ..circuits.input import SkipInputFetcher

log = logging.getLogger("blobstreamx_tpu.rpc")

MAX_RETRIES = 3
TIMEOUT_SECS = 10.0
MAX_CONCURRENT = 16  # host-side thread cap; requests themselves are IO-bound


class RpcError(Exception):
    pass


class TendermintRpcClient:
    """JSON-RPC-over-HTTP GET client with url failover + retries."""

    def __init__(self, urls: str, timeout: float = TIMEOUT_SECS,
                 retries: int = MAX_RETRIES):
        self.urls = [u.strip().rstrip("/") for u in urls.split(",") if u.strip()]
        if not self.urls:
            raise ValueError("no RPC urls given")
        self.timeout = timeout
        self.retries = retries

    def get(self, path: str, **params) -> dict:
        """GET {url}/{path}?{params} -> parsed ``result`` object."""
        query = urllib.parse.urlencode(
            {k: v for k, v in params.items() if v is not None})
        last_err: Optional[Exception] = None
        for attempt in range(self.retries):
            for base in self.urls:
                url = f"{base}/{path}" + (f"?{query}" if query else "")
                try:
                    with urllib.request.urlopen(url, timeout=self.timeout) as r:
                        payload = json.loads(r.read())
                    if "error" in payload and payload["error"]:
                        raise RpcError(f"{path}: {payload['error']}")
                    return payload["result"]
                except (urllib.error.URLError, OSError, RpcError,
                        json.JSONDecodeError) as e:  # noqa: PERF203
                    last_err = e
                    log.warning("rpc %s failed (%s), attempt %d", url, e,
                                attempt + 1)
            time.sleep(min(2.0 ** attempt * 0.25, 2.0))
        raise RpcError(f"all RPC urls failed for {path}: {last_err}")


class RpcInputDataFetcher(SkipInputFetcher):
    """Witness acquisition over live RPC, with optional fixture recording.

    Drop-in replacement for the fixture fetcher: same ``get_header`` /
    ``get_signed_block`` / ``get_data_commitment`` surface consumed by the
    data-commitment, step and skip input builders.
    """

    def __init__(self, urls: str, fixture_path: Optional[str] = None,
                 save: bool = False):
        super().__init__(fixture_path or "")
        self.client = TendermintRpcClient(urls)
        self.save = save
        self._signed_cache: Dict[int, dict] = {}

    # -- raw endpoints ------------------------------------------------------

    def _save_fixture(self, rel: str, payload: dict):
        if not (self.save and self.fixture_path):
            return
        path = os.path.join(self.fixture_path, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"jsonrpc": "2.0", "id": -1, "result": payload}, f)

    def get_header(self, height: int) -> Header:
        if height not in self._header_cache:
            res = self.client.get("header", height=height)
            self._save_fixture(f"{height}/header.json", res)
            self._header_cache[height] = Header.from_json(res["header"])
        return self._header_cache[height]

    def get_signed_block(self, height: int) -> dict:
        if height not in self._signed_cache:
            res = self.client.get("signed_block", height=height)
            self._save_fixture(f"{height}/signed_block.json", res)
            self._signed_cache[height] = res
        return self._signed_cache[height]

    def get_data_commitment(self, start: int, end: int) -> Optional[bytes]:
        res = self.client.get("data_commitment", start=start, end=end)
        self._save_fixture(f"{start}-{end}/data_commitment.json", res)
        return bytes.fromhex(res["data_commitment"])

    def get_latest_block_number(self) -> int:
        res = self.client.get("commit")
        return int(res["signed_header"]["header"]["height"])

    def prefetch_headers(self, start: int, end: int):
        """Concurrently warm the header cache for [start, end] (inclusive) —
        the witness pipeline's bulk fetch (reference
        circuits/input.rs:119-145 batched concurrent fetch)."""
        heights = [h for h in range(start, end + 1)
                   if h not in self._header_cache]
        if not heights:
            return
        with ThreadPoolExecutor(max_workers=MAX_CONCURRENT) as pool:
            list(pool.map(self.get_header, heights))

    # -- operator-side queries (reference circuits/fetcher.rs R7) -----------

    def get_validators(self, height: int) -> List[tvote.Validator]:
        """Paginated /validators (100 per page, reference
        circuits/fetcher.rs:89-113)."""
        vals: List[tvote.Validator] = []
        page = 1
        while True:
            res = self.client.get("validators", height=height, page=page,
                                  per_page=100)
            vals.extend(tvote.Validator.from_json(v)
                        for v in res["validators"])
            if len(vals) >= int(res["total"]):
                return vals
            page += 1

    def get_commit(self, height: int) -> tvote.Commit:
        res = self.client.get("commit", height=height)
        return tvote.Commit.from_json(res["signed_header"]["commit"])

    def get_chain_id(self, height: int) -> str:
        return self.get_header(height).chain_id

    def is_valid_skip(self, trusted_block: int, target_block: int) -> bool:
        trusted = self.get_validators(trusted_block)
        commit = self.get_commit(target_block)
        return tvote.is_valid_skip(trusted, commit,
                                   self.get_chain_id(target_block))

    def find_block_to_request(self, trusted_block: int, max_end: int) -> int:
        """Binary search for the farthest valid skip target (reference
        circuits/fetcher.rs:60-87)."""
        lo, hi = trusted_block + 1, max_end
        best = trusted_block + 1
        while lo <= hi:
            mid = (lo + hi) // 2
            if self.is_valid_skip(trusted_block, mid):
                best = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return best
