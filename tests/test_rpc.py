"""RPC input layer tests: a local in-process HTTP server replays the
mocha-4 fixtures through real Tendermint RPC endpoint shapes (/header,
/signed_block, /commit, /validators, /data_commitment), and the
RpcInputDataFetcher is driven against it — witness parity with the fixture
fetcher plus failover/retry and fixture-recording (save) behavior
(reference circuits/input.rs RPC mode, circuits/fetcher.rs retry client)."""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from blobstreamx_tpu.circuits.input import InputDataFetcher, DEFAULT_FIXTURES
from blobstreamx_tpu.runtime.rpc import RpcError, RpcInputDataFetcher

HEIGHTS = [10000, 10001, 10002, 10003, 10004]
HEAD = 10004


def _fixture(path):
    with open(os.path.join(DEFAULT_FIXTURES, path)) as f:
        return json.load(f)


class _Handler(BaseHTTPRequestHandler):
    fail_first = 0  # induced failures for retry testing
    counter = {"n": 0}

    def log_message(self, *a):  # silence
        pass

    def _send(self, result):
        body = json.dumps({"jsonrpc": "2.0", "id": -1, "result": result})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body.encode())

    def do_GET(self):
        if _Handler.counter["n"] < _Handler.fail_first:
            _Handler.counter["n"] += 1
            self.send_response(503)
            self.end_headers()
            return
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        route = u.path.strip("/")
        if route == "header":
            self._send(_fixture(f"{q['height']}/header.json")["result"])
        elif route == "signed_block":
            self._send(_fixture(f"{q['height']}/signed_block.json")["result"])
        elif route == "commit":
            h = int(q.get("height", HEAD))
            blk = _fixture(f"{h}/signed_block.json")["result"]
            self._send({"signed_header": {"header": blk["header"],
                                          "commit": blk["commit"]},
                        "canonical": True})
        elif route == "validators":
            h = int(q["height"])
            per = int(q.get("per_page", 100))
            page = int(q.get("page", 1))
            vals = _fixture(f"{h}/signed_block.json")["result"][
                "validator_set"]["validators"]
            chunk = vals[(page - 1) * per: page * per]
            self._send({"block_height": str(h), "validators": chunk,
                        "count": str(len(chunk)), "total": str(len(vals))})
        elif route == "data_commitment":
            self._send(_fixture(
                f"{q['start']}-{q['end']}/data_commitment.json")["result"])
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def rpc_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_rpc_witness_parity_with_fixtures(rpc_url):
    rpc = RpcInputDataFetcher(rpc_url)
    fix = InputDataFetcher()
    assert rpc.get_header(10000).hash() == fix.get_header(10000).hash()
    assert rpc.get_latest_block_number() == HEAD
    a = rpc.get_data_commitment_inputs(10000, 10004, 4)
    b = fix.get_data_commitment_inputs(10000, 10004, 4)
    assert a.start_header_hash == b.start_header_hash
    assert a.end_header_hash == b.end_header_hash
    assert a.data_hash_proofs == b.data_hash_proofs
    assert a.last_block_id_proofs == b.last_block_id_proofs
    assert a.expected_data_commitment == b.expected_data_commitment


def test_rpc_step_and_skip_inputs(rpc_url):
    rpc = RpcInputDataFetcher(rpc_url)
    step = rpc.get_step_inputs(10000, vss=2)
    assert step.nb_validators == 2
    skip = rpc.get_skip_inputs(10000, 10004, vss=2)
    assert skip.nb_target == 2
    # operator-side chain queries
    assert len(rpc.get_validators(10000)) == 2
    assert rpc.is_valid_skip(10000, 10004)
    assert rpc.find_block_to_request(10000, HEAD) == HEAD
    rpc.prefetch_headers(10000, 10004)
    assert set(HEIGHTS) <= set(rpc._header_cache)


def test_rpc_retries_then_succeeds(rpc_url):
    _Handler.fail_first = 2
    _Handler.counter["n"] = 0
    try:
        rpc = RpcInputDataFetcher(rpc_url)
        assert rpc.get_latest_block_number() == HEAD
    finally:
        _Handler.fail_first = 0


def test_rpc_failover_and_exhaustion(rpc_url, tmp_path):
    # dead primary, live secondary -> failover works
    rpc = RpcInputDataFetcher(f"http://127.0.0.1:1/, {rpc_url}")
    assert rpc.get_latest_block_number() == HEAD
    # all dead -> RpcError after retries
    dead = RpcInputDataFetcher("http://127.0.0.1:1/")
    dead.client.retries = 1
    with pytest.raises(RpcError):
        dead.get_latest_block_number()


def test_rpc_save_mode_records_fixtures(rpc_url, tmp_path):
    rpc = RpcInputDataFetcher(rpc_url, fixture_path=str(tmp_path), save=True)
    rpc.get_header(10000)
    rpc.get_signed_block(10001)
    rpc.get_data_commitment(10000, 10002)
    # recorded files are readable by the plain fixture fetcher
    fix = InputDataFetcher(str(tmp_path))
    assert fix.get_header(10000).hash() == rpc.get_header(10000).hash()
    assert fix.get_data_commitment(10000, 10002) == \
        InputDataFetcher().get_data_commitment(10000, 10002)
