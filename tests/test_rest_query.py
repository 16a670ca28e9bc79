"""Query::REST analog (ledger/query/src/query.rs:63-133): state root +
state paths over HTTP, round-tripped through the JSON wire form and
verified against a live in-process ledger."""
import json
import random as _r
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.ledger.query import (
    Query, RESTQuery, state_path_to_json, state_path_from_json,
)
from snarkvm_tpu.utils.encoding import bech32m_encode

PROGRAM = """program rq.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;
"""


@pytest.fixture(scope="module")
def ledger_with_record():
    rng = _r.Random(0xE57)
    keys = [account.PrivateKey.new(rng) for _ in range(3)]
    led = Ledger(keys, rng, srs=None)
    led.vm.process.deploy(PROGRAM)
    alice = keys[0]
    addr = bech32m_encode("aleo", alice.to_address()[0].to_bytes(32, "little"))
    p = led.vm.execute(alice, "rq.aleo", "mint", [addr, "9u64"],
                       [("private", "address"), ("private", "u64")])
    block = led.prepare_advance_to_next_beacon_block([p])
    led.advance_to_next_block(block)
    commitment = next(v for t in block.transactions[0].transitions
                      for k, v in t.outputs if k == "record")
    return led, commitment


def _serve(ledger):
    vm_query = Query(ledger)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            try:
                if parts[1] == "stateRoot" and parts[2] == "latest":
                    body = json.dumps(f"{vm_query.current_state_root()}field")
                elif parts[1] == "statePath":
                    c = int(parts[2].removesuffix("field"))
                    sp = vm_query.get_state_path_for_commitment(c)
                    body = json.dumps(state_path_to_json(sp))
                else:
                    raise KeyError(self.path)
            except Exception:
                self.send_response(404)
                self.end_headers()
                return
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def test_rest_query_round_trip(ledger_with_record):
    led, commitment = ledger_with_record
    srv = _serve(led)
    try:
        q = RESTQuery(f"http://127.0.0.1:{srv.server_port}", "mainnet")
        assert q.current_state_root() == led.latest_state_root
        sp = q.get_state_path_for_commitment(commitment)
        assert sp.verify()
        assert sp.global_state_root == led.latest_state_root
        assert sp.commitment == commitment
        with pytest.raises(Exception):
            q.get_state_path_for_commitment(12345)
    finally:
        srv.shutdown()


def test_state_path_json_round_trip(ledger_with_record):
    led, commitment = ledger_with_record
    sp = Query(led).get_state_path_for_commitment(commitment)
    sp2 = state_path_from_json(json.loads(json.dumps(state_path_to_json(sp))))
    assert sp2.verify()
    assert sp2.block_hash == sp.block_hash


def test_async_rest_query(ledger_with_record):
    import asyncio
    from snarkvm_tpu.ledger.query import AsyncRESTQuery
    led, commitment = ledger_with_record
    srv = _serve(led)
    try:
        q = AsyncRESTQuery(f"http://127.0.0.1:{srv.server_port}", "mainnet")

        async def go():
            root = await q.current_state_root_async()
            sp = await q.get_state_path_for_commitment_async(commitment)
            return root, sp

        root, sp = asyncio.run(go())
        assert root == led.latest_state_root
        assert sp.verify() and sp.commitment == commitment
    finally:
        srv.shutdown()
