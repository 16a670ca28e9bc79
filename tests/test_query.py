"""Query/state paths from the live ledger (ledger/query.py): a record
commitment proven through the real block trees to the state root."""
import copy
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.ledger.query import Query
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(0x0517)

TOKEN = """program token.aleo;

record token:
    owner as address.private;
    amount as u64.private;

function mint:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as token.record;
    output r2 as token.record;
"""


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


@pytest.fixture(scope="module")
def env():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    led = Ledger(keys, rng, srs=None)
    led.vm.process.deploy(TOKEN)
    p = led.vm.execute(keys[0], "token.aleo", "mint", [_addr(keys[0]), "42u64"],
                       [("private", "address"), ("private", "u64")])
    block = led.prepare_advance_to_next_beacon_block([p])
    led.advance_to_next_block(block, [p])
    commitment = p.outputs[0].to_commitment("token.aleo", "token")
    # advance one more empty block so the path spans multiple blocks
    b2 = led.prepare_advance_to_next_beacon_block([])
    led.advance_to_next_block(b2)
    return led, commitment


class TestStatePath:
    def test_path_verifies_to_state_root(self, env):
        led, commitment = env
        sp = Query(led).get_state_path_for_commitment(commitment)
        assert sp.verify()
        assert sp.global_state_root == led.latest_state_root

    def test_tampered_levels_fail(self, env):
        led, commitment = env
        sp = Query(led).get_state_path_for_commitment(commitment)
        for attr in ("transition_level", "transaction_level",
                     "transactions_level", "header_level", "block_level"):
            bad = copy.deepcopy(sp)
            lvl = getattr(bad, attr)
            lvl.siblings[0] = (lvl.siblings[0][0] + 1,) + tuple(lvl.siblings[0][1:]) \
                if isinstance(lvl.siblings[0], tuple) else lvl.siblings[0]
            # robust tamper: flip the level root instead
            lvl.root += 1
            assert not bad.verify(), attr
        bad = copy.deepcopy(sp)
        bad.commitment += 1
        assert not bad.verify()
        bad = copy.deepcopy(sp)
        bad.block_hash += 1
        assert not bad.verify()

    def test_unknown_commitment_raises(self, env):
        led, _ = env
        with pytest.raises(KeyError):
            Query(led).get_state_path_for_commitment(123456789)

    def test_path_goes_stale_after_new_blocks(self, env):
        led, commitment = env
        sp = Query(led).get_state_path_for_commitment(commitment)
        b = led.prepare_advance_to_next_beacon_block([])
        led.advance_to_next_block(b)
        # old root no longer matches; a fresh query does
        assert sp.global_state_root != led.latest_state_root
        sp2 = Query(led).get_state_path_for_commitment(commitment)
        assert sp2.verify() and sp2.global_state_root == led.latest_state_root
