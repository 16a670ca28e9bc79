"""Deployment transactions through the block pipeline (vm/deploy.rs +
vm/finalize.rs deploy branch): a program deploys in one block and is
executable in the next; duplicate deployments are rejected."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.ledger.ledger import Ledger
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(0xDE)

COUNTER = """program counter.aleo;

mapping count:
    key as field.public;
    value as u64.public;

function bump:
    input r0 as field.public;
    async bump r0 into r1;
    output r1 as counter.aleo/bump.future;

finalize bump:
    input r0 as field.public;
    get.or_use count[r0] 0u64 into r1;
    add r1 1u64 into r2;
    set r2 into count[r0];
"""


def _addr(pk):
    return bech32m_encode("aleo", pk.to_address()[0].to_bytes(32, "little"))


@pytest.fixture(scope="module")
def ledger():
    keys = [account.PrivateKey.new(rng) for _ in range(4)]
    led = Ledger(keys, rng, srs=None)
    led._key = keys[0]
    return led


class TestDeployTransactions:
    def test_deploy_then_execute(self, ledger):
        led = ledger
        p = led.vm.deploy_transaction(led._key, COUNTER)
        assert p.transaction.kind == "deploy"
        block = led.prepare_advance_to_next_beacon_block([p])
        assert len(block.transactions) == 1
        led.advance_to_next_block(block, [p])
        # the program is now live
        assert "counter.aleo" in led.vm.process.stacks
        p2 = led.vm.execute(led._key, "counter.aleo", "bump", ["5field"],
                            [("public", "field")])
        b2 = led.prepare_advance_to_next_beacon_block([p2])
        led.advance_to_next_block(b2, [p2])
        from snarkvm_tpu.synthesizer.finalize import _key_of
        from snarkvm_tpu.console.types import literal_from_str
        v = led.vm.store.mapping("counter.aleo", "count").get_confirmed(
            _key_of(literal_from_str("5field")))
        assert v is not None and v.value.value == 1

    def test_duplicate_deploy_rejected_in_block(self, ledger):
        led = ledger
        with pytest.raises(Exception, match="already exists"):
            led.vm.deploy_transaction(led._key, COUNTER)

    def test_deploy_with_certificates(self, ledger):
        from snarkvm_tpu.polycommit import kzg
        from snarkvm_tpu.synthesizer import deploy as D
        led = ledger
        srs = kzg.test_srs(1 << 16)   # full transition circuits (~12.5k constraints)
        text = COUNTER.replace("counter.aleo", "counter2.aleo")
        p = led.vm.deploy_transaction(led._key, text, srs=srs)
        dep = p.deployment
        assert len(dep.verifying_keys) == 1
        # certificates verify
        from snarkvm_tpu.synthesizer.process import Stack
        from snarkvm_tpu.synthesizer.program import parse_program
        stack = Stack(parse_program(text))
        assert D.verify_deployment(srs, stack, dep, random.Random(1))
        block = led.prepare_advance_to_next_beacon_block([p])
        led.advance_to_next_block(block, [p])
        assert "counter2.aleo" in led.vm.process.stacks


def test_program_owner_signature():
    """ProgramOwner (console/program owner): deploy txs carry the
    deployer's signature over the deployment ID; tampering fails."""
    import random as _r
    from snarkvm_tpu.console import account
    from snarkvm_tpu.synthesizer.vm import VM
    from snarkvm_tpu.synthesizer.deploy import ProgramOwner

    rng = _r.Random(31)
    vm = VM(rng)
    pk = account.PrivateKey.new(rng)
    prog = "program owned.aleo;\n\nfunction noop:\n    input r0 as u8.private;\n    output r0 as u8.private;\n"
    p = vm.deploy_transaction(pk, prog)
    owner = p.transaction.owner
    did = p.deployment.to_deployment_id()
    assert owner.verify(did)
    vm.check_transaction(p)   # owner check passes (feeless dev deploy)
    # wrong deployment id -> fails
    assert not owner.verify(did + 1)
    # forged owner (different key) -> check_transaction raises
    other = account.PrivateKey.new(rng)
    p.transaction.owner = ProgramOwner.new(other, did + 1, rng)
    vm._partially_verified.clear()
    import pytest as _pt
    with _pt.raises(ValueError, match="owner"):
        vm.check_transaction(p)
