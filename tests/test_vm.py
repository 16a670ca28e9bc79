"""VM facade: deploy, execute credits transfers, advance blocks."""
import random

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import Plaintext
from snarkvm_tpu.synthesizer.vm import VM
from snarkvm_tpu.synthesizer.finalize import _key_of
from snarkvm_tpu.console.types import literal_from_str
from snarkvm_tpu.utils.encoding import bech32m_encode

rng = random.Random(555)


def _addr(sk):
    return bech32m_encode("aleo", sk.to_address()[0].to_bytes(32, "little"))


def _seed_balance(vm, addr_str, amount):
    vm.store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(addr_str)), Plaintext.literal("u64", amount))


def _balance(vm, addr_str):
    v = vm.store.mapping("credits.aleo", "account").get_confirmed(
        _key_of(literal_from_str(addr_str)))
    return v.value.value if v is not None else None


def test_vm_blocks_with_transfers():
    vm = VM(rng)
    alice, bob = account.PrivateKey.new(rng), account.PrivateKey.new(rng)
    a, b = _addr(alice), _addr(bob)
    _seed_balance(vm, a, 10_000)

    tx1 = vm.execute(alice, "credits.aleo", "transfer_public",
                     [Plaintext.literal("address", bob.to_address()),
                      Plaintext.literal("u64", 3000)],
                     [("public", "address"), ("public", "u64")])
    # overdraw -> rejected at speculation
    tx2 = vm.execute(bob, "credits.aleo", "transfer_public",
                     [Plaintext.literal("address", alice.to_address()),
                      Plaintext.literal("u64", 999_999)],
                     [("public", "address"), ("public", "u64")])
    block = vm.advance_to_next_block([tx1, tx2])
    assert vm.check_next_block(block)
    assert len(block.transactions) == 1
    assert len(block.aborted_transaction_ids) == 1
    assert _balance(vm, a) == 7000
    assert _balance(vm, b) == 3000
    # chain continuity
    tx3 = vm.execute(bob, "credits.aleo", "transfer_public",
                     [Plaintext.literal("address", alice.to_address()),
                      Plaintext.literal("u64", 1000)],
                     [("public", "address"), ("public", "u64")])
    block2 = vm.advance_to_next_block([tx3])
    assert block2.previous_hash == block.hash()
    assert _balance(vm, b) == 2000
    assert vm.block_height == 2


def test_vm_deploy_and_execute():
    vm = VM(rng)
    vm.process.deploy("""
program counter.aleo;

mapping count:
    key as u8.public;
    value as u64.public;

function bump:
    input r0 as u64.public;
    async bump r0 into r1;
    output r1 as counter.aleo/bump.future;

finalize bump:
    input r0 as u64.public;
    get.or_use count[0u8] 0u64 into r1;
    add r1 r0 into r2;
    set r2 into count[0u8];
""")
    sk = account.PrivateKey.new(rng)
    tx = vm.execute(sk, "counter.aleo", "bump",
                    [Plaintext.literal("u64", 7)], [("public", "u64")])
    vm.advance_to_next_block([tx])
    v = vm.store.mapping("counter.aleo", "count").get_confirmed(
        _key_of(literal_from_str("0u8")))
    assert v.value.value == 7
