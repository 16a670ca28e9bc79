"""credits.aleo: parse the real protocol program and run the public flows
(mirrors synthesizer/process/src/tests/test_credits.rs scenarios)."""
import importlib.resources as _res
import random

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import Value, literal_to_str
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack, value_to_str
from snarkvm_tpu.synthesizer import finalize as F
from snarkvm_tpu.synthesizer.finalize import _key_of
from snarkvm_tpu.console.types import literal_from_str

rng = random.Random(314)

CREDITS = open("snarkvm_tpu/synthesizer/resources/credits.aleo").read()


def _addr_str(pt):
    from snarkvm_tpu.utils.encoding import bech32m_encode
    return bech32m_encode("aleo", pt[0].to_bytes(32, "little"))


def _balance(store, addr_str):
    v = store.mapping("credits.aleo", "account").get_confirmed(_key_of(literal_from_str(addr_str)))
    return v.value.value if v is not None else None


def test_transfer_public_end_to_end():
    stack = Stack(parse_program(CREDITS))
    alice = account.PrivateKey.new(rng)
    bob = account.PrivateKey.new(rng)
    a_str, b_str = _addr_str(alice.to_address()), _addr_str(bob.to_address())

    # run the on-chain function: async -> future with (signer, receiver, amount)
    outs = stack.evaluate_function("transfer_public", [b_str, "1000u64"],
                                   signer=alice.to_address(), caller=alice.to_address())
    assert outs[0].kind == "future"
    _, fname, args = outs[0].value
    assert fname == "transfer_public"

    # seed alice's balance, then speculate the finalize
    store = F.FinalizeStore()
    from snarkvm_tpu.console.types import Plaintext
    store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(a_str)), Plaintext.literal("u64", 5000))
    state = F.FinalizeGlobalState(block_height=10)
    acc, rej = F.speculate({"credits.aleo": stack},
                           [("credits.aleo", "transfer_public", args, 1)], store, state)
    assert acc == [0]
    F.finalize_commit(store)
    assert _balance(store, a_str) == 4000
    assert _balance(store, b_str) == 1000


def test_transfer_public_insufficient_balance_rejected():
    stack = Stack(parse_program(CREDITS))
    alice = account.PrivateKey.new(rng)
    bob = account.PrivateKey.new(rng)
    a_str, b_str = _addr_str(alice.to_address()), _addr_str(bob.to_address())
    outs = stack.evaluate_function("transfer_public", [b_str, "1000u64"],
                                   signer=alice.to_address(), caller=alice.to_address())
    _, _, args = outs[0].value
    store = F.FinalizeStore()
    state = F.FinalizeGlobalState()
    acc, rej = F.speculate({"credits.aleo": stack},
                           [("credits.aleo", "transfer_public", args, 1)], store, state)
    assert rej == [0]  # no balance -> `get` halts -> rejected
    F.finalize_commit(store)
    assert _balance(store, b_str) is None
