"""Finalize engine: mapping ops, branches, rand.chacha, speculation rollback."""
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import finalize as F

PROGRAM = """
program bank.aleo;

mapping balances:
    key as address.public;
    value as u64.public;

function deposit:
    input r0 as u64.public;
    output r0 as u64.public;

finalize deposit:
    input r0 as address.public;
    input r1 as u64.public;
    get.or_use balances[r0] 0u64 into r2;
    add r2 r1 into r3;
    set r3 into balances[r0];

finalize overdraw:
    input r0 as address.public;
    input r1 as u64.public;
    get balances[r0] into r2;
    sub r2 r1 into r3;
    set r3 into balances[r0];

finalize branching:
    input r0 as u64.public;
    is.eq r0 7u64 into r1;
    branch.eq r1 true to lucky;
    set 0u64 into balances[aleo1wvgwnqvy46qq0zemj0k6sfp3zv0mp77rw97khvwuhac05yuwscxqmfyhwf];
    branch.eq true true to done;
    position lucky;
    set 777u64 into balances[aleo1wvgwnqvy46qq0zemj0k6sfp3zv0mp77rw97khvwuhac05yuwscxqmfyhwf];
    position done;

finalize roll:
    input r0 as field.public;
    rand.chacha r0 into r1 as u64;
    set r1 into balances[aleo1wvgwnqvy46qq0zemj0k6sfp3zv0mp77rw97khvwuhac05yuwscxqmfyhwf];
"""

ADDR = "aleo1wvgwnqvy46qq0zemj0k6sfp3zv0mp77rw97khvwuhac05yuwscxqmfyhwf"


def _setup():
    stack = Stack(parse_program(PROGRAM))
    store = F.FinalizeStore()
    state = F.FinalizeGlobalState(block_height=5, random_seed=42)
    return stack, store, state


def test_deposit_and_rollback():
    stack, store, state = _setup()
    stacks = {"bank.aleo": stack}
    txs = [
        ("bank.aleo", "deposit", [ADDR, "100u64"], 1),
        ("bank.aleo", "overdraw", [ADDR, "500u64"], 2),   # sub overflow -> halt -> rejected
        ("bank.aleo", "deposit", [ADDR, "50u64"], 3),
    ]
    accepted, rejected = F.speculate(stacks, txs, store, state)
    assert accepted == [0, 2] and rejected == [1]
    F.finalize_commit(store)
    m = store.mapping("bank.aleo", "balances")
    from snarkvm_tpu.synthesizer.finalize import _key_of
    from snarkvm_tpu.console.types import literal_from_str
    bal = m.get_confirmed(_key_of(literal_from_str(ADDR)))
    assert bal.value.value == 150


def test_branching():
    stack, store, state = _setup()
    acc, rej = F.speculate({"bank.aleo": stack},
                           [("bank.aleo", "branching", ["7u64"], 1)], store, state)
    assert acc == [0]
    F.finalize_commit(store)
    from snarkvm_tpu.synthesizer.finalize import _key_of
    from snarkvm_tpu.console.types import literal_from_str
    v = store.mapping("bank.aleo", "balances").get_confirmed(_key_of(literal_from_str(ADDR)))
    assert v.value.value == 777


def test_rand_chacha_deterministic():
    stack, store, state = _setup()
    F.speculate({"bank.aleo": stack}, [("bank.aleo", "roll", ["1field"], 9)], store, state)
    F.finalize_commit(store)
    from snarkvm_tpu.synthesizer.finalize import _key_of
    from snarkvm_tpu.console.types import literal_from_str
    v1 = store.mapping("bank.aleo", "balances").get_confirmed(_key_of(literal_from_str(ADDR)))
    # rerun from scratch -> same randomness
    stack2, store2, state2 = _setup()
    F.speculate({"bank.aleo": stack2}, [("bank.aleo", "roll", ["1field"], 9)], store2, state2)
    F.finalize_commit(store2)
    v2 = store2.mapping("bank.aleo", "balances").get_confirmed(_key_of(literal_from_str(ADDR)))
    assert v1.value.value == v2.value.value
    # different seed -> different value
    stack3, store3, state3 = _setup()
    F.speculate({"bank.aleo": stack3}, [("bank.aleo", "roll", ["2field"], 9)], store3, state3)
    F.finalize_commit(store3)
    v3 = store3.mapping("bank.aleo", "balances").get_confirmed(_key_of(literal_from_str(ADDR)))
    assert v3.value.value != v1.value.value
