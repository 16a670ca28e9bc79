"""Cross-program call trees (process/src/stack/call/mod.rs semantics):
external function calls (caller = calling program's address), external
closures (caller passthrough), nested finalize futures via await."""
import random

import pytest

from snarkvm_tpu.console import account, network as N
from snarkvm_tpu.synthesizer.vm import VM
from snarkvm_tpu.synthesizer.process import Stack, value_to_str
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.interpreter import HaltError
from snarkvm_tpu.synthesizer import finalize as F

rng = random.Random(99)

CHILD = """program child.aleo;

mapping counts:
    key as field.public;
    value as u64.public;

closure triple:
    input r0 as u32;
    mul r0 3u32 into r1;
    output r1 as u32;

function whoami:
    input r0 as field.private;
    cast self.caller into r1 as field;
    add r0 r1 into r2;
    output r1 as field.private;
    output r2 as field.private;

function bump:
    input r0 as field.public;
    async bump r0 into r1;
    output r1 as child.aleo/bump.future;

finalize bump:
    input r0 as field.public;
    get.or_use counts[r0] 0u64 into r1;
    add r1 1u64 into r2;
    set r2 into counts[r0];
"""

PARENT = """import child.aleo;

program parent.aleo;

function relay:
    input r0 as field.private;
    call child.aleo/whoami r0 into r1 r2;
    call child.aleo/triple 7u32 into r3;
    output r1 as field.private;
    output r3 as u32.private;

function bump_twice:
    input r0 as field.public;
    call child.aleo/bump r0 into r1;
    async bump_twice r0 r1 into r2;
    output r2 as parent.aleo/bump_twice.future;

finalize bump_twice:
    input r0 as field.public;
    input r1 as child.aleo/bump.future;
    await r1;
"""


@pytest.fixture(scope="module")
def vm():
    v = VM(rng)
    v.process.deploy(CHILD)
    v.process.deploy(PARENT)
    return v


class TestExternalCalls:
    def test_caller_is_program_address(self, vm):
        stack = vm.process.get_stack("parent.aleo")
        signer = account.PrivateKey.new(rng).to_address()
        outs = stack.evaluate_function("relay", ["5field"],
                                       signer=signer, caller=signer)
        # r1 = child's self.caller as field = parent.aleo's program address x
        expected = N.program_address("parent.aleo")[0]
        got = outs[0].value if not hasattr(outs[0], "kind") else outs[0].value
        from snarkvm_tpu.synthesizer.process import _as_literal
        assert _as_literal(outs[0]).value == expected
        assert _as_literal(outs[1]).value == 21  # closure ran: 7 * 3

    def test_unknown_external_halts(self, vm):
        bad = parse_program("""program lone.aleo;

function go:
    input r0 as u32.private;
    call ghost.aleo/fn r0 into r1;
    output r1 as u32.private;
""")
        stack = Stack(bad)
        with pytest.raises(HaltError, match="not found"):
            stack.evaluate_function("go", ["1u32"], signer=None, caller=None)


class TestNestedFinalize:
    def test_await_runs_child_finalize(self, vm):
        signer = account.PrivateKey.new(rng).to_address()
        stack = vm.process.get_stack("parent.aleo")
        outs = stack.evaluate_function("bump_twice", ["9field"],
                                       signer=signer, caller=signer)
        fut = outs[0]
        assert fut.kind == "future"
        pid, fname, args = fut.value
        assert (pid, fname) == ("parent.aleo", "bump_twice")
        # speculate: parent finalize awaits the child future -> child counts
        state = F.FinalizeGlobalState(block_height=3)
        acc, rej = F.speculate(vm.process.stacks,
                               [("parent.aleo", fname, args, 1)],
                               vm.store, state)
        assert acc == [0]
        F.finalize_commit(vm.store)
        from snarkvm_tpu.synthesizer.finalize import _key_of
        from snarkvm_tpu.console.types import literal_from_str
        v = vm.store.mapping("child.aleo", "counts").get_confirmed(
            _key_of(literal_from_str("9field")))
        assert v is not None and v.value.value == 1

    def test_through_vm_block_pipeline(self, vm):
        pk = account.PrivateKey.new(rng)
        pending = vm.execute(pk, "parent.aleo", "bump_twice", ["4field"],
                             [("public", "field")])
        assert len(pending.futures) == 1
        block = vm.advance_to_next_block([pending])
        assert len(block.transactions) == 1
        from snarkvm_tpu.synthesizer.finalize import _key_of
        from snarkvm_tpu.console.types import literal_from_str
        v = vm.store.mapping("child.aleo", "counts").get_confirmed(
            _key_of(literal_from_str("4field")))
        assert v is not None and v.value.value == 1
