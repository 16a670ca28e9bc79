"""Fee/cost model (synthesizer/process/src/cost.rs mirror).

The credits.aleo finalize costs are hand-derivable from the reference's
cost table (e.g. transfer_public: 2x get.or_use on 32-byte address keys
= 10,320 each, 2x set of u64 under address keys = 14,000 each, add + sub
= 500 each -> 49,640 microcredits, the well-known base fee)."""
import pytest

from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import cost as C
from snarkvm_tpu.synthesizer.interpreter import HaltError

CREDITS = open("snarkvm_tpu/synthesizer/resources/credits.aleo").read()


@pytest.fixture(scope="module")
def credits_stack():
    return Stack(parse_program(CREDITS))


class TestFinalizeCost:
    def test_transfer_public_is_49640(self, credits_stack):
        assert C.cost_in_microcredits(credits_stack, "transfer_public") == 49_640

    def test_transfer_private_has_no_finalize(self, credits_stack):
        assert C.cost_in_microcredits(credits_stack, "transfer_private") == 0

    def test_mapping_and_hash_pricing(self):
        stack = Stack(parse_program("""program pricing.aleo;

mapping m:
    key as field.public;
    value as u64.public;

function go:
    input r0 as field.public;
    async go r0 into r1;
    output r1 as pricing.aleo/go.future;

finalize go:
    input r0 as field.public;
    get.or_use m[r0] 0u64 into r1;
    hash.bhp256 r0 into r2 as field;
    hash.psd2 r0 into r3 as field;
    hash.keccak256 r0 into r4 as field;
    rand.chacha into r5 as u64;
    set r1 into m[r0];
"""))
        # get.or_use: 10_000 + 10*32; bhp: 50_000 + 300*32;
        # psd: 40_000 + 75*32; keccak: 10_000 + 30*32; rand 25_000;
        # set: 10_000 + 100*(8+32)
        expected = (10_320 + 59_600 + 42_400 + 10_960 + 25_000 + 14_000)
        assert C.cost_in_microcredits(stack, "go") == expected

    def test_future_inputs_add_child_cost(self):
        child = parse_program("""program child.aleo;

mapping m:
    key as field.public;
    value as u64.public;

function f:
    input r0 as field.public;
    async f r0 into r1;
    output r1 as child.aleo/f.future;

finalize f:
    input r0 as field.public;
    get.or_use m[r0] 0u64 into r1;
    set r1 into m[r0];
""")
        stacks = {}
        cstack = Stack(child)
        stacks["child.aleo"] = cstack
        parent = parse_program("""import child.aleo;

program parent.aleo;

function g:
    input r0 as field.public;
    call child.aleo/f r0 into r1;
    async g r1 into r2;
    output r2 as parent.aleo/g.future;

finalize g:
    input r0 as child.aleo/f.future;
    await r0;
""")
        pstack = Stack(parent, external=stacks)
        child_cost = C.cost_in_microcredits(cstack, "f")
        assert child_cost == 10_320 + 14_000
        # parent: child future cost + await (500)
        assert C.cost_in_microcredits(pstack, "g") == child_cost + 500

    def test_typed_premiums(self):
        stack = Stack(parse_program("""program prem.aleo;

function go:
    input r0 as field.public;
    async go r0 into r1;
    output r1 as prem.aleo/go.future;

finalize go:
    input r0 as field.public;
    input r1 as u64.public;
    div r0 r0 into r2;
    div r1 r1 into r3;
    mul r0 r0 into r4;
    inv r0 into r5;
    sqrt r0 into r6;
    pow r0 r1 into r7;
"""))
        # div field 1500, div int 500, mul field 500, inv 2500, sqrt 2500,
        # pow field 1500
        assert C.cost_in_microcredits(stack, "go") == 1_500 + 500 + 500 + 2_500 + 2_500 + 1_500


class TestDeploymentAndExecution:
    def test_execution_storage_penalty(self):
        assert C.execution_storage_cost(4_000) == 4_000
        assert C.execution_storage_cost(5_000) == 5_000
        assert C.execution_storage_cost(10_000) == 10_000 * 10_000 // 5_000

    def test_deployment_namespace_cost(self):
        class FakeVK:
            class circuit_info:
                num_variables = 100
                num_constraints = 100
        class FakeDep:
            program_id = "abcdefgh.aleo"  # 8 chars -> 10^2 credits
            program_text = "x" * 1000
            verifying_keys = [("f", FakeVK(), None)]
        total, (storage, synthesis, namespace) = C.deployment_cost(FakeDep())
        assert namespace == 100 * 1_000_000
        assert storage == (1000 + C.VK_SIZE_BYTES) * 1_000
        assert synthesis == 200 * 25
        assert total == storage + synthesis + namespace
