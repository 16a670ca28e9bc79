"""Integer circuit gadgets (circuit/types/integers analog): arithmetic,
bitwise, shifts, comparisons vs the console interpreter, with satisfied
constraint systems, plus a dual-executed program exercising them."""
import random

import pytest

from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CInteger, CBool

rng = random.Random(0x1234)


def _mk(b, v, w, signed=False):
    return CInteger.new(b, PRIVATE, v, w, signed)


def _val(g):
    return g.value


class TestArithmetic:
    @pytest.mark.parametrize("w", [8, 16, 64, 128])
    def test_sub_wrapped(self, w):
        b = CircuitBuilder()
        for _ in range(8):
            x, y = rng.randrange(1 << w), rng.randrange(1 << w)
            g = _mk(b, x, w).sub_wrapped(_mk(b, y, w))
            assert _val(g) == (x - y) & ((1 << w) - 1)
        assert b.is_satisfied()

    def test_sub_checked_underflow_fails(self):
        b = CircuitBuilder()
        with pytest.raises(Exception):
            _mk(b, 3, 8).sub_checked(_mk(b, 5, 8))
            assert not b.is_satisfied()
            raise AssertionError("unsatisfied")

    @pytest.mark.parametrize("w", [8, 32, 64, 128])
    def test_mul_wrapped(self, w):
        b = CircuitBuilder()
        for _ in range(6):
            x, y = rng.randrange(1 << w), rng.randrange(1 << w)
            g = _mk(b, x, w).mul_wrapped(_mk(b, y, w))
            assert _val(g) == (x * y) & ((1 << w) - 1), (w, x, y)
        assert b.is_satisfied()

    def test_mul_wrapped_signed(self):
        b = CircuitBuilder()
        g = _mk(b, -5 & 0xFF, 8, True).mul_wrapped(_mk(b, 7, 8, True))
        assert _val(g) == (-35) & 0xFF or _val(g) == -35  # two's complement view
        assert b.is_satisfied()


class TestBitwiseAndShifts:
    def test_bitwise(self):
        b = CircuitBuilder()
        x, y = 0b1100_1010, 0b1010_0110
        gx, gy = _mk(b, x, 8), _mk(b, y, 8)
        assert _val(gx.bitand(gy)) == x & y
        assert _val(gx.bitor(gy)) == x | y
        assert _val(gx.bitxor(gy)) == x ^ y
        assert _val(gx.bitnot()) == (~x) & 0xFF
        assert _val(gx.nand_int(gy)) == (~(x & y)) & 0xFF
        assert _val(gx.nor_int(gy)) == (~(x | y)) & 0xFF
        assert b.is_satisfied()

    @pytest.mark.parametrize("w", [8, 32])
    def test_shifts(self, w):
        b = CircuitBuilder()
        for _ in range(6):
            x = rng.randrange(1 << w)
            sh = rng.randrange(w)
            g = _mk(b, x, w).shl_wrapped(_mk(b, sh, 8))
            assert _val(g) == (x << sh) & ((1 << w) - 1)
            g = _mk(b, x, w).shr_wrapped(_mk(b, sh, 8))
            assert _val(g) == x >> sh
        assert b.is_satisfied()

    def test_arithmetic_shift_right_signed(self):
        b = CircuitBuilder()
        g = _mk(b, -16 & 0xFF, 8, True).shr_wrapped(_mk(b, 2, 8))
        assert _val(g) == -4
        assert b.is_satisfied()


class TestComparisons:
    @pytest.mark.parametrize("signed", [False, True])
    def test_compare(self, signed):
        b = CircuitBuilder()
        w = 16
        for _ in range(10):
            lo, hi = -(1 << (w - 1)) if signed else 0, 1 << (w - 1) if signed else 1 << w
            x, y = rng.randrange(lo, hi), rng.randrange(lo, hi)
            gx, gy = _mk(b, x & ((1 << w) - 1), w, signed), _mk(b, y & ((1 << w) - 1), w, signed)
            assert gx.lt(gy).value == (x < y)
            assert gx.gt(gy).value == (x > y)
            assert gx.lte(gy).value == (x <= y)
            assert gx.gte(gy).value == (x >= y)
        assert b.is_satisfied()

    def test_ternary(self):
        b = CircuitBuilder()
        t = CBool.new(b, PRIVATE, True)
        f = CBool.new(b, PRIVATE, False)
        gx, gy = _mk(b, 11, 8), _mk(b, 22, 8)
        assert _val(gx.ternary(t, gy)) == 11
        assert _val(gx.ternary(f, gy)) == 22
        assert b.is_satisfied()


class TestDualExecution:
    def test_program_with_integer_ops(self):
        from snarkvm_tpu.synthesizer.program import parse_program
        from snarkvm_tpu.synthesizer.process import Stack
        from snarkvm_tpu.synthesizer.circuit_exec import DualStack
        prog = parse_program("""program intops.aleo;

function go:
    input r0 as u32.private;
    input r1 as u32.private;
    mul.w r0 r1 into r2;
    xor r2 r0 into r3;
    shl.w r3 2u8 into r4;
    lt r4 r0 into r5;
    sub.w r4 r1 into r6;
    ternary r5 r6 r2 into r7;
    output r7 as u32.private;
""")
        dual = DualStack(Stack(prog))
        outs, builder = dual.execute_function("go", ["57005u32", "48879u32"])
        assert builder.is_satisfied()
        # cross-check vs pure console run
        console = Stack(prog).evaluate_function("go", ["57005u32", "48879u32"])
        from snarkvm_tpu.synthesizer.process import _as_literal
        assert outs[0].literal.value == _as_literal(console[0]).value
        # real constraints were generated (not just witness injection)
        assert builder.num_constraints > 200


class TestCommitDispatch:
    def test_commit_instructions_constrained(self):
        import jax
        from snarkvm_tpu.synthesizer.program import parse_program
        from snarkvm_tpu.synthesizer.process import Stack, _as_literal
        from snarkvm_tpu.synthesizer.circuit_exec import DualStack
        prog = parse_program("""program commits.aleo;

function go:
    input r0 as u64.private;
    input r1 as scalar.private;
    commit.bhp256 r0 r1 into r2 as field;
    commit.ped128 r0 r1 into r3 as field;
    output r2 as field.private;
    output r3 as field.private;
""")
        dual = DualStack(Stack(prog))
        outs, b = dual.execute_function("go", ["12345u64", "999scalar"])
        assert b.is_satisfied()
        console = Stack(prog).evaluate_function("go", ["12345u64", "999scalar"])
        assert outs[0].literal.value == _as_literal(console[0]).value
        assert outs[1].literal.value == _as_literal(console[1]).value
        assert b.value_of(outs[0].gadget.lc) == outs[0].literal.value
