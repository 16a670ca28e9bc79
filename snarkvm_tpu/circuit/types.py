"""Circuit gadget types: field, boolean, integers, group — dual-value
(console value + linear combination) mirrors of circuit/types/*.

Each gadget keeps its evaluated value alongside its LC so witness
generation is single-pass (the "two worlds" execute in lock-step,
SURVEY.md §1).
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from .builder import CircuitBuilder, LinearCombination, CONSTANT, PUBLIC, PRIVATE

R = P.R


class CField:
    __slots__ = ("b", "lc")

    def __init__(self, builder: CircuitBuilder, lc: LinearCombination):
        self.b = builder
        self.lc = lc

    @classmethod
    def new(cls, builder, mode, value: int):
        return cls(builder, builder.new_variable(mode, value))

    @classmethod
    def constant(cls, builder, value: int):
        return cls(builder, LinearCombination(value))

    @property
    def value(self) -> int:
        return self.b.value_of(self.lc)

    # -- linear ops (free) --
    def __add__(self, o):
        return CField(self.b, self.lc.add(o.lc))

    def __sub__(self, o):
        return CField(self.b, self.lc.add(o.lc, R - 1))

    def __neg__(self):
        return CField(self.b, self.lc.scale(R - 1))

    def scale_const(self, k: int):
        return CField(self.b, self.lc.scale(k))

    def add_const(self, k: int):
        return CField(self.b, self.lc.add(LinearCombination(k)))

    # -- multiplicative ops (1 constraint) --
    def __mul__(self, o):
        if self.lc.is_constant():
            return CField(self.b, o.lc.scale(self.lc.constant))
        if o.lc.is_constant():
            return CField(self.b, self.lc.scale(o.lc.constant))
        prod = self.value * o.value % R
        out = self.b.new_private(prod)
        self.b.enforce(self.lc, o.lc, out)
        return CField(self.b, out)

    def square(self):
        return self * self

    def inverse(self):
        v = self.value
        inv = pow(v, -1, R)
        out = self.b.new_private(inv)
        self.b.enforce(self.lc, out, LinearCombination(1))
        return CField(self.b, out)

    def pow_const(self, e: int):
        if e == 0:
            return CField.constant(self.b, 1)
        result = None
        base = self
        while e:
            if e & 1:
                result = base if result is None else result * base
            e >>= 1
            if e:
                base = base.square()
        return result

    # -- equality / assertions --
    def assert_eq(self, o):
        self.b.assert_eq(self.lc, o.lc)

    def is_equal(self, o) -> "CBool":
        """1 constraint pair: (a-b) * inv = 1 - eq; (a-b) * eq = 0."""
        diff = self - o
        dv = diff.value
        eq_val = 1 if dv == 0 else 0
        eq = self.b.new_private(eq_val)
        inv_val = pow(dv, -1, R) if dv else 0
        inv = self.b.new_private(inv_val)
        one = LinearCombination(1)
        self.b.enforce(diff.lc, inv, one.add(eq, R - 1))
        self.b.enforce(diff.lc, eq, LinearCombination(0))
        return CBool(self.b, eq)

    def ternary(self, cond: "CBool", other: "CField"):
        """cond ? self : other — 1 constraint."""
        out_val = self.value if cond.value else other.value
        out = self.b.new_private(out_val)
        # cond * (self - other) = out - other
        self.b.enforce(cond.lc, self.lc.add(other.lc, R - 1), out.add(other.lc, R - 1))
        return CField(self.b, out)

    def to_bits_le(self, num_bits: int = 253):
        """Bit decomposition with recomposition constraint (+ range implied
        by bit count)."""
        v = self.value
        bits = []
        acc = LinearCombination(0)
        coeff = 1
        for i in range(num_bits):
            bit = CBool.new(self.b, PRIVATE, (v >> i) & 1)
            bits.append(bit)
            acc = acc.add(bit.lc, coeff)
            coeff = coeff * 2 % R
        self.b.assert_eq(acc, self.lc)
        return bits


class CBool:
    __slots__ = ("b", "lc")

    def __init__(self, builder, lc):
        self.b = builder
        self.lc = lc

    @classmethod
    def new(cls, builder, mode, value):
        lc = builder.new_variable(mode, 1 if value else 0)
        out = cls(builder, lc)
        if mode != CONSTANT:
            # b * (1 - b) = 0
            builder.enforce(lc, LinearCombination(1).add(lc, R - 1), LinearCombination(0))
        return out

    @classmethod
    def constant(cls, builder, value):
        return cls(builder, LinearCombination(1 if value else 0))

    @property
    def value(self) -> bool:
        return self.b.value_of(self.lc) != 0

    def __and__(self, o):
        out = self.b.new_private(1 if (self.value and o.value) else 0)
        self.b.enforce(self.lc, o.lc, out)
        return CBool(self.b, out)

    def __or__(self, o):
        # a | b = a + b - a*b
        land = self & o
        return CBool(self.b, self.lc.add(o.lc).add(land.lc, R - 1))

    def __xor__(self, o):
        # a ^ b = a + b - 2ab
        land = self & o
        return CBool(self.b, self.lc.add(o.lc).add(land.lc, R - 2))

    def __invert__(self):
        return CBool(self.b, LinearCombination(1).add(self.lc, R - 1))

    def assert_true(self):
        self.b.assert_eq(self.lc, LinearCombination(1))

    def to_field(self) -> CField:
        return CField(self.b, self.lc)


class CInteger:
    """Unsigned/signed integers as bit vectors (circuit/types/integers)."""

    __slots__ = ("b", "bits", "width", "signed")

    def __init__(self, builder, bits, width, signed=False):
        self.b = builder
        self.bits = bits
        self.width = width
        self.signed = signed

    @classmethod
    def new(cls, builder, mode, value: int, width: int, signed=False):
        mask = (1 << width) - 1
        v = value & mask
        bits = [CBool.new(builder, mode, (v >> i) & 1) for i in range(width)]
        return cls(builder, bits, width, signed)

    @property
    def value(self) -> int:
        v = 0
        for i, bt in enumerate(self.bits):
            if bt.value:
                v |= 1 << i
        if self.signed and (v >> (self.width - 1)) & 1:
            v -= 1 << self.width
        return v

    def to_field(self) -> CField:
        acc = LinearCombination(0)
        coeff = 1
        for bt in self.bits:
            acc = acc.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        return CField(self.b, acc)

    def add_checked(self, o: "CInteger") -> "CInteger":
        """Unsigned checked add: decompose field sum into width+1 bits, top must be 0."""
        assert not self.signed
        s = self.to_field() + o.to_field()
        total = s.value
        bits = []
        acc = LinearCombination(0)
        coeff = 1
        for i in range(self.width + 1):
            bit = CBool.new(self.b, PRIVATE, (total >> i) & 1)
            bits.append(bit)
            acc = acc.add(bit.lc, coeff)
            coeff = coeff * 2 % R
        self.b.assert_eq(acc, s.lc)
        bits[-1].b.assert_eq(bits[-1].lc, LinearCombination(0))  # overflow flag = 0
        return CInteger(self.b, bits[: self.width], self.width, self.signed)

    def add_wrapped(self, o: "CInteger") -> "CInteger":
        s = self.to_field() + o.to_field()
        total = s.value
        bits = []
        acc = LinearCombination(0)
        coeff = 1
        for i in range(self.width + 1):
            bit = CBool.new(self.b, PRIVATE, (total >> i) & 1)
            bits.append(bit)
            acc = acc.add(bit.lc, coeff)
            coeff = coeff * 2 % R
        self.b.assert_eq(acc, s.lc)
        return CInteger(self.b, bits[: self.width], self.width, self.signed)

    def is_equal(self, o: "CInteger") -> CBool:
        return self.to_field().is_equal(o.to_field())

    # ---- decomposition helper ----
    def _decompose(self, field: CField, nbits: int):
        """Constrain `field`'s value into nbits private bits; returns them."""
        total = field.value
        bits = []
        acc = LinearCombination(0)
        coeff = 1
        for i in range(nbits):
            bit = CBool.new(self.b, PRIVATE, (total >> i) & 1)
            bits.append(bit)
            acc = acc.add(bit.lc, coeff)
            coeff = coeff * 2 % R
        self.b.assert_eq(acc, field.lc)
        return bits

    # ---- arithmetic (circuit/types/integers/src) ----
    def sub_wrapped(self, o: "CInteger") -> "CInteger":
        """a - b + 2^w, keep low w bits."""
        s = self.to_field() + CField.constant(self.b, 1 << self.width) - o.to_field()
        bits = self._decompose(s, self.width + 1)
        return CInteger(self.b, bits[: self.width], self.width, self.signed)

    def sub_checked(self, o: "CInteger") -> "CInteger":
        """Unsigned checked sub: the borrow bit (top of a - b + 2^w) must be 1."""
        assert not self.signed
        s = self.to_field() + CField.constant(self.b, 1 << self.width) - o.to_field()
        bits = self._decompose(s, self.width + 1)
        self.b.assert_eq(bits[-1].lc, LinearCombination(1))
        return CInteger(self.b, bits[: self.width], self.width, self.signed)

    def mul_wrapped(self, o: "CInteger") -> "CInteger":
        """Low-w-bits product. Single field mul when 2w fits the field;
        64-bit-half split for w=128 (integers/src/mul_wrapped.rs shape)."""
        w = self.width
        if 2 * w <= 252:
            prod = self.to_field() * o.to_field()
            bits = self._decompose(prod, 2 * w)
            return CInteger(self.b, bits[:w], w, self.signed)
        # w == 128: a = a0 + 2^64 a1, b = b0 + 2^64 b1
        half = w // 2

        def part(x, lo):
            acc = LinearCombination(0)
            coeff = 1
            for bt in (x.bits[:half] if lo else x.bits[half:]):
                acc = acc.add(bt.lc, coeff)
                coeff = coeff * 2 % R
            return CField(self.b, acc)

        a0, a1 = part(self, True), part(self, False)
        b0, b1 = part(o, True), part(o, False)
        low = a0 * b0                                     # <= 2^128
        cross = a0 * b1 + a1 * b0                         # contributes 2^64..2^192
        low_bits = self._decompose(low, w)
        cross_bits = self._decompose(cross, w + 1)        # low half matters
        out_val = (low.value + (cross.value << half)) & ((1 << w) - 1)
        out = CInteger.new(self.b, PRIVATE, out_val, w, self.signed)
        # out == low + 2^64 * cross (mod 2^128): check the field identity
        # out + 2^128 * k = low + 2^64*cross, with k the discarded carry
        carry_width = half + 2
        k_val = ((low.value + (cross.value << half)) - out_val) >> w
        k_bits = [CBool.new(self.b, PRIVATE, (k_val >> i) & 1)
                  for i in range(carry_width)]
        k_acc = LinearCombination(0)
        coeff = (1 << w) % R
        for bt in k_bits:
            k_acc = k_acc.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        lhs = LinearCombination(0)
        lhs = lhs.add(out.to_field().lc, 1)
        lhs = lhs.add(k_acc, 1)
        rhs = LinearCombination(0)
        rhs = rhs.add(low.lc, 1)
        rhs = rhs.add(cross.lc, (1 << half) % R)
        self.b.assert_eq(lhs, rhs)
        return out

    # ---- bitwise ----
    def bitand(self, o):
        return CInteger(self.b, [a & c for a, c in zip(self.bits, o.bits)],
                        self.width, self.signed)

    def bitor(self, o):
        return CInteger(self.b, [a | c for a, c in zip(self.bits, o.bits)],
                        self.width, self.signed)

    def bitxor(self, o):
        return CInteger(self.b, [a ^ c for a, c in zip(self.bits, o.bits)],
                        self.width, self.signed)

    def bitnot(self):
        return CInteger(self.b, [~a for a in self.bits], self.width, self.signed)

    def nand_int(self, o):
        return CInteger(self.b, [~(a & c) for a, c in zip(self.bits, o.bits)],
                        self.width, self.signed)

    def nor_int(self, o):
        return CInteger(self.b, [~(a | c) for a, c in zip(self.bits, o.bits)],
                        self.width, self.signed)

    # ---- shifts (wrapped: amount mod width; barrel shifter) ----
    def _barrel(self, amount_bits, left: bool):
        bits = list(self.bits)
        logw = (self.width - 1).bit_length()
        fill_top = None
        if not left and self.signed:
            fill_top = self.bits[-1]          # arithmetic shift-right fill
        zero = CBool.constant(self.b, False)
        for k, abit in enumerate(amount_bits[:logw]):
            sh = 1 << k
            shifted = []
            for i in range(self.width):
                j = i - sh if left else i + sh
                if 0 <= j < self.width:
                    src = bits[j]
                elif fill_top is not None and j >= self.width:
                    src = fill_top
                else:
                    src = zero
                shifted.append(src)
            bits = [_bool_select(self.b, abit, s, b0)
                    for s, b0 in zip(shifted, bits)]
        return CInteger(self.b, bits, self.width, self.signed)

    def shl_wrapped(self, amount: "CInteger"):
        return self._barrel(amount.bits, left=True)

    def shr_wrapped(self, amount: "CInteger"):
        return self._barrel(amount.bits, left=False)

    # ---- comparisons ----
    def _unsigned_lt(self, o) -> CBool:
        """a < b  <=>  top bit of (a - b + 2^w) is 0."""
        s = self.to_field() + CField.constant(self.b, 1 << self.width) - o.to_field()
        bits = self._decompose(s, self.width + 1)
        return ~bits[-1]

    def _cmp_key(self):
        """Signed values compare like unsigned with the sign bit flipped."""
        if not self.signed:
            return self
        flipped = list(self.bits)
        flipped[-1] = ~flipped[-1]
        return CInteger(self.b, flipped, self.width, False)

    def lt(self, o) -> CBool:
        return self._cmp_key()._unsigned_lt(o._cmp_key())

    def gt(self, o) -> CBool:
        return o._cmp_key()._unsigned_lt(self._cmp_key())

    def lte(self, o) -> CBool:
        return ~self.gt(o)

    def gte(self, o) -> CBool:
        return ~self.lt(o)

    def ternary(self, cond: CBool, other: "CInteger") -> "CInteger":
        """cond ? self : other, bitwise."""
        return CInteger(self.b,
                        [_bool_select(self.b, cond, a, c)
                         for a, c in zip(self.bits, other.bits)],
                        self.width, self.signed)


def _bool_select(builder, cond: CBool, a: CBool, b: CBool) -> CBool:
    """cond ? a : b  with one constraint: out = b + cond*(a-b)."""
    out_v = a.value if cond.value else b.value
    out = CBool.new(builder, PRIVATE, bool(out_v))
    diff = LinearCombination(0).add(a.lc, 1).add(b.lc, R - 1)
    lhs = LinearCombination(0).add(out.lc, 1).add(b.lc, R - 1)
    builder.enforce(cond.lc, diff, lhs)
    return out


class CGroup:
    """Edwards point gadget in affine coordinates (x, y as CField)."""

    __slots__ = ("b", "x", "y")

    def __init__(self, builder, x: CField, y: CField):
        self.b = builder
        self.x = x
        self.y = y

    @classmethod
    def new(cls, builder, mode, pt):
        x = CField.new(builder, mode, pt[0])
        y = CField.new(builder, mode, pt[1])
        out = cls(builder, x, y)
        if mode != CONSTANT:
            out.assert_on_curve()
        return out

    @classmethod
    def constant(cls, builder, pt):
        return cls(builder, CField.constant(builder, pt[0]), CField.constant(builder, pt[1]))

    @property
    def value(self):
        return (self.x.value, self.y.value)

    def assert_on_curve(self):
        # -x^2 + y^2 = 1 + d x^2 y^2
        x2 = self.x.square()
        y2 = self.y.square()
        lhs = y2 - x2
        x2y2 = x2 * y2
        rhs = x2y2.scale_const(P.EDWARDS_D).add_const(1)
        self.b.assert_eq(lhs.lc, rhs.lc)

    def __add__(self, o: "CGroup"):
        """Complete twisted Edwards addition (3 mul + 2 div constraints)."""
        x1, y1, x2, y2 = self.x, self.y, o.x, o.y
        x1y2 = x1 * y2
        x2y1 = x2 * y1
        y1y2 = y1 * y2
        x1x2 = x1 * x2
        dxy = (x1y2 * x2y1).scale_const(P.EDWARDS_D)
        # x3 = (x1y2 + x2y1) / (1 + d x1x2y1y2)
        x3_num = x1y2 + x2y1
        y3_num = y1y2 + x1x2  # a=-1: y3 = (y1y2 + x1x2)/(1 - d...)
        pt3 = ed.add(self.value, o.value)
        x3 = CField.new(self.b, PRIVATE, pt3[0])
        y3 = CField.new(self.b, PRIVATE, pt3[1])
        one = LinearCombination(1)
        self.b.enforce(x3.lc, one.add(dxy.lc), x3_num.lc)
        self.b.enforce(y3.lc, one.add(dxy.lc, R - 1), y3_num.lc)
        return CGroup(self.b, x3, y3)

    def mul_bits(self, bits):
        """Scalar mul by little-endian CBool bits (double-and-add over gadgets)."""
        acc = CGroup.constant(self.b, ed.IDENTITY_AFFINE)
        base = self
        for bit in bits:
            added = acc + base
            nx = added.x.ternary(bit, acc.x)
            ny = added.y.ternary(bit, acc.y)
            acc = CGroup(self.b, nx, ny)
            base = base + base
        return acc
