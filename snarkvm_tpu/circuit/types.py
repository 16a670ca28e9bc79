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
    __slots__ = ("b", "lc", "_bits253")

    def __init__(self, builder: CircuitBuilder, lc: LinearCombination):
        self.b = builder
        self.lc = lc
        self._bits253 = None   # OnceCell analog (field/src/lib.rs bits_le)

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
        """Constant-exponent pow (field/src/pow.rs:48): MSB-first
        square-and-multiply with `output = output * self` — the base (a
        possibly wide LC) lands in the B matrix, matching the reference's
        nz orientation (the Poseidon sbox x^17 is the hot caller)."""
        if e == 0:
            return CField.constant(self.b, 1)
        result = CField.constant(self.b, 1)
        for i in reversed(range(e.bit_length())):
            result = result.square()
            if (e >> i) & 1:
                result = result * self
        return result

    # -- equality / assertions --
    def assert_eq(self, o):
        self.b.assert_eq(self.lc, o.lc)

    def is_constant(self) -> bool:
        return self.lc.is_constant()

    def is_not_equal(self, o) -> "CBool":
        """field/src/equal.rs:38 — allocate (multiplier, is_neq);
        enforce (a-b) * multiplier = is_neq and (a-b) * (1 - is_neq) = 0."""
        if self.is_constant() and o.is_constant():
            return CBool.constant(self.b, self.value != o.value)
        diff = self - o
        dv = diff.value
        is_neq_v = 1 if dv != 0 else 0
        multiplier_v = pow(dv, -1, R) if dv else 1
        multiplier = self.b.new_private(multiplier_v)
        is_neq = self.b.new_private(is_neq_v)
        self.b.enforce(diff.lc, multiplier, is_neq)
        self.b.enforce(diff.lc, LinearCombination(1).add(is_neq, R - 1),
                       LinearCombination(0))
        return CBool(self.b, is_neq)

    def is_equal(self, o) -> "CBool":
        """field/src/equal.rs:26: NOT is_not_equal."""
        return ~self.is_not_equal(o)

    def ternary(self, cond: "CBool", other: "CField"):
        """cond ? self : other (field/src/ternary.rs): constant condition
        picks an arm; constant arms fold to a linear form in `cond`; else
        `(a - b) * condition = (witness - b)`."""
        if cond.is_constant():
            return self if cond.value else other
        if self.is_constant() and other.is_constant():
            # cond*a + (1-cond)*b — linear, no constraint
            a_v, b_v = self.lc.constant, other.lc.constant
            return CField(self.b, LinearCombination(b_v).add(
                cond.lc, (a_v - b_v) % R))
        out_val = self.value if cond.value else other.value
        out = self.b.new_private(out_val)
        self.b.enforce(self.lc.add(other.lc, R - 1), cond.lc,
                       out.add(other.lc, R - 1))
        return CField(self.b, out)

    def to_bits_le(self, num_bits: int = 253, canonical=None):
        """Bit decomposition (field/src/helpers/to_bits.rs:36 /
        to_lower_bits.rs:25): allocate bits, enforce
        `self == sum 2^i b_i` (A = self, C = accumulator), and for the
        full-width form assert bits <= p-1 so the representation is
        unique — the reference's Field::to_bits_le is ALWAYS canonical;
        to_lower_bits_le(k < 253) is not (upper bits are implicitly
        zero)."""
        if canonical is None:
            canonical = num_bits >= 253
        if self.lc.is_constant():
            v = self.lc.constant
            return [CBool.constant(self.b, (v >> i) & 1)
                    for i in range(num_bits)]
        # the reference caches the canonical decomposition per Field
        # object (bits_le OnceCell) — a second to_bits is free
        if canonical and num_bits == 253 and self._bits253 is not None:
            return self._bits253
        v = self.value
        bits = []
        acc = LinearCombination(0)
        coeff = 1
        for i in range(num_bits):
            bit = CBool.new(self.b, PRIVATE, (v >> i) & 1)
            bits.append(bit)
            acc = acc.add(bit.lc, coeff)
            coeff = coeff * 2 % R
        self.b.assert_eq(self.lc, acc)
        if canonical and num_bits >= 253:
            _assert_bits_lte_const(self.b, bits, R - 1)
        if canonical and num_bits == 253:
            self._bits253 = bits
        return bits

    def to_lower_bits_le(self, k: int):
        """field/src/helpers/to_lower_bits.rs:25 — k-bit decomposition;
        upper bits are enforced zero by the recomposition constraint."""
        return self.to_bits_le(k, canonical=False)

    # -- division / roots / powers (circuit/types/field/src) --
    def div(self, o: "CField") -> "CField":
        """self / o — halts (unsatisfiable) when o = 0, via o.inverse()."""
        return self * o.inverse()

    def sqrt(self) -> "CField":
        """The bitwise-lesser square root (field/src/square_root.rs):
        witness s with s*s = self and s <= (p-1)/2."""
        v = self.value
        from ..fields.scalar import Fr
        s = Fr(v).sqrt()
        sv = 0 if s is None else min(s.v, (R - s.v) % R)
        root = CField.new(self.b, PRIVATE, sv)
        self.b.enforce(root.lc, root.lc, self.lc)
        bits = root.to_bits_le(253)
        _assert_bits_lte_const(self.b, bits, (R - 1) // 2)
        return root

    def even_sqrt(self) -> "CField":
        """The even square root (field/src/square_root.rs
        even_square_root): witness s with s*s = self, lsb(s) = 0."""
        v = self.value
        from ..fields.scalar import Fr
        s = Fr(v).sqrt()
        sv = 0
        if s is not None:
            sv = s.v if (s.v & 1) == 0 else (R - s.v) % R
        root = CField.new(self.b, PRIVATE, sv)
        self.b.enforce(root.lc, root.lc, self.lc)
        bits = root.to_bits_le(253)
        self.b.assert_eq(bits[0].lc, LinearCombination(0))
        return root

    def pow_var(self, exponent: "CField") -> "CField":
        """self ** exponent (variable exponent; field/src/pow.rs):
        MSB-first square-and-multiply over the exponent's bits."""
        ebits = exponent.to_bits_le(253, canonical=True)
        acc = CField.constant(self.b, 1)
        for bit in reversed(ebits):
            acc = acc.square()
            mul = acc * self
            acc = mul.ternary(bit, acc)
        return acc

    # -- comparisons (field/src/compare.rs): bitwise LSB->MSB fold --
    def is_less_than(self, o: "CField") -> "CBool":
        """field/src/compare.rs:22 — four cases by constancy; the
        variable-variable fold is `ternary(this ^ that, that, rest)`."""
        if self.is_constant() and o.is_constant():
            return CBool.constant(self.b, self.value < o.value)
        if self.is_constant():
            a_v = self.value
            lt = CBool.constant(self.b, False)
            for i, that in enumerate(o.to_bits_le()):
                if (a_v >> i) & 1:
                    lt = that & lt
                else:
                    lt = that | lt
            return lt
        if o.is_constant():
            b_v = o.value
            lt = CBool.constant(self.b, False)
            for i, this in enumerate(self.to_bits_le()):
                if (b_v >> i) & 1:
                    lt = (~this) | lt
                else:
                    lt = (~this) & lt
            return lt
        a_bits = self.to_bits_le()
        b_bits = o.to_bits_le()
        lt = CBool.constant(self.b, False)
        for this, that in zip(a_bits, b_bits):
            lt = _bool_select(self.b, this ^ that, that, lt)
        return lt

    def lt(self, o):
        return self.is_less_than(o)

    def gt(self, o):
        return o.is_less_than(self)

    def lte(self, o):
        return ~o.is_less_than(self)

    def gte(self, o):
        return ~self.is_less_than(o)


class CBool:
    __slots__ = ("b", "lc")

    def __init__(self, builder, lc):
        self.b = builder
        self.lc = lc

    @classmethod
    def new(cls, builder, mode, value):
        lc = builder.new_variable(mode, 1 if value else 0)
        out = cls(builder, lc)
        # Ensure (1 - a) * a = 0 (boolean/src/lib.rs:66-68) — the
        # reference enforces in every mode; the all-constant row is
        # dropped by the environment.
        builder.enforce(LinearCombination(1).add(lc, R - 1), lc,
                        LinearCombination(0))
        return out

    @classmethod
    def constant(cls, builder, value):
        return cls(builder, LinearCombination(1 if value else 0))

    @property
    def value(self) -> bool:
        return self.b.value_of(self.lc) != 0

    def is_constant(self) -> bool:
        return self.lc.is_constant()

    def __and__(self, o):
        """boolean/src/and.rs: constant short-circuits; else
        `self * other = output`."""
        if self.is_constant():
            return o if self.value else self
        if o.is_constant():
            return self if o.value else o
        out = self.b.new_private(1 if (self.value and o.value) else 0)
        self.b.enforce(self.lc, o.lc, out)
        return CBool(self.b, out)

    def __or__(self, o):
        """boolean/src/or.rs: constant short-circuits; else
        `(1 - self) * (1 - other) = (1 - output)`."""
        if self.is_constant():
            return self if self.value else o
        if o.is_constant():
            return o if o.value else self
        out = self.b.new_private(1 if (self.value or o.value) else 0)
        one = LinearCombination(1)
        self.b.enforce(one.add(self.lc, R - 1), one.add(o.lc, R - 1),
                       one.add(out, R - 1))
        return CBool(self.b, out)

    def __xor__(self, o):
        """boolean/src/xor.rs: constant folds to other/!other; else
        `(self + self) * other = (self + other - output)`."""
        if self.is_constant():
            return o if not self.value else ~o
        if o.is_constant():
            return self if not o.value else ~self
        out = self.b.new_private(1 if (self.value != o.value) else 0)
        self.b.enforce(self.lc.add(self.lc), o.lc,
                       self.lc.add(o.lc).add(out, R - 1))
        return CBool(self.b, out)

    def __invert__(self):
        return CBool(self.b, LinearCombination(1).add(self.lc, R - 1))

    def nand(self, o):
        """boolean/src/nand.rs: `self * other = (1 - output)`."""
        if self.is_constant():
            return ~o if self.value else CBool.constant(self.b, True)
        if o.is_constant():
            return ~self if o.value else CBool.constant(self.b, True)
        out = self.b.new_private(0 if (self.value and o.value) else 1)
        self.b.enforce(self.lc, o.lc, LinearCombination(1).add(out, R - 1))
        return CBool(self.b, out)

    def nor(self, o):
        """boolean/src/nor.rs: `(1 - self) * (1 - other) = output`."""
        if self.is_constant():
            return ~o if not self.value else CBool.constant(self.b, False)
        if o.is_constant():
            return ~self if not o.value else CBool.constant(self.b, False)
        out = self.b.new_private(1 if not (self.value or o.value) else 0)
        one = LinearCombination(1)
        self.b.enforce(one.add(self.lc, R - 1), one.add(o.lc, R - 1), out)
        return CBool(self.b, out)

    def ternary(self, cond: "CBool", other: "CBool") -> "CBool":
        """cond ? self : other (boolean/src/ternary.rs): constant arms
        fold to and/or forms; else `condition * (a - b) = (output - b)`."""
        return _bool_select(self.b, cond, self, other)

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

    @property
    def msb(self) -> CBool:
        return self.bits[-1]

    def add_checked(self, o: "CInteger") -> "CInteger":
        """Checked add (integers/src/add_checked.rs:69). Unsigned:
        witness the wrapped sum and assert the field identity — overflow
        has no satisfying witness (BITS+1 constraints). Signed: extract
        BITS+1 lower bits of the field sum, drop the carry, and assert
        no same-sign overflow (BITS+6 constraints)."""
        if not self.signed:
            sum_v = (self.value + o.value) & ((1 << self.width) - 1)
            out = CInteger.new(self.b, PRIVATE, sum_v, self.width, False)
            computed = self.to_field() + o.to_field()
            self.b.assert_eq(computed.lc, out.to_field().lc)
            return out
        s = self.to_field() + o.to_field()
        bits = s.to_lower_bits_le(self.width + 1)
        out = CInteger(self.b, bits[: self.width], self.width, True)
        is_same_sign = ~(self.msb ^ o.msb)
        is_overflow = is_same_sign & (out.msb ^ self.msb)
        self.b.assert_eq(is_overflow.lc, LinearCombination(0))
        return out

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
        """Checked sub (integers/src/sub_checked.rs:69): difference =
        a + !b + 1 on the field; extract BITS+1 lower bits; unsigned
        asserts the carry is one, signed asserts no different-signs
        underflow."""
        difference = (self.to_field() + o.bitnot().to_field()
                      + CField.constant(self.b, 1))
        bits = difference.to_lower_bits_le(self.width + 1)
        carry = bits[-1]
        out = CInteger(self.b, bits[: self.width], self.width, self.signed)
        if not self.signed:
            self.b.assert_eq(carry.lc, LinearCombination(1))
        else:
            is_different_signs = self.msb ^ o.msb
            is_underflow = is_different_signs & (~(out.msb ^ o.msb))
            self.b.assert_eq(is_underflow.lc, LinearCombination(0))
        return out

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

    # ---- zero/constant predicates ----
    def is_zero(self) -> CBool:
        nz = CBool.constant(self.b, False)
        for bt in self.bits:
            nz = nz | bt
        return ~nz

    def _is_all_ones(self) -> CBool:
        ones = CBool.constant(self.b, True)
        for bt in self.bits:
            ones = ones & bt
        return ones

    def _is_min_signed(self) -> CBool:
        low_nz = CBool.constant(self.b, False)
        for bt in self.bits[:-1]:
            low_nz = low_nz | bt
        return self.msb & ~low_nz

    # ---- negation / absolute value (integers/src/{neg,abs_*}.rs) ----
    def neg_wrapped(self) -> "CInteger":
        """Two's-complement negation, wrapping at MIN (signed)."""
        s = CField.constant(self.b, 1 << self.width) - self.to_field()
        bits = self._decompose(s, self.width + 1)
        return CInteger(self.b, bits[: self.width], self.width, self.signed)

    def neg_checked(self) -> "CInteger":
        """Signed checked negation: halts on MIN (integer `neg` opcode)."""
        assert self.signed, "neg is signed-only"
        out = self.neg_wrapped()
        (~(self.msb & out.msb)).assert_true()
        return out

    def abs_wrapped(self) -> "CInteger":
        """|self| wrapping: MIN stays MIN. Returns an UNSIGNED view (the
        magnitude fits width unsigned bits, incl. |MIN| = 2^(w-1))."""
        if not self.signed:
            return self
        neg = self.neg_wrapped()
        out = neg.ternary(self.msb, self)
        return CInteger(self.b, out.bits, self.width, False)

    def abs_checked(self) -> "CInteger":
        """|self| checked: halts on MIN."""
        if not self.signed:
            return self
        mag = self.abs_wrapped()
        (~mag.msb).assert_true()
        return CInteger(self.b, mag.bits, self.width, True)

    # ---- multiplication with overflow flag (mul_checked.rs) ----
    def mul_flagged(self, o: "CInteger"):
        """Returns (wrapped product, overflow CBool). The flag is sound
        for any witness; mul_checked asserts it, pow_checked asserts it
        conditionally on the exponent bit."""
        w = self.width
        if 2 * w <= 252:
            if not self.signed:
                p = self.to_field() * o.to_field()
                bits = self._decompose(p, 2 * w)
                ov = CBool.constant(self.b, False)
                for bt in bits[w:]:
                    ov = ov | bt
                return CInteger(self.b, bits[:w], w, False), ov
            # signed: multiply the signed field embeddings; shift into
            # [0, 2^2w) and range-check the window (q>>(w-1)) in
            # {2^w - 1, 2^w} via one quadratic.
            a_s = CField(self.b, self.to_field().lc.add(
                self.msb.lc, R - (1 << w) % R))
            b_s = CField(self.b, o.to_field().lc.add(
                o.msb.lc, R - (1 << w) % R))
            p = a_s * b_s
            q = p.add_const((1 << (2 * w - 1)) % R)
            qbits = self._decompose(q, 2 * w)
            t = LinearCombination(0)
            coeff = 1
            for bt in qbits[w - 1:]:
                t = t.add(bt.lc, coeff)
                coeff = coeff * 2 % R
            tf = CField(self.b, t)
            e = tf.add_const(R - ((1 << w) - 1)) * tf.add_const(R - (1 << w))
            ov = ~e.is_equal(CField.constant(self.b, 0))
            return CInteger(self.b, qbits[:w], w, True), ov
        # w == 128
        if not self.signed:
            return self._mul_flagged_u128(o)
        m_a, m_b = self.abs_wrapped(), o.abs_wrapped()
        prod, uflag = m_a._mul_flagged_u128(m_b)
        same_sign = ~(self.msb ^ o.msb)
        lower_nz = CBool.constant(self.b, False)
        for bt in prod.bits[:-1]:
            lower_nz = lower_nz | bt
        ov = uflag | (prod.msb & (same_sign | lower_nz))
        signed_prod = prod.neg_wrapped().ternary(~same_sign, prod)
        return CInteger(self.b, signed_prod.bits, w, True), ov

    def _halves(self):
        """(low, high) unsigned 64-bit field views of a 128-bit integer."""
        half = self.width // 2

        def part(bits):
            acc = LinearCombination(0)
            coeff = 1
            for bt in bits:
                acc = acc.add(bt.lc, coeff)
                coeff = coeff * 2 % R
            return CField(self.b, acc)

        return part(self.bits[:half]), part(self.bits[half:])

    def _mul_flagged_u128(self, o: "CInteger"):
        """128-bit unsigned wrapped product + overflow flag via 64-bit
        halves: P = a0*b0 + 2^64*cross + 2^128*a1*b1."""
        w = self.width
        half = w // 2
        a0, a1 = self._halves()
        b0, b1 = o._halves()
        d1 = a1 * b1
        z1 = d1.is_equal(CField.constant(self.b, 0))
        cross = a0 * b1 + a1 * b0                       # < 2^129
        cross_bits = self._decompose(cross, half + 66)
        hi_or = CBool.constant(self.b, False)
        for bt in cross_bits[half:]:
            hi_or = hi_or | bt
        cross_low = LinearCombination(0)
        coeff = 1
        for bt in cross_bits[:half]:
            cross_low = cross_low.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        s = a0 * b0 + CField(self.b, cross_low).scale_const((1 << half) % R)
        sbits = self._decompose(s, w + 1)
        ov = ~z1 | hi_or | sbits[w]
        return CInteger(self.b, sbits[:w], w, False), ov

    def mul_checked(self, o: "CInteger") -> "CInteger":
        out, ov = self.mul_flagged(o)
        (~ov).assert_true()
        return CInteger(self.b, out.bits, self.width, self.signed)

    # ---- division / remainder (div_checked.rs, rem_checked.rs) ----
    def _divrem_unsigned(self, o: "CInteger"):
        """Euclidean q, r with a = q*b + r, 0 <= r < b. Unsatisfiable for
        b = 0 (r < 0 impossible) — div/rem by zero halts."""
        assert not self.signed
        w = self.width
        av, bv = self.value, o.value
        qv, rv = (av // bv, av % bv) if bv else (0, 0)
        q = CInteger.new(self.b, PRIVATE, qv, w, False)
        r = CInteger.new(self.b, PRIVATE, rv, w, False)
        if 2 * w <= 252:
            prod = q.to_field() * o.to_field()
            self.b.assert_eq(prod.lc.add(r.to_field().lc),
                             self.to_field().lc)
        else:
            half = w // 2
            q0, q1 = q._halves()
            b0, b1 = o._halves()
            d1 = q1 * b1
            self.b.assert_eq(d1.lc, LinearCombination(0))
            cross = q0 * b1 + q1 * b0
            cross_bits = self._decompose(cross, half + 66)
            hi_sum = LinearCombination(0)
            for bt in cross_bits[half:]:
                hi_sum = hi_sum.add(bt.lc, 1)
            self.b.assert_eq(hi_sum, LinearCombination(0))
            s = q0 * b0 + cross.scale_const((1 << half) % R) + r.to_field()
            self.b.assert_eq(s.lc, self.to_field().lc)
        r._unsigned_lt(o).assert_true()
        return q, r

    def _divrem(self, o: "CInteger", checked: bool):
        if not self.signed:
            return self._divrem_unsigned(o)
        m_a, m_b = self.abs_wrapped(), o.abs_wrapped()
        q_m, r_m = m_a._divrem_unsigned(m_b)
        if checked:
            # MIN / -1 overflows
            (~(self._is_min_signed() & o._is_all_ones())).assert_true()
        sign_q = self.msb ^ o.msb
        q = q_m.neg_wrapped().ternary(sign_q, q_m)
        r = r_m.neg_wrapped().ternary(self.msb, r_m)
        return (CInteger(self.b, q.bits, self.width, True),
                CInteger(self.b, r.bits, self.width, True))

    def div_checked(self, o):
        return self._divrem(o, True)[0]

    def div_wrapped(self, o):
        return self._divrem(o, False)[0]

    def rem_checked(self, o):
        return self._divrem(o, True)[1]

    def rem_wrapped(self, o):
        return self._divrem(o, False)[1]

    def modulo(self, o):
        assert not self.signed, "modulo is unsigned-only"
        return self._divrem_unsigned(o)[1]

    # ---- exponentiation (pow_checked.rs / pow_wrapped.rs) ----
    def _pow(self, exponent: "CInteger", checked: bool) -> "CInteger":
        """MSB-first square-and-multiply over the magnitude exponent's
        bits. The square is always checked (a result-prefix power never
        overflows unless the final value does); the multiply-by-self is
        checked only when the exponent bit is set — matching console
        checked_pow halt behavior."""
        result = CInteger.new(self.b, CONSTANT, 1, self.width, self.signed)
        for bit in reversed(exponent.bits):
            if checked:
                result = result.mul_checked(result)
                timesr, ov = result.mul_flagged(self)
                (~(ov & bit)).assert_true()
            else:
                result, _ = result.mul_flagged(result)
                timesr, _ = result.mul_flagged(self)
            result = timesr.ternary(bit, result)
        return CInteger(self.b, result.bits, self.width, self.signed)

    def pow_checked(self, exponent):
        return self._pow(exponent, True)

    def pow_wrapped(self, exponent):
        return self._pow(exponent, False)

    # ---- checked shifts (shl_checked.rs / shr_checked.rs) ----
    def _assert_amount_in_range(self, amount: "CInteger"):
        logw = (self.width - 1).bit_length()
        hi = LinearCombination(0)
        for bt in amount.bits[logw:]:
            hi = hi.add(bt.lc, 1)
        self.b.assert_eq(hi, LinearCombination(0))

    def shl_checked(self, amount: "CInteger") -> "CInteger":
        """Halts if amount >= width or shifted-out bits are lost
        (console checked_shl = checked_mul by 2^amount)."""
        self._assert_amount_in_range(amount)
        shifted = self._barrel(amount.bits, left=True)
        back = shifted._barrel(amount.bits, left=False)
        self.b.assert_eq(back.to_field().lc, self.to_field().lc)
        return shifted

    def shr_checked(self, amount: "CInteger") -> "CInteger":
        """Halts if amount >= width; arithmetic for signed."""
        self._assert_amount_in_range(amount)
        return self._barrel(amount.bits, left=False)


def _bits_lte_const(builder, bits, bound: int) -> CBool:
    """`bits <= bound` — Boolean::is_less_than_or_equal_constant
    (boolean/src/helpers/comparator.rs:23): NOT of the LSB->MSB fold of
    `bound < bits`, with the constant bit selecting AND (1) / OR (0)."""
    rest_is_less = CBool.constant(builder, False)
    for i, that in enumerate(bits):
        if (bound >> i) & 1:
            rest_is_less = that & rest_is_less
        else:
            rest_is_less = that | rest_is_less
    return ~rest_is_less


def _assert_bits_lte_const(builder, bits, bound: int):
    """Boolean::assert_less_than_or_equal_constant
    (boolean/src/helpers/comparator.rs:37)."""
    _bits_lte_const(builder, bits, bound).assert_true()


def _bool_select(builder, cond: CBool, a: CBool, b: CBool) -> CBool:
    """cond ? a : b — Boolean::ternary (boolean/src/ternary.rs:23):
    constant condition/arms fold; else
    `condition * (a - b) = (output - b)`."""
    if cond.is_constant():
        return a if cond.value else b
    if a.is_constant():
        return (cond | b) if a.value else ((~cond) & b)
    if b.is_constant():
        return ((~cond) | a) if b.value else (cond & a)
    out_v = a.value if cond.value else b.value
    out = builder.new_private(1 if out_v else 0)
    diff = LinearCombination(0).add(a.lc, 1).add(b.lc, R - 1)
    rhs = LinearCombination(0).add(out, 1).add(b.lc, R - 1)
    builder.enforce(cond.lc, diff, rhs)
    return CBool(builder, out)


class CGroup:
    """Edwards point gadget in affine coordinates (x, y as CField)."""

    __slots__ = ("b", "x", "y")

    def __init__(self, builder, x: CField, y: CField):
        self.b = builder
        self.x = x
        self.y = y

    @classmethod
    def new(cls, builder, mode, pt):
        """Group injection (circuit/types/group/src/lib.rs:64): allocate
        (x, y) and enforce subgroup membership — the reference's
        `enforce_in_group` (lib.rs:100), not just on-curve."""
        x = CField.new(builder, mode, pt[0])
        y = CField.new(builder, mode, pt[1])
        out = cls(builder, x, y)
        if mode != CONSTANT:
            out.assert_in_group()
        return out

    @classmethod
    def constant(cls, builder, pt):
        return cls(builder, CField.constant(builder, pt[0]), CField.constant(builder, pt[1]))

    @property
    def value(self):
        return (self.x.value, self.y.value)

    def assert_on_curve(self):
        # y^2 * (d x^2 - 1) = a x^2 - 1 with a = -1 — the reference's
        # 3-constraint form (group/src/lib.rs:82 enforce_on_curve)
        x2 = self.x.square()
        y2 = self.y.square()
        second = x2.scale_const(P.EDWARDS_D).add_const(R - 1)
        third = x2.scale_const(R - 1).add_const(R - 1)
        self.b.enforce(y2.lc, second.lc, third.lc)

    def double(self):
        """Edwards doubling (circuit/types/group/src/double.rs:21):
        witness (x3, y3) with x3*(ax^2+y^2)=2xy, y3*(2-ax^2-y^2)=y^2-ax^2."""
        if self._is_constant_zero():
            return self
        if self.is_constant():
            return CGroup.constant(self.b, ed.add(self.value, self.value))
        a = R - 1  # EDWARDS_A = -1
        xy = self.x * self.y
        x2 = self.x.square()
        y2 = self.y.square()
        ax2 = x2.scale_const(a)
        d = ed.add(self.value, self.value)
        x3 = CField.new(self.b, PRIVATE, d[0])
        y3 = CField.new(self.b, PRIVATE, d[1])
        ax2_plus_y2 = ax2 + y2
        self.b.enforce(x3.lc, ax2_plus_y2.lc, xy.lc.scale(2))
        self.b.enforce(y3.lc, LinearCombination(2).add(ax2_plus_y2.lc, R - 1),
                       (y2 - ax2).lc)
        return CGroup(self.b, x3, y3)

    def enforce_double(self, claimed: "CGroup"):
        """Enforce claimed == 2*self without new point witnesses
        (double.rs:66)."""
        a = R - 1
        xy = self.x * self.y
        x2 = self.x.square()
        y2 = self.y.square()
        ax2 = x2.scale_const(a)
        ax2_plus_y2 = ax2 + y2
        self.b.enforce(claimed.x.lc, ax2_plus_y2.lc, xy.lc.scale(2))
        self.b.enforce(claimed.y.lc,
                       LinearCombination(2).add(ax2_plus_y2.lc, R - 1),
                       (y2 - ax2).lc)

    def assert_in_group(self):
        """enforce_in_group (lib.rs:100): postulate q = self/4 on the
        curve, then enforce self == 2*(2*q) — cofactor-4 membership."""
        inv4 = pow(4, -1, P.S)
        q = ed.mul(self.value, inv4)
        qx = CField.new(self.b, PRIVATE, q[0])
        qy = CField.new(self.b, PRIVATE, q[1])
        qg = CGroup(self.b, qx, qy)
        qg.assert_on_curve()
        dbl = qg.double()
        dbl.enforce_double(self)

    def is_constant(self) -> bool:
        return self.x.is_constant() and self.y.is_constant()

    def _is_constant_zero(self) -> bool:
        return (self.is_constant() and self.x.lc.constant == 0
                and self.y.lc.constant == 1)

    def __add__(self, o: "CGroup"):
        """Complete twisted Edwards addition (group/src/add.rs:28):
        6 constraints variable+variable, 3 with a constant operand.
        With a = -1: U = (x1 + y1)(x2 + y2), v0 = x1*y2, v1 = x2*y1,
        v2 = d*v0*v1; x3*(v2+1) = v0+v1; y3*(1-v2) = U - v0 - v1."""
        # constant-zero shortcuts (add.rs:38-44)
        if self._is_constant_zero():
            return o
        if o._is_constant_zero():
            return self
        # both constant: witnesses allocate in Constant mode and every
        # constraint row is all-constant (dropped) — fold at console level
        if self.is_constant() and o.is_constant():
            return CGroup.constant(self.b, ed.add(self.value, o.value))
        # the reference swap: make `that` the constant operand when
        # `other` is constant ("reduces the number of constants by one")
        if o.is_constant():
            this, that = self, o
        else:
            this, that = o, self
        a = R - 1  # EDWARDS_A = -1
        # U = (-a*x1 + y1) * (x2 + y2) = (x1 + y1)(x2 + y2) for a = -1
        u1 = CField(self.b, this.x.lc.scale((R - a) % R).add(this.y.lc))
        u2 = that.x + that.y
        u = u1 * u2
        v0 = this.x * that.y
        v1 = that.x * this.y
        v2 = (v0 * v1).scale_const(P.EDWARDS_D)
        pt3 = ed.add(this.value, that.value)
        x3 = CField.new(self.b, PRIVATE, pt3[0])
        y3 = CField.new(self.b, PRIVATE, pt3[1])
        # x3 * (v2 + 1) = v0 + v1
        self.b.enforce(x3.lc, v2.lc.add(LinearCombination(1)),
                       v0.lc.add(v1.lc))
        # y3 * (1 - v2) = U + a*v0 - v1
        one_minus_v2 = LinearCombination(1).add(v2.lc, R - 1)
        rhs = u.lc.add(v0.lc.scale(a)).add(v1.lc, R - 1)
        self.b.enforce(y3.lc, one_minus_v2, rhs)
        return CGroup(self.b, x3, y3)

    def mul_bits_be(self, bits_be):
        """Scalar mul by big-endian CBool bits — the reference ladder
        (group/src/mul.rs:167): output doubles, conditional add."""
        output = CGroup.constant(self.b, ed.IDENTITY_AFFINE)
        for bit in bits_be:
            output = output.double()
            output = (self + output).ternary(bit, output)
        return output

    def mul_bits(self, bits):
        """Scalar mul by little-endian CBool bits."""
        return self.mul_bits_be(list(reversed(list(bits))))

    # -- remaining group ops (circuit/types/group/src) --
    def neg(self):
        """Twisted-Edwards negation: (x, y) -> (-x, y)."""
        return CGroup(self.b, -self.x, self.y)

    def __sub__(self, o: "CGroup"):
        return self + o.neg()

    def mul_scalar(self, scalar: "CScalar"):
        return self.mul_bits_be(scalar.to_bits_be())

    def is_equal(self, o: "CGroup") -> "CBool":
        return self.x.is_equal(o.x) & self.y.is_equal(o.y)

    def ternary(self, cond: "CBool", other: "CGroup") -> "CGroup":
        return CGroup(self.b, self.x.ternary(cond, other.x),
                      self.y.ternary(cond, other.y))

    def assert_eq(self, o: "CGroup"):
        self.b.assert_eq(self.x.lc, o.x.lc)
        self.b.assert_eq(self.y.lc, o.y.lc)


class CScalar:
    """Scalar-field gadget (circuit/types/scalar/src/lib.rs:52):
    field-backed — one base-field member plus a lazily-derived,
    range-checked 251-bit decomposition (OnceCell analog). Equality and
    ternary ride the field representation (1-2 constraints, not
    per-bit); the bits cost ~503 constraints exactly once, on first
    use."""

    __slots__ = ("b", "field", "_bits")
    NUM_BITS = 251
    DATA_BITS = 250

    def __init__(self, builder, field: CField, bits=None):
        self.b = builder
        self.field = field
        self._bits = bits

    @classmethod
    def new(cls, builder, mode, value: int):
        v = value % P.S
        return cls(builder, CField.new(builder, mode, v))

    @classmethod
    def constant(cls, builder, value: int):
        return cls(builder, CField.constant(builder, value % P.S))

    @classmethod
    def from_bits_le(cls, builder, bits_le):
        """scalar/src/helpers/from_bits.rs:24 — <=250 bits: pad with
        constant false, no range check (value < 2^250 < S); 251 bits:
        range-check against S-1; >251: assert the excess zero first.
        The field member is the bits' linear combination; the bits are
        cached so a later to_bits_le is free."""
        bits_le = list(bits_le)
        n = len(bits_le)
        if n > cls.NUM_BITS:
            for bt in bits_le[cls.NUM_BITS:]:
                builder.assert_eq(bt.lc, LinearCombination(0))
            bits_le = bits_le[:cls.NUM_BITS]
            n = cls.NUM_BITS
        ranged = n > cls.DATA_BITS
        while len(bits_le) < cls.NUM_BITS:
            bits_le.append(CBool.constant(builder, False))
        acc = LinearCombination(0)
        coeff = 1
        for bt in bits_le:
            acc = acc.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        if ranged:
            _assert_bits_lte_const(builder, bits_le, P.S - 1)
        return cls(builder, CField(builder, acc), bits_le)

    @classmethod
    def from_field_lossy(cls, builder, field: CField):
        """scalar/src/helpers/from_field.rs (lossy): canonical field
        bits, truncated to 250 data bits."""
        bits = field.to_bits_le()
        return cls.from_bits_le(builder, bits[:cls.DATA_BITS])

    @classmethod
    def from_field(cls, builder, field: CField):
        """scalar/src/helpers/from_field.rs:28 (checked): no
        truncation — fails for field values >= S via the 251-bit
        range check + zero asserts on the upper bits."""
        bits = field.to_bits_le()
        return cls.from_bits_le(builder, bits)

    @property
    def value(self) -> int:
        return self.field.value

    def is_constant(self) -> bool:
        return self.field.is_constant()

    def to_bits_le(self):
        """scalar/src/helpers/to_bits.rs: lazy 251-bit decomposition +
        uniqueness range check (bits <= S-1); cached."""
        if self._bits is None:
            bits = self.field.to_bits_le(self.NUM_BITS, canonical=False)
            if not self.field.is_constant():
                _assert_bits_lte_const(self.b, bits, P.S - 1)
            self._bits = bits
        return self._bits

    def to_bits_be(self):
        return list(reversed(self.to_bits_le()))

    @property
    def bits(self):
        return self.to_bits_le()

    def to_field(self) -> CField:
        return self.field

    def __add__(self, o: "CScalar") -> "CScalar":
        """scalar/src/add.rs:43 — field-space sum, 252-bit lower
        decomposition, subtract S when sum >= S (selected by a full
        field compare), re-derive the canonical 251 bits."""
        if self.is_constant() and o.is_constant():
            return CScalar.constant(self.b, (self.value + o.value) % P.S)
        total = self.to_field() + o.to_field()
        bits_le = total.to_lower_bits_le(self.NUM_BITS + 1)
        acc = LinearCombination(0)
        coeff = 1
        for bt in bits_le:
            acc = acc.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        sum_f = CField(self.b, acc)
        modulus = CField.constant(self.b, P.S % R)
        wrapping = sum_f.ternary(sum_f.is_less_than(modulus),
                                 sum_f - modulus)
        out_bits = wrapping.to_lower_bits_le(self.NUM_BITS)
        return CScalar(self.b, wrapping, out_bits)

    def is_equal(self, o: "CScalar") -> CBool:
        """scalar/src/equal.rs: field-representation equality."""
        return self.to_field().is_equal(o.to_field())

    def is_less_than(self, o: "CScalar") -> CBool:
        """scalar/src/compare.rs:33 — parity of 2*(a - b) on the base
        field: odd iff a < b (valid since S <= (R-1)/2)."""
        if self.is_constant() and o.is_constant():
            return CBool.constant(self.b, self.value < o.value)
        outcome = CField(self.b, (self.to_field() - o.to_field()).lc.scale(2))
        return outcome.to_bits_le()[0]

    def lt(self, o):
        return self.is_less_than(o)

    def gt(self, o):
        return o.is_less_than(self)

    def lte(self, o):
        return ~o.is_less_than(self)

    def gte(self, o):
        return ~self.is_less_than(o)

    def ternary(self, cond: CBool, other: "CScalar") -> "CScalar":
        """scalar/src/ternary.rs: ternary over the field member."""
        return CScalar(self.b, self.field.ternary(cond, other.field))


class CAddress:
    """Address gadget (circuit/types/address): a subgroup Edwards point;
    equality/ternary/compare delegate to the group/x-coordinate."""

    __slots__ = ("b", "group")

    def __init__(self, builder, group: CGroup):
        self.b = builder
        self.group = group

    @classmethod
    def new(cls, builder, mode, pt):
        return cls(builder, CGroup.new(builder, mode, pt))

    @property
    def value(self):
        return self.group.value

    def to_field(self) -> CField:
        return self.group.x

    def is_equal(self, o: "CAddress") -> CBool:
        return self.group.is_equal(o.group)

    def ternary(self, cond: CBool, other: "CAddress") -> "CAddress":
        return CAddress(self.b, self.group.ternary(cond, other.group))

    def is_less_than(self, o: "CAddress") -> CBool:
        return self.group.x.is_less_than(o.group.x)

    def lt(self, o):
        return self.is_less_than(o)

    def gt(self, o):
        return o.is_less_than(self)

    def lte(self, o):
        return ~o.is_less_than(self)

    def gte(self, o):
        return ~self.is_less_than(o)


class CStruct:
    """Struct plaintext gadget (circuit/program data/plaintext Struct
    arm): ordered members, each a literal (or nested struct) gadget.
    Bit/field packing flows through response_gadget._plaintext_bit_stream,
    which mirrors console Plaintext.to_bits_le exactly."""

    __slots__ = ("b", "members", "plaintext")

    def __init__(self, builder, members, plaintext):
        """members: [(Identifier, type_name, gadget)] in declaration
        order; plaintext: the console Plaintext("struct", ...)."""
        self.b = builder
        self.members = members
        self.plaintext = plaintext


class CString:
    """String gadget (circuit/types/string): a byte vector of U8 gadgets
    (lib.rs:46-66). Equality over same-length strings is the AND of byte
    equalities; different lengths are constantly unequal."""

    __slots__ = ("b", "bytes_g", "value")

    def __init__(self, builder, bytes_g, value: str):
        self.b = builder
        self.bytes_g = bytes_g
        self.value = value

    @classmethod
    def new(cls, builder, mode, s: str):
        bg = [CInteger.new(builder, mode, byte, 8) for byte in s.encode()]
        return cls(builder, bg, s)

    def to_bits_le(self):
        out = []
        for byte in self.bytes_g:
            out += list(byte.bits)
        return out

    def is_equal(self, o: "CString") -> CBool:
        if len(self.bytes_g) != len(o.bytes_g):
            return CBool.constant(self.b, False)
        if not self.bytes_g:
            return CBool.constant(self.b, True)
        acc = None
        for a, b2 in zip(self.bytes_g, o.bytes_g):
            e = a.is_equal(b2)
            acc = e if acc is None else (acc & e)
        return acc
