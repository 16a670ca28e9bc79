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

    def to_bits_le(self, num_bits: int = 253, canonical: bool = False):
        """Bit decomposition with recomposition constraint. When
        `canonical` (the reference's Field::to_bits_le semantics,
        circuit/types/field/src/helpers/to_bits.rs), additionally asserts
        bits <= p-1 so the representation is unique — required whenever
        the bits feed comparisons or hashes."""
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
        if canonical and num_bits >= 253:
            _assert_bits_lte_const(self.b, bits, R - 1)
        return bits

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
        a_bits = self.to_bits_le(253, canonical=True)
        b_bits = o.to_bits_le(253, canonical=True)
        lt = CBool.constant(self.b, False)
        for this, that in zip(a_bits, b_bits):
            t_and = that & lt
            t_or = that | lt
            lt = _bool_select(self.b, this, t_and, t_or)
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

    @property
    def msb(self) -> CBool:
        return self.bits[-1]

    def add_checked(self, o: "CInteger") -> "CInteger":
        """Checked add (integers/src/add_checked.rs). Unsigned: the
        width+1-bit sum's carry must be 0. Signed: overflow iff the
        operands share a sign and the result's sign differs."""
        s = self.to_field() + o.to_field()
        bits = self._decompose(s, self.width + 1)
        out = CInteger(self.b, bits[: self.width], self.width, self.signed)
        if not self.signed:
            self.b.assert_eq(bits[-1].lc, LinearCombination(0))
        else:
            same_sign = ~(self.msb ^ o.msb)
            overflow = same_sign & (out.msb ^ self.msb)
            (~overflow).assert_true()
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
        """Checked sub (integers/src/sub_checked.rs). Unsigned: the borrow
        bit (top of a - b + 2^w) must be 1. Signed: overflow iff the
        operands' signs differ and the result's sign differs from self."""
        s = self.to_field() + CField.constant(self.b, 1 << self.width) - o.to_field()
        bits = self._decompose(s, self.width + 1)
        out = CInteger(self.b, bits[: self.width], self.width, self.signed)
        if not self.signed:
            self.b.assert_eq(bits[-1].lc, LinearCombination(1))
        else:
            diff_sign = self.msb ^ o.msb
            overflow = diff_sign & (out.msb ^ self.msb)
            (~overflow).assert_true()
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


def _assert_bits_lte_const(builder, bits, bound: int):
    """Assert the little-endian CBool `bits` encode a value <= `bound`
    (a Python int constant) — the reference's
    Boolean::assert_less_than_or_equal_constant. LSB->MSB fold with the
    constant folded in: lte starts True; at a const-1 bit lte |= ...;
    cost ~1 constraint/bit."""
    lte = CBool.constant(builder, True)
    for i, this in enumerate(bits):
        cbit = (bound >> i) & 1
        if cbit:
            # this=0 -> definitely <= so far; this=1 -> carry previous
            lte = ~this | lte
        else:
            # this=1 -> definitely > so far; this=0 -> carry previous
            lte = ~this & lte
    lte.assert_true()


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

    # -- remaining group ops (circuit/types/group/src) --
    def neg(self):
        """Twisted-Edwards negation: (x, y) -> (-x, y)."""
        return CGroup(self.b, -self.x, self.y)

    def __sub__(self, o: "CGroup"):
        return self + o.neg()

    def double(self):
        return self + self

    def mul_scalar(self, scalar: "CScalar"):
        return self.mul_bits(scalar.bits)

    def is_equal(self, o: "CGroup") -> "CBool":
        return self.x.is_equal(o.x) & self.y.is_equal(o.y)

    def ternary(self, cond: "CBool", other: "CGroup") -> "CGroup":
        return CGroup(self.b, self.x.ternary(cond, other.x),
                      self.y.ternary(cond, other.y))

    def assert_eq(self, o: "CGroup"):
        self.b.assert_eq(self.x.lc, o.x.lc)
        self.b.assert_eq(self.y.lc, o.y.lc)


class CScalar:
    """Scalar-field gadget (circuit/types/scalar): 251 little-endian
    bits over the base field, canonical (< S). Ops: add (mod S),
    compare, equal, ternary, to_field."""

    __slots__ = ("b", "bits")
    NUM_BITS = 251

    def __init__(self, builder, bits):
        self.b = builder
        self.bits = bits

    @classmethod
    def new(cls, builder, mode, value: int):
        v = value % P.S
        bits = [CBool.new(builder, mode, (v >> i) & 1)
                for i in range(cls.NUM_BITS)]
        out = cls(builder, bits)
        if mode != CONSTANT:
            _assert_bits_lte_const(builder, bits, P.S - 1)
        return out

    @classmethod
    def constant(cls, builder, value: int):
        return cls.new(builder, CONSTANT, value)

    @property
    def value(self) -> int:
        v = 0
        for i, bt in enumerate(self.bits):
            if bt.value:
                v |= 1 << i
        return v

    def to_field(self) -> CField:
        acc = LinearCombination(0)
        coeff = 1
        for bt in self.bits:
            acc = acc.add(bt.lc, coeff)
            coeff = coeff * 2 % R
        return CField(self.b, acc)

    def __add__(self, o: "CScalar") -> "CScalar":
        """Modular add (scalar/src/add.rs shape): witness out < S and a
        carry bit; enforce a + b = out + carry*S over the base field —
        binding since a, b < S implies a + b < 2S."""
        out_v = (self.value + o.value) % P.S
        carry_v = (self.value + o.value) >= P.S
        out = CScalar.new(self.b, PRIVATE, out_v)
        carry = CBool.new(self.b, PRIVATE, carry_v)
        lhs = self.to_field().lc.add(o.to_field().lc)
        rhs = out.to_field().lc.add(carry.lc, P.S % R)
        self.b.assert_eq(lhs, rhs)
        return out

    def is_equal(self, o: "CScalar") -> CBool:
        return self.to_field().is_equal(o.to_field())

    def is_less_than(self, o: "CScalar") -> CBool:
        lt = CBool.constant(self.b, False)
        for this, that in zip(self.bits, o.bits):
            t_and = that & lt
            t_or = that | lt
            lt = _bool_select(self.b, this, t_and, t_or)
        return lt

    def lt(self, o):
        return self.is_less_than(o)

    def gt(self, o):
        return o.is_less_than(self)

    def lte(self, o):
        return ~o.is_less_than(self)

    def gte(self, o):
        return ~self.is_less_than(o)

    def ternary(self, cond: CBool, other: "CScalar") -> "CScalar":
        return CScalar(self.b, [_bool_select(self.b, cond, a, c)
                                for a, c in zip(self.bits, other.bits)])


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
