"""Host-side (Python-int) prime fields and extension towers.

This is the "console" numeric path: exact, scalar, CPU. It mirrors the
semantics of the reference's `fields/` crate (Fp256/Fp384 + Fp2/Fp6/Fp12
towers — see SURVEY.md §2.1) but is representation-free: values are
canonical integers mod p, not Montgomery limbs. The batched TPU path in
`snarkvm_tpu.fields.limb` is cross-checked against this module.

Reference parity targets: fields/src/{fp_256.rs,fp_384.rs,fp2.rs,
fp6_3over2.rs,fp12_2over3over2.rs} behavior (not code).
"""
from __future__ import annotations

from ..params import bls12_377 as P


class PrimeField:
    """A canonical-form prime field element. Subclasses set MODULUS."""

    __slots__ = ("v",)
    MODULUS: int = 0
    GENERATOR: int = 0          # multiplicative generator (for FFT fields)
    TWO_ADICITY: int = 0
    TWO_ADIC_ROOT_OF_UNITY: int = 0

    def __init__(self, v: int = 0):
        self.v = v % self.MODULUS

    # -- constructors --
    @classmethod
    def zero(cls):
        return cls(0)

    @classmethod
    def one(cls):
        return cls(1)

    @classmethod
    def from_bytes_le(cls, b: bytes):
        return cls(int.from_bytes(b, "little"))

    # -- arithmetic --
    def __add__(self, o):
        return type(self)(self.v + o.v)

    def __sub__(self, o):
        return type(self)(self.v - o.v)

    def __mul__(self, o):
        return type(self)(self.v * o.v)

    def __neg__(self):
        return type(self)(-self.v)

    def double(self):
        return type(self)(self.v << 1)

    def square(self):
        return type(self)(self.v * self.v)

    def pow(self, e: int):
        return type(self)(pow(self.v, e, self.MODULUS))

    def inverse(self):
        if self.v == 0:
            raise ZeroDivisionError("field inverse of zero")
        return type(self)(pow(self.v, -1, self.MODULUS))

    def __truediv__(self, o):
        return self * o.inverse()

    def legendre(self) -> int:
        """0 if zero, 1 if QR, -1 if non-QR."""
        if self.v == 0:
            return 0
        s = pow(self.v, (self.MODULUS - 1) >> 1, self.MODULUS)
        return 1 if s == 1 else -1

    def sqrt(self):
        """Tonelli–Shanks square root; returns None if non-residue.

        Mirrors fields/src/traits/square_root_field.rs behavior: of the two
        roots, returns the one the reference would (caller normalizes parity
        as needed).
        """
        p = self.MODULUS
        if self.v == 0:
            return type(self)(0)
        if self.legendre() == -1:
            return None
        # p-1 = 2^s * t with t odd
        s = self.TWO_ADICITY
        t = (p - 1) >> s
        z = pow(self.GENERATOR, t, p)  # 2^s-th root of unity generator
        m, c, u, r = s, z, pow(self.v, t, p), pow(self.v, (t + 1) >> 1, p)
        while u != 1:
            # find least i with u^(2^i) == 1
            i, u2 = 0, u
            while u2 != 1:
                u2 = u2 * u2 % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            u = u * c % p
            r = r * b % p
        return type(self)(r)

    # -- bits/bytes --
    def to_bytes_le(self) -> bytes:
        return self.v.to_bytes((self.MODULUS.bit_length() + 7) // 8, "little")

    def is_zero(self) -> bool:
        return self.v == 0

    def is_one(self) -> bool:
        return self.v == 1

    # -- comparisons / misc --
    def __eq__(self, o):
        return type(self) is type(o) and self.v == o.v

    def __hash__(self):
        return hash((type(self).__name__, self.v))

    def __repr__(self):
        return f"{type(self).__name__}({self.v})"


class Fq(PrimeField):
    """BLS12-377 base field (377-bit). Ref: fields/src/fp_384.rs + curves/src/bls12_377/fq.rs."""

    MODULUS = P.Q
    GENERATOR = P.FQ_GENERATOR
    TWO_ADICITY = P.FQ_TWO_ADICITY
    TWO_ADIC_ROOT_OF_UNITY = P.FQ_TWO_ADIC_ROOT_OF_UNITY


class Fr(PrimeField):
    """BLS12-377 scalar field / Edwards-BLS12 base field (253-bit).

    This is the Aleo console `Field` type's field. Ref: curves/src/bls12_377/fr.rs.
    """

    MODULUS = P.R
    GENERATOR = P.FR_GENERATOR
    TWO_ADICITY = P.FR_TWO_ADICITY
    TWO_ADIC_ROOT_OF_UNITY = P.FR_TWO_ADIC_ROOT_OF_UNITY


class Scalar(PrimeField):
    """Edwards-BLS12 scalar field (console `Scalar` type's field).

    Ref: curves/src/edwards_bls12/fr.rs (modulus from curve docs 01_edwards_bls12.md).
    """

    MODULUS = P.S
    GENERATOR = 2  # not used for FFT; 2 generates (verified in tests only if needed)
    TWO_ADICITY = 1


# ---------------------------------------------------------------------------
# Extension towers over Fq (for pairings).
# Fq2 = Fq[u]/(u^2 + 5); Fq6 = Fq2[v]/(v^3 - u); Fq12 = Fq6[w]/(w^2 - v).
# Ref: curves/src/bls12_377/{fq2.rs,fq6.rs,fq12.rs} parameters.
# ---------------------------------------------------------------------------

_QNR = P.FQ2_NONRESIDUE  # -5 mod q


def _fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    q = P.Q
    t0 = a0 * b0 % q
    t1 = a1 * b1 % q
    # (a0*b1 + a1*b0)
    c1 = ((a0 + a1) * (b0 + b1) - t0 - t1) % q
    c0 = (t0 + t1 * _QNR) % q
    return (c0, c1)


def _fq2_sq(a):
    return _fq2_mul(a, a)


def _fq2_add(a, b):
    q = P.Q
    return ((a[0] + b[0]) % q, (a[1] + b[1]) % q)


def _fq2_sub(a, b):
    q = P.Q
    return ((a[0] - b[0]) % q, (a[1] - b[1]) % q)


def _fq2_neg(a):
    q = P.Q
    return ((-a[0]) % q, (-a[1]) % q)


def _fq2_inv(a):
    a0, a1 = a
    q = P.Q
    # norm = a0^2 - NR*a1^2
    norm = (a0 * a0 - _QNR * a1 * a1) % q
    ninv = pow(norm, -1, q)
    return (a0 * ninv % q, (-a1) * ninv % q)


def _fq2_pow(a, e: int):
    r = (1, 0)
    base = a
    while e > 0:
        if e & 1:
            r = _fq2_mul(r, base)
        base = _fq2_sq(base)
        e >>= 1
    return r


def _fq2_mul_fq(a, s: int):
    q = P.Q
    return (a[0] * s % q, a[1] * s % q)


class Fq2:
    """Quadratic extension. Stored as (c0, c1) raw ints: c0 + c1*u."""

    __slots__ = ("c",)

    def __init__(self, c0=0, c1=0):
        if isinstance(c0, tuple):
            self.c = (c0[0] % P.Q, c0[1] % P.Q)
        else:
            c0 = c0.v if isinstance(c0, Fq) else c0
            c1 = c1.v if isinstance(c1, Fq) else c1
            self.c = (c0 % P.Q, c1 % P.Q)

    @classmethod
    def zero(cls):
        return cls(0, 0)

    @classmethod
    def one(cls):
        return cls(1, 0)

    @property
    def c0(self):
        return Fq(self.c[0])

    @property
    def c1(self):
        return Fq(self.c[1])

    def __add__(self, o):
        return Fq2(_fq2_add(self.c, o.c))

    def __sub__(self, o):
        return Fq2(_fq2_sub(self.c, o.c))

    def __mul__(self, o):
        return Fq2(_fq2_mul(self.c, o.c))

    def __neg__(self):
        return Fq2(_fq2_neg(self.c))

    def square(self):
        return Fq2(_fq2_sq(self.c))

    def inverse(self):
        return Fq2(_fq2_inv(self.c))

    def pow(self, e: int):
        return Fq2(_fq2_pow(self.c, e))

    def conjugate(self):
        return Fq2((self.c[0], (-self.c[1]) % P.Q))

    def frobenius(self, power: int):
        if power % 2 == 0:
            return self
        return self.conjugate()

    def mul_fq(self, s):
        s = s.v if isinstance(s, Fq) else s
        return Fq2(_fq2_mul_fq(self.c, s))

    def norm(self) -> Fq:
        a0, a1 = self.c
        return Fq(a0 * a0 - _QNR * a1 * a1)

    def legendre(self) -> int:
        return self.norm().legendre()

    def sqrt(self):
        """Square root in Fq2 via the complex method (p ≡ 3 mod 4 style general alg)."""
        if self.c == (0, 0):
            return Fq2.zero()
        if self.legendre() == -1:
            return None
        a0, a1 = self.c
        q = P.Q
        if a1 == 0:
            r = Fq(a0).sqrt()
            if r is not None:
                return Fq2(r.v, 0)
            # sqrt(a0) = sqrt(a0/NR)*u since u^2 = NR
            r = (Fq(a0) / Fq(_QNR)).sqrt()
            return Fq2(0, r.v)
        # alpha = norm = a0^2 - NR*a1^2; sqrt_alpha
        alpha = Fq(a0 * a0 - _QNR * a1 * a1).sqrt()
        assert alpha is not None
        # delta = (a0 + alpha)/2
        inv2 = pow(2, -1, q)
        delta = (a0 + alpha.v) * inv2 % q
        x0 = Fq(delta).sqrt()
        if x0 is None:
            delta = (a0 - alpha.v) * inv2 % q
            x0 = Fq(delta).sqrt()
            assert x0 is not None
        x1 = a1 * inv2 % q * pow(x0.v, -1, q) % q
        res = Fq2(x0.v, x1)
        assert res.square() == self
        return res

    def is_zero(self):
        return self.c == (0, 0)

    def __eq__(self, o):
        return isinstance(o, Fq2) and self.c == o.c

    def __hash__(self):
        return hash(("Fq2", self.c))

    def __repr__(self):
        return f"Fq2({self.c[0]}, {self.c[1]})"


# Frobenius coefficients, recomputed from first principles:
#   FROB_FQ2_C1[i] = NR^((q^i - 1)/2)             (i in 0..2)
#   FROB_FQ6_C1[i] = u^((q^i - 1)/3)  in Fq2      (i in 0..6)
#   FROB_FQ6_C2[i] = u^(2(q^i - 1)/3) in Fq2
#   FROB_FQ12_C1[i] = u^((q^i - 1)/6) in Fq2      (i in 0..12)
_U = (0, 1)  # u in Fq2


def _frob_coeffs():
    q = P.Q
    f2 = [pow(_QNR, (pow(q, i) - 1) // 2, q) for i in range(2)]
    f6c1 = [_fq2_pow(_U, (pow(q, i) - 1) // 3) for i in range(6)]
    f6c2 = [_fq2_pow(_U, 2 * (pow(q, i) - 1) // 3) for i in range(6)]
    f12 = [_fq2_pow(_U, (pow(q, i) - 1) // 6) for i in range(12)]
    return f2, f6c1, f6c2, f12


FROB_FQ2_C1, FROB_FQ6_C1, FROB_FQ6_C2, FROB_FQ12_C1 = _frob_coeffs()


def _fq6_mul_by_nonresidue(a):
    """Multiply (c0,c1) coefficients-of-v element... actually multiplies an
    Fq2 element by v^3 = u (used when reducing v^3)."""
    # a * u where a=(a0,a1): (a0 + a1 u) u = a1*NR + a0 u
    q = P.Q
    return (a[1] * _QNR % q, a[0])


class Fq6:
    """Cubic extension over Fq2: c0 + c1*v + c2*v^2 with v^3 = u."""

    __slots__ = ("c",)

    def __init__(self, c0=None, c1=None, c2=None):
        if isinstance(c0, tuple) and c1 is None:
            self.c = c0  # ((,),(,),(,))
        else:
            z = (0, 0)
            f = lambda x: x.c if isinstance(x, Fq2) else (x if x is not None else z)
            self.c = (f(c0), f(c1), f(c2))

    @classmethod
    def zero(cls):
        return cls(((0, 0), (0, 0), (0, 0)))

    @classmethod
    def one(cls):
        return cls(((1, 0), (0, 0), (0, 0)))

    @property
    def c0(self):
        return Fq2(self.c[0])

    @property
    def c1(self):
        return Fq2(self.c[1])

    @property
    def c2(self):
        return Fq2(self.c[2])

    def __add__(self, o):
        return Fq6(tuple(_fq2_add(a, b) for a, b in zip(self.c, o.c)))

    def __sub__(self, o):
        return Fq6(tuple(_fq2_sub(a, b) for a, b in zip(self.c, o.c)))

    def __neg__(self):
        return Fq6(tuple(_fq2_neg(a) for a in self.c))

    def __mul__(self, o):
        a0, a1, a2 = self.c
        b0, b1, b2 = o.c
        # Toom/Karatsuba-lite (CH-SQR3 style): standard schoolbook with NR reduction
        v0 = _fq2_mul(a0, b0)
        v1 = _fq2_mul(a1, b1)
        v2 = _fq2_mul(a2, b2)
        # c0 = v0 + NR*(a1*b2 + a2*b1)
        t = _fq2_add(_fq2_mul(a1, b2), _fq2_mul(a2, b1))
        c0 = _fq2_add(v0, _fq6_mul_by_nonresidue(t))
        # c1 = a0*b1 + a1*b0 + NR*(a2*b2)
        t = _fq2_add(_fq2_mul(a0, b1), _fq2_mul(a1, b0))
        c1 = _fq2_add(t, _fq6_mul_by_nonresidue(v2))
        # c2 = a0*b2 + a2*b0 + a1*b1
        t = _fq2_add(_fq2_mul(a0, b2), _fq2_mul(a2, b0))
        c2 = _fq2_add(t, v1)
        return Fq6((c0, c1, c2))

    def square(self):
        return self * self

    def mul_by_fq2(self, s: "Fq2"):
        return Fq6(tuple(_fq2_mul(a, s.c) for a in self.c))

    def mul_by_v(self):
        """Multiply by v: (c0,c1,c2) -> (NR*c2, c0, c1) with NR = u."""
        a0, a1, a2 = self.c
        return Fq6((_fq6_mul_by_nonresidue(a2), a0, a1))

    def inverse(self):
        a0, a1, a2 = self.c
        # Standard cubic-extension inversion
        t0 = _fq2_sq(a0)
        t1 = _fq2_sq(a1)
        t2 = _fq2_sq(a2)
        t3 = _fq2_mul(a0, a1)
        t4 = _fq2_mul(a0, a2)
        t5 = _fq2_mul(a1, a2)
        # c0 = a0^2 - NR*(a1*a2)
        c0 = _fq2_sub(t0, _fq6_mul_by_nonresidue(t5))
        # c1 = NR*a2^2 - a0*a1
        c1 = _fq2_sub(_fq6_mul_by_nonresidue(t2), t3)
        # c2 = a1^2 - a0*a2
        c2 = _fq2_sub(t1, t4)
        # norm = a0*c0 + NR*(a2*c1 + a1*c2)
        t = _fq2_add(_fq2_mul(a2, c1), _fq2_mul(a1, c2))
        norm = _fq2_add(_fq2_mul(a0, c0), _fq6_mul_by_nonresidue(t))
        ninv = _fq2_inv(norm)
        return Fq6((_fq2_mul(c0, ninv), _fq2_mul(c1, ninv), _fq2_mul(c2, ninv)))

    def frobenius(self, power: int):
        a0, a1, a2 = self.c
        p = power % 6
        f = lambda a: a if power % 2 == 0 else (a[0], (-a[1]) % P.Q)
        a0, a1, a2 = f(a0), f(a1), f(a2)
        a1 = _fq2_mul(a1, FROB_FQ6_C1[p])
        a2 = _fq2_mul(a2, FROB_FQ6_C2[p])
        return Fq6((a0, a1, a2))

    def is_zero(self):
        return all(x == (0, 0) for x in self.c)

    def __eq__(self, o):
        return isinstance(o, Fq6) and self.c == o.c

    def __repr__(self):
        return f"Fq6{self.c}"


class Fq12:
    """Quadratic extension over Fq6: c0 + c1*w with w^2 = v."""

    __slots__ = ("a", "b")

    def __init__(self, a: Fq6 = None, b: Fq6 = None):
        self.a = a if a is not None else Fq6.zero()
        self.b = b if b is not None else Fq6.zero()

    @classmethod
    def one(cls):
        return cls(Fq6.one(), Fq6.zero())

    @classmethod
    def zero(cls):
        return cls(Fq6.zero(), Fq6.zero())

    def __add__(self, o):
        return Fq12(self.a + o.a, self.b + o.b)

    def __sub__(self, o):
        return Fq12(self.a - o.a, self.b - o.b)

    def __neg__(self):
        return Fq12(-self.a, -self.b)

    def __mul__(self, o):
        v0 = self.a * o.a
        v1 = self.b * o.b
        c1 = (self.a + self.b) * (o.a + o.b) - v0 - v1
        c0 = v0 + v1.mul_by_v()
        return Fq12(c0, c1)

    def square(self):
        # complex squaring
        v0 = self.a * self.b
        t = self.a + self.b.mul_by_v()
        c0 = t * (self.a + self.b) - v0 - v0.mul_by_v()
        return Fq12(c0, v0 + v0)

    def inverse(self):
        # (a + bw)^-1 = (a - bw)/(a^2 - v b^2)
        t = (self.a * self.a) - (self.b * self.b).mul_by_v()
        tinv = t.inverse()
        return Fq12(self.a * tinv, -(self.b * tinv))

    def conjugate(self):
        """a - b*w; for elements in the cyclotomic subgroup this is inverse."""
        return Fq12(self.a, -self.b)

    def pow(self, e: int):
        r = Fq12.one()
        base = self
        while e > 0:
            if e & 1:
                r = r * base
            base = base.square()
            e >>= 1
        return r

    def frobenius(self, power: int):
        p = power % 12
        a = self.a.frobenius(power)
        b = self.b.frobenius(power)
        coeff = FROB_FQ12_C1[p]
        b = Fq6(tuple(_fq2_mul(x, coeff) for x in b.c))
        return Fq12(a, b)

    def is_one(self):
        return self.a == Fq6.one() and self.b.is_zero()

    def __eq__(self, o):
        return isinstance(o, Fq12) and self.a == o.a and self.b == o.b

    def __repr__(self):
        return f"Fq12({self.a}, {self.b})"
