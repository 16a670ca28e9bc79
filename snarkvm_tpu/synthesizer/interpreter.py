"""Console semantics for the 68-opcode instruction set.

Mirrors synthesizer/program/src/logic/instruction/operation/* evaluate()
paths over console literals: checked ops halt (HaltError) exactly where
the reference's E::halt fires (environment/src/traits/types.rs checked_*
semantics), wrapped ops wrap, casts follow cast/cast_lossy rules.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from ..console.types import (
    Literal, Plaintext, Identifier, INT_WIDTHS, int_to_bits_le, bits_to_int_le,
    _group_from_x,
)

R = P.R
S = P.S


class HaltError(Exception):
    """VM halt (E::halt) — the transaction/case aborts."""


def _int_bounds(t):
    w = INT_WIDTHS[t]
    if t[0] == "i":
        return -(1 << (w - 1)), (1 << (w - 1)) - 1
    return 0, (1 << w) - 1


def _check(t, v):
    lo, hi = _int_bounds(t)
    if not (lo <= v <= hi):
        raise HaltError(f"integer overflow in {t}: {v}")
    return Literal(t, v)


def _wrap(t, v):
    w = INT_WIDTHS[t]
    v &= (1 << w) - 1
    if t[0] == "i" and (v >> (w - 1)) & 1:
        v -= 1 << w
    return Literal(t, v)


def _is_int(lit):
    return lit.type_name in INT_WIDTHS


def _group(lit):
    return lit.value if isinstance(lit.value, tuple) else _group_from_x(lit.value)


# ---------------------------------------------------------------------------
# binary/unary arithmetic
# ---------------------------------------------------------------------------

def op_add(a: Literal, b: Literal) -> Literal:
    t = a.type_name
    if t == "field":
        return Literal(t, (a.value + b.value) % R)
    if t == "scalar":
        return Literal(t, (a.value + b.value) % S)
    if t == "group":
        return Literal(t, ed.add(_group(a), _group(b)))
    if _is_int(a):
        return _check(t, a.value + b.value)
    raise HaltError(f"add unsupported for {t}")


def op_add_wrapped(a, b):
    return _wrap(a.type_name, a.value + b.value)


def op_sub(a, b):
    t = a.type_name
    if t == "field":
        return Literal(t, (a.value - b.value) % R)
    if t == "group":
        return Literal(t, ed.add(_group(a), ed.affine_neg(_group(b))))
    if _is_int(a):
        return _check(t, a.value - b.value)
    raise HaltError(f"sub unsupported for {t}")


def op_sub_wrapped(a, b):
    return _wrap(a.type_name, a.value - b.value)


def op_mul(a, b):
    ta, tb = a.type_name, b.type_name
    if ta == "field" and tb == "field":
        return Literal("field", a.value * b.value % R)
    if ta == "group" and tb == "scalar":
        return Literal("group", ed.mul(_group(a), b.value % S))
    if ta == "scalar" and tb == "group":
        return Literal("group", ed.mul(_group(b), a.value % S))
    if _is_int(a) and ta == tb:
        return _check(ta, a.value * b.value)
    raise HaltError(f"mul unsupported for {ta},{tb}")


def op_mul_wrapped(a, b):
    return _wrap(a.type_name, a.value * b.value)


def op_div(a, b):
    t = a.type_name
    if t == "field":
        if b.value % R == 0:
            raise HaltError("field division by zero")
        return Literal(t, a.value * pow(b.value, -1, R) % R)
    if _is_int(a):
        if b.value == 0:
            raise HaltError("integer division by zero")
        q = abs(a.value) // abs(b.value)
        if (a.value < 0) != (b.value < 0):
            q = -q
        return _check(t, q)
    raise HaltError(f"div unsupported for {t}")


def op_div_wrapped(a, b):
    if b.value == 0:
        raise HaltError("integer division by zero")
    q = abs(a.value) // abs(b.value)
    if (a.value < 0) != (b.value < 0):
        q = -q
    return _wrap(a.type_name, q)


def op_rem(a, b):
    if b.value == 0:
        raise HaltError("rem by zero")
    r = abs(a.value) % abs(b.value)
    if a.value < 0:
        r = -r
    return _check(a.type_name, r)


def op_rem_wrapped(a, b):
    if b.value == 0:
        raise HaltError("rem by zero")
    r = abs(a.value) % abs(b.value)
    if a.value < 0:
        r = -r
    return _wrap(a.type_name, r)


def op_modulo(a, b):
    t = a.type_name
    if t[0] != "u":
        raise HaltError("modulo only for unsigned")
    if b.value == 0:
        raise HaltError("modulo by zero")
    return Literal(t, a.value % b.value)


def op_neg(a):
    t = a.type_name
    if t == "field":
        return Literal(t, (-a.value) % R)
    if t == "group":
        return Literal(t, ed.affine_neg(_group(a)))
    if _is_int(a) and t[0] == "i":
        return _check(t, -a.value)
    raise HaltError(f"neg unsupported for {t}")


def op_abs(a):
    return _check(a.type_name, abs(a.value))


def op_abs_wrapped(a):
    return _wrap(a.type_name, abs(a.value))


def op_double(a):
    t = a.type_name
    if t == "field":
        return Literal(t, 2 * a.value % R)
    if t == "group":
        pt = _group(a)
        return Literal(t, ed.add(pt, pt))
    raise HaltError(f"double unsupported for {t}")


def op_square(a):
    assert a.type_name == "field"
    return Literal("field", a.value * a.value % R)


def op_sqrt(a):
    from ..fields.scalar import Fr
    assert a.type_name == "field"
    s = Fr(a.value).sqrt()
    if s is None:
        raise HaltError("field is not a square")
    # console SquareRoot returns the bitwise-LESSER of the two roots
    # (console/types/field/src/arithmetic.rs:243: sqrt <= -sqrt)
    v = s.v
    return Literal("field", min(v, (R - v) % R))


def op_inv(a):
    assert a.type_name == "field"
    if a.value % R == 0:
        raise HaltError("inverse of zero")
    return Literal("field", pow(a.value, -1, R))


def _checked_pow(t, base, exp):
    """Rust checked_pow: square-and-multiply, None on any intermediate overflow."""
    lo, hi = _int_bounds(t)

    def cm(x, y):
        v = x * y
        if not (lo <= v <= hi):
            raise HaltError("pow overflow")
        return v

    acc = 1
    while exp > 1:
        if exp & 1:
            acc = cm(acc, base)
        exp >>= 1
        base = cm(base, base)
    if exp == 1:
        acc = cm(acc, base)
    return acc


def _wrapping_pow(t, base, exp):
    w = INT_WIDTHS[t]
    mask = (1 << w) - 1

    def wm(x, y):
        v = (x * y) & mask
        if t[0] == "i" and (v >> (w - 1)) & 1:
            v -= 1 << w
        return v

    acc = 1
    while exp > 1:
        if exp & 1:
            acc = wm(acc, base)
        exp >>= 1
        base = wm(base, base)
    if exp == 1:
        acc = wm(acc, base)
    return acc


def op_pow(a, b):
    t = a.type_name
    if t == "field":
        return Literal(t, pow(a.value, b.value % R, R))
    if _is_int(a):
        return Literal(t, _checked_pow(t, a.value, b.value))
    raise HaltError(f"pow unsupported for {t}")


def op_pow_wrapped(a, b):
    return Literal(a.type_name, _wrapping_pow(a.type_name, a.value, b.value))


def op_shl(a, b):
    t = a.type_name
    v = b.value
    # checked_shl = checked_mul(a, 2^v) (types.rs:415)
    w = INT_WIDTHS[t]
    if v >= w:
        raise HaltError("shift exceeds width")
    return _check(t, a.value * (1 << v))


def op_shl_wrapped(a, b):
    w = INT_WIDTHS[a.type_name]
    return _wrap(a.type_name, a.value << (b.value % w))


def op_shr(a, b):
    t = a.type_name
    w = INT_WIDTHS[t]
    if b.value >= w:
        raise HaltError("shift exceeds width")
    return Literal(t, a.value >> b.value)


def op_shr_wrapped(a, b):
    w = INT_WIDTHS[a.type_name]
    return Literal(a.type_name, a.value >> (b.value % w))


# ---------------------------------------------------------------------------
# bitwise / logical
# ---------------------------------------------------------------------------

def _bitwise(a, b, fn):
    t = a.type_name
    if t == "boolean":
        return Literal(t, bool(fn(int(a.value), int(b.value))))
    w = INT_WIDTHS[t]
    mask = (1 << w) - 1
    res = fn(a.value & mask, b.value & mask) & mask
    return _wrap(t, res)


def op_and(a, b):
    return _bitwise(a, b, lambda x, y: x & y)


def op_or(a, b):
    return _bitwise(a, b, lambda x, y: x | y)


def op_xor(a, b):
    return _bitwise(a, b, lambda x, y: x ^ y)


def op_nand(a, b):
    assert a.type_name == "boolean"
    return Literal("boolean", not (a.value and b.value))


def op_nor(a, b):
    assert a.type_name == "boolean"
    return Literal("boolean", not (a.value or b.value))


def op_not(a):
    t = a.type_name
    if t == "boolean":
        return Literal(t, not a.value)
    w = INT_WIDTHS[t]
    return _wrap(t, ~a.value)


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

def _cmp_vals(a, b):
    t = a.type_name
    if t in ("field", "scalar"):
        return a.value % (R if t == "field" else S), b.value % (R if t == "field" else S)
    return a.value, b.value


def op_lt(a, b):
    x, y = _cmp_vals(a, b)
    return Literal("boolean", x < y)


def op_lte(a, b):
    x, y = _cmp_vals(a, b)
    return Literal("boolean", x <= y)


def op_gt(a, b):
    x, y = _cmp_vals(a, b)
    return Literal("boolean", x > y)


def op_gte(a, b):
    x, y = _cmp_vals(a, b)
    return Literal("boolean", x >= y)


def op_ternary(cond, a, b):
    assert cond.type_name == "boolean"
    return a if cond.value else b


# ---------------------------------------------------------------------------
# casts (cast / cast.lossy over literals)
# ---------------------------------------------------------------------------

def cast_literal(lit: Literal, target: str, lossy: bool) -> Literal:
    t = lit.type_name
    if target in ("group.x", "group.y"):
        assert t in ("group", "address")
        pt = _group(lit)
        return Literal("field", pt[0] if target.endswith("x") else pt[1])
    if target == t:
        return lit
    # source value as bits/integer
    if t in ("group", "address") and target not in ("group", "address"):
        # group -> X via the x-coordinate field (cast_lossy/group.rs)
        return cast_literal(Literal("field", _group(lit)[0]), target, lossy)
    if t == "group" and target == "field":
        return Literal("field", _group(lit)[0])
    if t == "address" and target == "field":
        return Literal("field", _group(lit)[0])
    if t == "group" and target == "address":
        return Literal("address", _group(lit))
    if t == "address" and target == "group":
        return Literal("group", _group(lit))
    if t == "boolean":
        v = 1 if lit.value else 0
        if target == "field":
            return Literal("field", v)
        if target == "scalar":
            return Literal("scalar", v)
        if target in INT_WIDTHS:
            return Literal(target, v)
    if t in INT_WIDTHS:
        v = lit.value
        uv = v & ((1 << INT_WIDTHS[t]) - 1)
        if target == "field":
            return Literal("field", uv % R)
        if target == "scalar":
            return Literal("scalar", uv % S)
        if target == "boolean":
            if lossy:
                return Literal("boolean", uv & 1 == 1)
            if uv in (0, 1):
                return Literal("boolean", uv == 1)
            raise HaltError("cannot cast int to boolean")
        if target in INT_WIDTHS:
            if lossy:
                w = INT_WIDTHS[target]
                return _wrap(target, uv & ((1 << w) - 1))
            return _check(target, v)
        if target in ("group", "address"):
            return Literal(target, _group_from_x(uv % R))
    if t == "field":
        v = lit.value % R
        if target in INT_WIDTHS:
            if lossy:
                w = INT_WIDTHS[target]
                return _wrap(target, v & ((1 << w) - 1))
            return _check(target, v)
        if target == "scalar":
            if lossy:
                return Literal("scalar", N.from_field_lossy_scalar(v))
            if v < S:
                return Literal("scalar", v)
            raise HaltError("field too large for scalar")
        if target == "boolean":
            if lossy:
                return Literal("boolean", v & 1 == 1)
            if v in (0, 1):
                return Literal("boolean", v == 1)
            raise HaltError("cannot cast field to boolean")
        if target in ("group", "address"):
            if lossy:
                # from_x; if 1 -> generator; else Elligator2 (cast_lossy/field.rs)
                try:
                    return Literal(target, _group_from_x(v))
                except ValueError:
                    if v == 1:
                        return Literal(target, ed.GENERATOR)
                    pt, _ = N.elligator2_encode(v)
                    return Literal(target, pt)
            try:
                return Literal(target, _group_from_x(v))
            except ValueError:
                raise HaltError("field is not a valid group x-coordinate")
    if t == "scalar":
        v = lit.value % S
        if target == "field":
            return Literal("field", v)
        if target in INT_WIDTHS:
            if lossy:
                return _wrap(target, v & ((1 << INT_WIDTHS[target]) - 1))
            return _check(target, v)
    raise HaltError(f"unsupported cast {t} -> {target}")


# ---------------------------------------------------------------------------
# hashes / commits over plaintexts
# ---------------------------------------------------------------------------

def _plaintext_of(v):
    if isinstance(v, Plaintext):
        return v
    if isinstance(v, Literal):
        return Plaintext("literal", v)
    raise HaltError("expected plaintext")


def hash_instruction(opcode: str, value, dest_type: str) -> Literal:
    pt = _plaintext_of(value)
    bits = pt.to_bits_le()
    kind = opcode.split(".", 1)[1]
    if kind.startswith("bhp"):
        group = N.commit_bhp_to_group(int(kind[3:]), [False] + bits, 0) if False else None
        group = _bhp_hash_group(int(kind[3:]), bits)
        out = Literal("group", group)
    elif kind.startswith("ped"):
        ped = N._pedersen(int(kind[3:]))
        out = Literal("group", ped.hash_uncompressed(bits))
    elif kind.startswith("psd"):
        rate = int(kind[3:])
        fields = pt.to_fields()
        if dest_type in ("address", "group"):
            return cast_literal(Literal("group", N.hash_to_group_psd(rate, fields)), dest_type, True)
        return cast_literal(Literal("field", N.hash_psd(rate, fields)), dest_type, True)
    elif kind.startswith("keccak"):
        digest_bits = N.hash_keccak(int(kind[6:]), bits)
        variant = 256 if kind == "keccak256" else 512
        out = Literal("group", _bhp_hash_group(variant, digest_bits))
    elif kind.startswith("sha3_"):
        digest_bits = N.hash_sha3(int(kind[5:]), bits)
        variant = 256 if kind == "sha3_256" else 512
        out = Literal("group", _bhp_hash_group(variant, digest_bits))
    else:
        raise HaltError(f"unknown hash {opcode}")
    return cast_literal(out, dest_type, True)


def _bhp_hash_group(variant: int, bits):
    return N._bhp(variant).hash_uncompressed(bits)


def commit_instruction(opcode: str, value, randomizer: Literal, dest_type: str) -> Literal:
    pt = _plaintext_of(value)
    bits = pt.to_bits_le()
    r = randomizer.value % S
    kind = opcode.split(".", 1)[1]
    if kind.startswith("bhp"):
        group = N.commit_bhp_to_group(int(kind[3:]), bits, r)
    else:
        group = N.commit_ped_to_group(int(kind[3:]), bits, r)
    if dest_type == "field":
        return Literal("field", group[0])
    if dest_type in ("group", "address"):
        return Literal(dest_type, group)
    raise HaltError(f"invalid commit destination {dest_type}")


def hash_many_instruction(opcode: str, value, num_outputs: int):
    rate = int(opcode.split("psd")[1])
    pt = _plaintext_of(value)
    return [Literal("field", f) for f in
            N.hash_many_psd(rate, pt.to_fields(), num_outputs)]


# ---------------------------------------------------------------------------
# plaintext equality (is.eq / assert.eq on whole plaintexts)
# ---------------------------------------------------------------------------

def plaintext_eq(a, b) -> bool:
    # futures compare structurally: same (program, function) and equal
    # argument lists (data/future equality; finalize asserts compare the
    # futures threaded through nested await trees)
    a_fut = getattr(a, "kind", None) == "future"
    b_fut = getattr(b, "kind", None) == "future"
    if a_fut or b_fut:
        if not (a_fut and b_fut):
            return False
        pa, fa, aa = a.value
        pb, fb, ab = b.value
        return (pa == pb and fa == fb and len(aa) == len(ab)
                and all(plaintext_eq(x, y) for x, y in zip(aa, ab)))
    return _plaintext_of(a).to_bits_le() == _plaintext_of(b).to_bits_le()
