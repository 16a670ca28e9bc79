"""Console typed literals and program data model (console/types + console/program/data).

Literal variants and bit encodings mirror the reference exactly:
  * Literal variant indices (literal/mod.rs:40) and per-type bit widths;
  * Plaintext bit layout (plaintext/to_bits.rs): 2 variant bits, then
    literal: [variant u8][size u16][payload], struct: [len u8] + per
    member [id-size u8][id bits][value-size u16][value bits];
  * to_fields packing (data/plaintext/to_fields.rs): bits chunked into
    252-bit field elements with a trailing 1 marker bit.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from . import network as N

R = P.R
S = P.S

FIELD_BITS = 253
FIELD_DATA_BITS = 252
SCALAR_BITS = 251

# Literal variant indices (console/program/src/data/literal/mod.rs:40)
VARIANTS = {
    "address": 0, "boolean": 1, "field": 2, "group": 3,
    "i8": 4, "i16": 5, "i32": 6, "i64": 7, "i128": 8,
    "u8": 9, "u16": 10, "u32": 11, "u64": 12, "u128": 13,
    "scalar": 14, "signature": 15, "string": 16,
}
INT_WIDTHS = {"i8": 8, "i16": 16, "i32": 32, "i64": 64, "i128": 128,
              "u8": 8, "u16": 16, "u32": 32, "u64": 64, "u128": 128}


def int_to_bits_le(v: int, width: int):
    return [(v >> i) & 1 == 1 for i in range(width)]


def bits_to_int_le(bits):
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def bytes_to_bits_le(data: bytes):
    return [(byte >> i) & 1 == 1 for byte in data for i in range(8)]


@dataclass(frozen=True)
class Literal:
    """type_name in VARIANTS; value: int for fields/scalars/ints/bool,
    (x, y) tuple for group/address, str for string."""
    type_name: str
    value: object

    def variant(self) -> int:
        return VARIANTS[self.type_name]

    def size_in_bits(self) -> int:
        t = self.type_name
        if t in ("address", "group", "field"):
            return FIELD_BITS
        if t == "boolean":
            return 1
        if t == "scalar":
            return SCALAR_BITS
        if t == "string":
            return len(self.value.encode()) * 8
        if t == "signature":
            return SCALAR_BITS * 2 + FIELD_BITS * 2   # challenge, response, pk_sig, pr_sig
        return INT_WIDTHS[t]

    def to_bits_le(self):
        t, v = self.type_name, self.value
        if t in ("address", "group"):
            x = v[0] if isinstance(v, tuple) else v
            return int_to_bits_le(x, FIELD_BITS)
        if t == "field":
            return int_to_bits_le(v % R, FIELD_BITS)
        if t == "scalar":
            return int_to_bits_le(v % S, SCALAR_BITS)
        if t == "boolean":
            return [bool(v)]
        if t == "string":
            return bytes_to_bits_le(v.encode())
        if t == "signature":
            return (int_to_bits_le(v.challenge, SCALAR_BITS)
                    + int_to_bits_le(v.response, SCALAR_BITS)
                    + int_to_bits_le(v.compute_key.pk_sig[0], FIELD_BITS)
                    + int_to_bits_le(v.compute_key.pr_sig[0], FIELD_BITS))
        width = INT_WIDTHS[t]
        return int_to_bits_le(v & ((1 << width) - 1), width)

    @classmethod
    def from_bits_le(cls, type_name: str, bits):
        if type_name in ("address", "group"):
            x = bits_to_int_le(bits)
            y = ed.x_recover_y(x)
            # disambiguation by subgroup membership (group from x semantics)
            pt = _group_from_x(x)
            return cls(type_name, pt)
        if type_name == "field":
            return cls(type_name, bits_to_int_le(bits) % R)
        if type_name == "scalar":
            return cls(type_name, bits_to_int_le(bits) % S)
        if type_name == "boolean":
            return cls(type_name, bool(bits[0]))
        width = INT_WIDTHS[type_name]
        v = bits_to_int_le(bits[:width])
        return cls(type_name, v)


def _group_from_x(x: int):
    """Group::from_x_coordinate: pick the root whose point is in the subgroup
    (console group elements are subgroup points)."""
    y = ed.x_recover_y(x)
    if y is None:
        raise ValueError("x not on curve")
    for cand in ((x, y), (x, (R - y) % R)):
        if ed.mul(cand, ed.ORDER) == ed.IDENTITY_AFFINE:
            return cand
    raise ValueError("x not in subgroup")


@dataclass(frozen=True)
class Identifier:
    name: str

    def size_in_bits(self) -> int:
        return len(self.name.encode()) * 8

    def to_bits_le(self):
        return bytes_to_bits_le(self.name.encode())

    def to_field(self) -> int:
        """Identifier as a field element: LE bytes (identifier/to_field.rs)."""
        v = int.from_bytes(self.name.encode(), "little")
        assert v < R
        return v


class Plaintext:
    """Literal / Struct / Array (console/program/src/data/plaintext/mod.rs:37)."""

    def __init__(self, kind: str, value):
        assert kind in ("literal", "struct", "array")
        self.kind = kind
        self.value = value  # Literal | list[(Identifier, Plaintext)] | list[Plaintext]

    @classmethod
    def literal(cls, type_name: str, value):
        return cls("literal", Literal(type_name, value))

    @classmethod
    def struct(cls, members):
        return cls("struct", [(Identifier(k) if isinstance(k, str) else k, v)
                              for k, v in members])

    @classmethod
    def array(cls, elements):
        return cls("array", list(elements))

    def to_bits_le(self):
        if self.kind == "literal":
            lit = self.value
            bits = [False, False]
            bits += int_to_bits_le(lit.variant(), 8)
            bits += int_to_bits_le(lit.size_in_bits(), 16)
            bits += lit.to_bits_le()
            return bits
        if self.kind == "struct":
            bits = [False, True]
            bits += int_to_bits_le(len(self.value), 8)
            for ident, val in self.value:
                bits += int_to_bits_le(ident.size_in_bits(), 8)
                bits += ident.to_bits_le()
                vb = val.to_bits_le()
                bits += int_to_bits_le(len(vb), 16)
                bits += vb
            return bits
        bits = [True, False]
        bits += int_to_bits_le(len(self.value), 32)
        for el in self.value:
            eb = el.to_bits_le()
            bits += int_to_bits_le(len(eb), 16)
            bits += eb
        return bits

    def to_fields(self):
        """Pack bits into field elements: data bits chunked at 252 with a
        trailing `true` marker appended first (plaintext/to_fields.rs)."""
        bits = self.to_bits_le() + [True]
        out = []
        for i in range(0, len(bits), FIELD_DATA_BITS):
            out.append(bits_to_int_le(bits[i : i + FIELD_DATA_BITS]))
        assert len(out) <= N.MAX_DATA_SIZE_IN_FIELDS
        return out

    def __eq__(self, o):
        return isinstance(o, Plaintext) and self.to_bits_le() == o.to_bits_le()


class Future:
    """Finalize future (console/program/src/data/future/mod.rs): a
    (program_id, function_name, arguments) triple; arguments are
    ("plaintext", Plaintext) | ("future", Future) pairs."""

    __slots__ = ("program_id", "function_name", "arguments")

    def __init__(self, program_id: str, function_name: str, arguments):
        self.program_id = program_id
        self.function_name = function_name
        self.arguments = list(arguments)

    def to_bits_le(self):
        """future/to_bits.rs:20: u16-length-prefixed program-id and
        function-name identifier bits, u8 arg count, then per argument a
        u16 bit-length prefix + variant bit (0 plaintext / 1 future)."""
        name, network = self.program_id.rsplit(".", 1)
        pid_bits = bytes_to_bits_le(name.encode()) + bytes_to_bits_le(network.encode())
        bits = int_to_bits_le(len(pid_bits), 16) + pid_bits
        fn_bits = bytes_to_bits_le(self.function_name.encode())
        bits += int_to_bits_le(len(fn_bits), 16) + fn_bits
        bits += int_to_bits_le(len(self.arguments), 8)
        for kind, arg in self.arguments:
            ab = [kind == "future"] + arg.to_bits_le()
            bits += int_to_bits_le(len(ab), 16)
            bits += ab
        return bits

    def to_fields(self):
        """future/to_fields.rs:23: bits + terminus marker, packed into
        252-bit field chunks."""
        bits = self.to_bits_le() + [True]
        out = []
        for i in range(0, len(bits), FIELD_DATA_BITS):
            out.append(bits_to_int_le(bits[i : i + FIELD_DATA_BITS]))
        assert len(out) <= N.MAX_DATA_SIZE_IN_FIELDS
        return out

    def __eq__(self, o):
        return isinstance(o, Future) and self.to_bits_le() == o.to_bits_le()


def future_from_value(v) -> Future:
    """Normalize the interpreter's Value('future', (pid, fname, args))
    shape (args are Literal/Plaintext/Value) into a console Future."""
    if isinstance(v, Future):
        return v
    assert getattr(v, "kind", None) == "future"
    pid, fname, args = v.value
    out_args = []
    for a in args:
        if isinstance(a, Future):
            out_args.append(("future", a))
        elif getattr(a, "kind", None) == "future":
            out_args.append(("future", future_from_value(a)))
        elif isinstance(a, Plaintext):
            out_args.append(("plaintext", a))
        elif isinstance(a, Literal):
            out_args.append(("plaintext", Plaintext("literal", a)))
        else:
            raise ValueError(f"bad future argument {a!r}")
    return Future(pid, fname, out_args)


class Value:
    """Plaintext / Record / Future (data/value/mod.rs:29)."""

    def __init__(self, kind: str, value):
        assert kind in ("plaintext", "record", "future")
        self.kind = kind
        self.value = value

    @classmethod
    def plaintext(cls, pt: Plaintext):
        return cls("plaintext", pt)

    def to_fields(self):
        if self.kind == "future" and not isinstance(self.value, Future):
            return future_from_value(self).to_fields()
        return self.value.to_fields()


# ---------------------------------------------------------------------------
# Literal text format (console/program parse/display round trips)
# ---------------------------------------------------------------------------

_INT_TYPES = ("i8", "i16", "i32", "i64", "i128", "u8", "u16", "u32", "u64", "u128")


def literal_to_str(lit: Literal) -> str:
    t, v = lit.type_name, lit.value
    if t == "boolean":
        return "true" if v else "false"
    if t == "field":
        return f"{v % R}field"
    if t == "scalar":
        return f"{v % S}scalar"
    if t == "group":
        x = v[0] if isinstance(v, tuple) else v
        return f"{x}group"
    if t == "address":
        from ..utils.encoding import bech32m_encode
        x = v[0] if isinstance(v, tuple) else v
        return bech32m_encode("aleo", x.to_bytes(32, "little"))
    if t == "string":
        return '"' + _escape_string(v) + '"'
    if t == "signature":
        from ..utils.encoding import bech32m_encode
        data = (v.challenge.to_bytes(32, "little") + v.response.to_bytes(32, "little")
                + v.compute_key.pk_sig[0].to_bytes(32, "little")
                + v.compute_key.pr_sig[0].to_bytes(32, "little"))
        return bech32m_encode("sign", data)
    return f"{v}{t}"


def _escape_string(v: str) -> str:
    """StringType Display escapes (types/string parse.rs string_parser)."""
    out = []
    for ch in v:
        if ch == '\\':
            out.append('\\\\')
        elif ch == '"':
            out.append('\\"')
        else:
            out.append(ch)
    return "".join(out)


def _unescape_string(v: str) -> str:
    """Inverse of the nom string parser: \\n \\t \\r \\0 \\' \\" \\\\ and
    \\u{hex} escapes; enforces the 255-byte cap (MAX_STRING_BYTES)."""
    out = []
    i = 0
    simple = {"n": "\n", "t": "\t", "r": "\r", "0": "\0",
              "'": "'", '"': '"', "\\": "\\"}
    while i < len(v):
        ch = v[i]
        if ch == "\\" and i + 1 < len(v):
            nxt = v[i + 1]
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
                continue
            if nxt == "u" and i + 2 < len(v) and v[i + 2] == "{":
                end = v.index("}", i + 3)
                out.append(chr(int(v[i + 3 : end], 16)))
                i = end + 1
                continue
            raise ValueError(f"invalid escape \\{nxt} in string literal")
        out.append(ch)
        i += 1
    res = "".join(out)
    if len(res.encode()) > 255:     # E::MAX_STRING_BYTES = u8::MAX
        raise ValueError("string literal exceeds 255 bytes")
    return res


def literal_from_str(s: str) -> Literal:
    s = s.strip().replace("_", "")
    if s in ("true", "false"):
        return Literal("boolean", s == "true")
    if s.startswith('"') and s.endswith('"'):
        return Literal("string", _unescape_string(s[1:-1]))
    if s.startswith("aleo1"):
        from ..utils.encoding import bech32m_decode
        _, data = bech32m_decode(s)
        x = int.from_bytes(data, "little")
        return Literal("address", _group_from_x(x))
    if s.startswith("sign1"):
        from ..utils.encoding import bech32m_decode
        from ..console import account as _acct
        _, data = bech32m_decode(s)
        assert len(data) == 128, f"signature must be 128 bytes, got {len(data)}"
        challenge = int.from_bytes(data[0:32], "little")
        response = int.from_bytes(data[32:64], "little")
        pk_sig = _group_from_x(int.from_bytes(data[64:96], "little"))
        pr_sig = _group_from_x(int.from_bytes(data[96:128], "little"))
        sk_prf = N.hash_to_scalar_psd(4, [pk_sig[0], pr_sig[0]])
        ck = _acct.ComputeKey(pk_sig, pr_sig, sk_prf)
        return Literal("signature", _acct.Signature(challenge, response, ck))
    for suffix, tname in (("field", "field"), ("scalar", "scalar"), ("group", "group")):
        if s.endswith(suffix):
            v = int(s[: -len(suffix)])
            if tname == "group":
                return Literal("group", _group_from_x(v % R)) if v % R else Literal("group", (0, 1))
            return Literal(tname, v % (S if tname == "scalar" else R))
    for t in sorted(_INT_TYPES, key=len, reverse=True):
        if s.endswith(t):
            v = int(s[: -len(t)])
            width = INT_WIDTHS[t]
            signed = t[0] == "i"
            lo = -(1 << (width - 1)) if signed else 0
            hi = (1 << (width - 1)) - 1 if signed else (1 << width) - 1
            if not (lo <= v <= hi):
                raise ValueError(f"integer literal out of range: {s}")
            return Literal(t, v)
    raise ValueError(f"cannot parse literal: {s}")
