"""Aleo program bytecode (.avm) — synthesizer/program/src/bytes.rs et al.

Parses program bytecode into a faithful AST that (a) re-serializes
byte-exactly and (b) renders canonical Aleo text source for the
synthesizer's text-format parser. This is the `.avm` file format used by
deploy transactions (deployments embed full program bytecode) and the
`vm/package` build artifacts.

Instruction encoding (logic/instruction/bytes.rs): u16 opcode index into
the 68-entry enum-order table (instruction/mod.rs:236-305), then the
per-instruction operand layout (operation/*.rs).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .io import Reader, Writer
from ..utils import encoding

# ---------------------------------------------------------------------------
# Literal types (console/program data_types/literal_type): enum-order ids.
# ---------------------------------------------------------------------------

LITERAL_TYPES = [
    "address", "boolean", "field", "group", "i8", "i16", "i32", "i64", "i128",
    "u8", "u16", "u32", "u64", "u128", "scalar", "signature", "string",
]
LITERAL_TYPE_ID = {name: i for i, name in enumerate(LITERAL_TYPES)}
_INT_SIZES = {"i8": 1, "i16": 2, "i32": 4, "i64": 8, "i128": 16,
              "u8": 1, "u16": 2, "u32": 4, "u64": 8, "u128": 16}

# The 68-instruction enum-order opcode table (instruction/mod.rs:236-305).
# kind: U=1 operand+dest, B=2 operands+dest, ASSERT=2 operands,
# TERNARY/SIGNV=3+dest, HASH1/HASH2=hash w/ PlaintextType dest type,
# COMMIT=2+dest+LiteralType, CAST, CALL, ASYNC.
OPCODE_TABLE = [
    ("abs", "U"), ("abs.w", "U"), ("add", "B"), ("add.w", "B"), ("and", "B"),
    ("assert.eq", "ASSERT"), ("assert.neq", "ASSERT"), ("async", "ASYNC"),
    ("call", "CALL"), ("cast", "CAST"), ("cast.lossy", "CAST"),
    ("commit.bhp256", "COMMIT"), ("commit.bhp512", "COMMIT"),
    ("commit.bhp768", "COMMIT"), ("commit.bhp1024", "COMMIT"),
    ("commit.ped64", "COMMIT"), ("commit.ped128", "COMMIT"),
    ("div", "B"), ("div.w", "B"), ("double", "U"), ("gt", "B"), ("gte", "B"),
    ("hash.bhp256", "HASH1"), ("hash.bhp512", "HASH1"),
    ("hash.bhp768", "HASH1"), ("hash.bhp1024", "HASH1"),
    ("hash.keccak256", "HASH1"), ("hash.keccak384", "HASH1"),
    ("hash.keccak512", "HASH1"), ("hash.ped64", "HASH1"),
    ("hash.ped128", "HASH1"), ("hash.psd2", "HASH1"), ("hash.psd4", "HASH1"),
    ("hash.psd8", "HASH1"), ("hash.sha3_256", "HASH1"),
    ("hash.sha3_384", "HASH1"), ("hash.sha3_512", "HASH1"),
    ("hash_many.psd2", "HASH2"), ("hash_many.psd4", "HASH2"),
    ("hash_many.psd8", "HASH2"), ("inv", "U"), ("is.eq", "B"),
    ("is.neq", "B"), ("lt", "B"), ("lte", "B"), ("mod", "B"), ("mul", "B"),
    ("mul.w", "B"), ("nand", "B"), ("neg", "U"), ("nor", "B"), ("not", "U"),
    ("or", "B"), ("pow", "B"), ("pow.w", "B"), ("rem", "B"), ("rem.w", "B"),
    ("shl", "B"), ("shl.w", "B"), ("shr", "B"), ("shr.w", "B"),
    ("sign.verify", "SIGNV"), ("square", "U"), ("sqrt", "U"), ("sub", "B"),
    ("sub.w", "B"), ("ternary", "TERNARY"), ("xor", "B"),
]
OPCODE_INDEX = {name: i for i, (name, _) in enumerate(OPCODE_TABLE)}


# ---------------------------------------------------------------------------
# Literals
# ---------------------------------------------------------------------------

def read_literal(r: Reader):
    """Returns (type_name, python value) for a console Literal."""
    idx = r.u16()
    name = LITERAL_TYPES[idx]
    if name == "address":
        return name, r.group()
    if name == "boolean":
        return name, r.boolean()
    if name in ("field", "group", "scalar"):
        return name, r.field()
    if name in _INT_SIZES:
        n = _INT_SIZES[name]
        v = int.from_bytes(r.read(n), "little")
        if name[0] == "i" and v >> (8 * n - 1):
            v -= 1 << (8 * n)
        return name, v
    if name == "signature":
        challenge = r.scalar()
        response = r.scalar()
        pk_sig = r.group()
        pr_sig = r.group()
        return name, (challenge, response, pk_sig, pr_sig)
    if name == "string":
        n = r.u16()
        return name, r.read(n).decode("utf-8")
    raise ValueError(f"unhandled literal type {name}")


def write_literal(w: Writer, name: str, value) -> None:
    w.u16(LITERAL_TYPE_ID[name])
    if name == "address":
        w.group(value)
    elif name == "boolean":
        w.boolean(value)
    elif name in ("field", "group", "scalar"):
        w.field(value)
    elif name in _INT_SIZES:
        n = _INT_SIZES[name]
        w.write((int(value) % (1 << (8 * n))).to_bytes(n, "little"))
    elif name == "signature":
        challenge, response, pk_sig, pr_sig = value
        w.scalar(challenge)
        w.scalar(response)
        w.group(pk_sig)
        w.group(pr_sig)
    elif name == "string":
        b = value.encode("utf-8")
        w.u16(len(b))
        w.write(b)
    else:
        raise ValueError(f"unhandled literal type {name}")


def literal_text(name: str, value) -> str:
    if name == "address":
        return encoding.address_to_string(value)
    if name == "boolean":
        return "true" if value else "false"
    if name == "string":
        return f'"{value}"'
    if name == "signature":
        raise ValueError("signature literals not renderable inline")
    return f"{value}{name}"


# ---------------------------------------------------------------------------
# Plaintext / register / value types
# ---------------------------------------------------------------------------

def read_plaintext_type(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        return LITERAL_TYPES[r.u8()]
    if variant == 1:
        return r.ident()
    if variant == 2:
        # ArrayType: innermost element type + dims
        ev = r.u8()
        if ev == 0:
            elem = LITERAL_TYPES[r.u8()]
        elif ev == 1:
            elem = r.ident()
        else:
            raise ValueError(f"bad array element variant {ev}")
        ndims = r.u8()
        lengths = []
        for _ in range(ndims):
            lengths.append(int.from_bytes(r.read(4), "little"))
        ty = elem
        for ln in reversed(lengths):
            ty = f"[{ty}; {ln}u32]"
        return ty
    raise ValueError(f"bad plaintext type variant {variant}")


def write_plaintext_type(w: Writer, ty: str) -> None:
    ty = ty.strip()
    if ty.startswith("["):
        w.u8(2)
        lengths = []
        inner = ty
        while inner.startswith("["):
            body = inner[1:-1]
            depth = 0
            for i in range(len(body) - 1, -1, -1):
                ch = body[i]
                if ch == "]":
                    depth += 1
                elif ch == "[":
                    depth -= 1
                elif ch == ";" and depth == 0:
                    break
            elem, ln = body[:i], body[i + 1:]
            lengths.append(int(ln.strip().rstrip("u32")))
            inner = elem.strip()
        if inner in LITERAL_TYPE_ID:
            w.u8(0)
            w.u8(LITERAL_TYPE_ID[inner])
        else:
            w.u8(1)
            w.ident(inner)
        w.u8(len(lengths))
        for ln in lengths:
            w.write(int(ln).to_bytes(4, "little"))
    elif ty in LITERAL_TYPE_ID:
        w.u8(0)
        w.u8(LITERAL_TYPE_ID[ty])
    else:
        w.u8(1)
        w.ident(ty)


def read_locator(r: Reader) -> str:
    name = r.ident()
    network = r.ident()
    resource = r.ident()
    return f"{name}.{network}/{resource}"


def write_locator(w: Writer, loc: str) -> None:
    pid, resource = loc.split("/")
    name, network = pid.rsplit(".", 1)
    w.ident(name)
    w.ident(network)
    w.ident(resource)


def read_register(r: Reader) -> str:
    variant = r.u8()
    locator = r.varint()
    if variant == 0:
        return f"r{locator}"
    if variant == 1:
        n = r.u16()
        parts = [f"r{locator}"]
        for _ in range(n):
            av = r.u8()
            if av == 0:
                parts.append("." + r.ident())
            elif av == 1:
                parts.append(f"[{int.from_bytes(r.read(4), 'little')}u32]")
            else:
                raise ValueError(f"bad access variant {av}")
        return "".join(parts)
    raise ValueError(f"bad register variant {variant}")


def _split_accesses(text: str):
    """'r0.a.b[1u32]' -> (0, [('m','a'),('m','b'),('i',1)])."""
    assert text.startswith("r")
    i = 1
    while i < len(text) and text[i].isdigit():
        i += 1
    locator = int(text[1:i])
    accesses = []
    rest = text[i:]
    while rest:
        if rest.startswith("."):
            j = 1
            while j < len(rest) and (rest[j].isalnum() or rest[j] == "_"):
                j += 1
            accesses.append(("m", rest[1:j]))
            rest = rest[j:]
        elif rest.startswith("["):
            j = rest.index("]")
            accesses.append(("i", int(rest[1:j].rstrip("u32"))))
            rest = rest[j + 1:]
        else:
            raise ValueError(f"bad register access syntax {text}")
    return locator, accesses


def write_register(w: Writer, text: str) -> None:
    locator, accesses = _split_accesses(text)
    if not accesses:
        w.u8(0)
        w.varint(locator)
        return
    w.u8(1)
    w.varint(locator)
    w.u16(len(accesses))
    for kind, v in accesses:
        if kind == "m":
            w.u8(0)
            w.ident(v)
        else:
            w.u8(1)
            w.write(int(v).to_bytes(4, "little"))


def read_operand(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        name, value = read_literal(r)
        return literal_text(name, value)
    if variant == 1:
        return read_register(r)
    if variant == 2:
        name = r.ident()
        network = r.ident()
        return f"{name}.{network}"
    if variant == 3:
        return "self.signer"
    if variant == 4:
        return "self.caller"
    if variant == 5:
        return "block.height"
    if variant == 6:
        return "network.id"
    raise ValueError(f"bad operand variant {variant}")


_LIT_SUFFIX = ["u128", "u16", "u32", "u64", "u8",
               "i128", "i16", "i32", "i64", "i8",
               "field", "group", "scalar"]


def write_operand(w: Writer, text: str) -> None:
    if text == "self.signer":
        w.u8(3)
        return
    if text == "self.caller":
        w.u8(4)
        return
    if text == "block.height":
        w.u8(5)
        return
    if text == "network.id":
        w.u8(6)
        return
    if text.startswith("r") and len(text) > 1 and text[1].isdigit():
        w.u8(1)
        write_register(w, text)
        return
    # literal forms
    if text in ("true", "false"):
        w.u8(0)
        write_literal(w, "boolean", text == "true")
        return
    if text.startswith("aleo1"):
        w.u8(0)
        write_literal(w, "address", encoding.address_from_string(text))
        return
    if text.startswith('"'):
        w.u8(0)
        write_literal(w, "string", text[1:-1])
        return
    for suf in _LIT_SUFFIX:
        if text.endswith(suf):
            body = text[: -len(suf)]
            try:
                v = int(body)
            except ValueError:
                break
            w.u8(0)
            write_literal(w, suf, v)
            return
    # program ID operand (e.g. credits.aleo)
    if "." in text and "/" not in text:
        name, network = text.rsplit(".", 1)
        w.u8(2)
        w.ident(name)
        w.ident(network)
        return
    raise ValueError(f"cannot encode operand {text!r}")


# ---------------------------------------------------------------------------
# Instructions
# ---------------------------------------------------------------------------

@dataclass
class Inst:
    opcode: str
    text: str


def read_cast_type(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        return "group.x"
    if variant == 1:
        return "group.y"
    if variant == 2:
        return read_plaintext_type(r)
    if variant == 3:
        return r.ident() + ".record"
    if variant == 4:
        return read_locator(r) + ".record"
    raise ValueError(f"bad cast type variant {variant}")


def write_cast_type(w: Writer, ty: str) -> None:
    if ty == "group.x":
        w.u8(0)
    elif ty == "group.y":
        w.u8(1)
    elif ty.endswith(".record"):
        base = ty[: -len(".record")]
        if "/" in base:
            w.u8(4)
            write_locator(w, base)
        else:
            w.u8(3)
            w.ident(base)
    else:
        w.u8(2)
        write_plaintext_type(w, ty)


def read_instruction(r: Reader) -> Inst:
    idx = r.u16()
    opcode, kind = OPCODE_TABLE[idx]
    if kind in ("U", "B", "TERNARY", "SIGNV"):
        n = {"U": 1, "B": 2, "TERNARY": 3, "SIGNV": 3}[kind]
        ops = [read_operand(r) for _ in range(n)]
        dest = read_register(r)
        return Inst(opcode, f"{opcode} {' '.join(ops)} into {dest};")
    if kind == "ASSERT":
        ops = [read_operand(r) for _ in range(2)]
        return Inst(opcode, f"{opcode} {' '.join(ops)};")
    if kind in ("HASH1", "HASH2"):
        n = 1 if kind == "HASH1" else 2
        ops = [read_operand(r) for _ in range(n)]
        dest = read_register(r)
        dtype = read_plaintext_type(r)
        return Inst(opcode, f"{opcode} {' '.join(ops)} into {dest} as {dtype};")
    if kind == "COMMIT":
        ops = [read_operand(r) for _ in range(2)]
        dest = read_register(r)
        dtype = LITERAL_TYPES[r.u8()]
        return Inst(opcode, f"{opcode} {' '.join(ops)} into {dest} as {dtype};")
    if kind == "CAST":
        n = r.u8()
        ops = [read_operand(r) for _ in range(n)]
        dest = read_register(r)
        ctype = read_cast_type(r)
        return Inst(opcode, f"{opcode} {' '.join(ops)} into {dest} as {ctype};")
    if kind == "CALL":
        cv = r.u8()
        if cv == 0:
            operator = read_locator(r)
        elif cv == 1:
            operator = r.ident()
        else:
            raise ValueError(f"bad call operator variant {cv}")
        n = r.u8()
        ops = [read_operand(r) for _ in range(n)]
        nd = r.u8()
        dests = [read_register(r) for _ in range(nd)]
        text = f"call {operator}"
        if ops:
            text += " " + " ".join(ops)
        if dests:
            text += " into " + " ".join(dests)
        return Inst(opcode, text + ";")
    if kind == "ASYNC":
        fname = r.ident()
        n = r.u8()
        ops = [read_operand(r) for _ in range(n)]
        dest = read_register(r)
        text = f"async {fname}"
        if ops:
            text += " " + " ".join(ops)
        return Inst(opcode, text + f" into {dest};")
    raise ValueError(f"unhandled instruction kind {kind}")


def write_instruction(w: Writer, text: str) -> None:
    text = text.strip().rstrip(";")
    tokens = text.split()
    opcode = tokens[0]
    w.u16(OPCODE_INDEX[opcode])
    kind = OPCODE_TABLE[OPCODE_INDEX[opcode]][1]
    rest = tokens[1:]
    # split off "into ..." and "as ..."
    as_type = None
    if "as" in rest:
        i = rest.index("as")
        as_type = " ".join(rest[i + 1:])
        rest = rest[:i]
    dests = []
    if "into" in rest:
        i = rest.index("into")
        dests = rest[i + 1:]
        rest = rest[:i]
    ops = rest
    if kind in ("U", "B", "TERNARY", "SIGNV"):
        for op in ops:
            write_operand(w, op)
        write_register(w, dests[0])
    elif kind == "ASSERT":
        for op in ops:
            write_operand(w, op)
    elif kind in ("HASH1", "HASH2"):
        for op in ops:
            write_operand(w, op)
        write_register(w, dests[0])
        write_plaintext_type(w, as_type)
    elif kind == "COMMIT":
        for op in ops:
            write_operand(w, op)
        write_register(w, dests[0])
        w.u8(LITERAL_TYPE_ID[as_type])
    elif kind == "CAST":
        w.u8(len(ops))
        for op in ops:
            write_operand(w, op)
        write_register(w, dests[0])
        write_cast_type(w, as_type)
    elif kind == "CALL":
        operator = ops[0]
        if "/" in operator:
            w.u8(0)
            write_locator(w, operator)
        else:
            w.u8(1)
            w.ident(operator)
        w.u8(len(ops) - 1)
        for op in ops[1:]:
            write_operand(w, op)
        w.u8(len(dests))
        for d in dests:
            write_register(w, d)
    elif kind == "ASYNC":
        w.ident(ops[0])
        w.u8(len(ops) - 1)
        for op in ops[1:]:
            write_operand(w, op)
        write_register(w, dests[0])
    else:
        raise ValueError(f"unhandled kind {kind}")


# ---------------------------------------------------------------------------
# Finalize commands
# ---------------------------------------------------------------------------

def _read_call_operator(r: Reader) -> str:
    cv = r.u8()
    if cv == 0:
        return read_locator(r)
    if cv == 1:
        return r.ident()
    raise ValueError(f"bad mapping operator variant {cv}")


def _write_call_operator(w: Writer, text: str) -> None:
    if "/" in text:
        w.u8(0)
        write_locator(w, text)
    else:
        w.u8(1)
        w.ident(text)


def read_command(r: Reader) -> Inst:
    variant = r.u8()
    if variant == 0:
        return read_instruction(r)
    if variant == 1:
        reg = read_register(r)
        return Inst("await", f"await {reg};")
    if variant == 2:
        mapping = _read_call_operator(r)
        key = read_operand(r)
        dest = read_register(r)
        return Inst("contains", f"contains {mapping}[{key}] into {dest};")
    if variant == 3:
        mapping = _read_call_operator(r)
        key = read_operand(r)
        dest = read_register(r)
        return Inst("get", f"get {mapping}[{key}] into {dest};")
    if variant == 4:
        mapping = _read_call_operator(r)
        key = read_operand(r)
        default = read_operand(r)
        dest = read_register(r)
        return Inst("get.or_use", f"get.or_use {mapping}[{key}] {default} into {dest};")
    if variant == 5:
        n = r.u8()
        ops = [read_operand(r) for _ in range(n)]
        dest = read_register(r)
        dtype = LITERAL_TYPES[r.u8()]
        text = "rand.chacha"
        if ops:
            text += " " + " ".join(ops)
        return Inst("rand.chacha", text + f" into {dest} as {dtype};")
    if variant == 6:
        mapping = r.ident()
        key = read_operand(r)
        return Inst("remove", f"remove {mapping}[{key}];")
    if variant == 7:
        mapping = r.ident()
        key = read_operand(r)
        value = read_operand(r)
        return Inst("set", f"set {value} into {mapping}[{key}];")
    if variant in (8, 9):
        first = read_operand(r)
        second = read_operand(r)
        position = r.ident()
        op = "branch.eq" if variant == 8 else "branch.neq"
        return Inst(op, f"{op} {first} {second} to {position};")
    if variant == 10:
        name = r.ident()
        return Inst("position", f"position {name};")
    raise ValueError(f"bad command variant {variant}")


def _split_mapping_access(text: str):
    """'account[r0]' -> ('account', 'r0')."""
    i = text.index("[")
    return text[:i], text[i + 1:-1]


def write_command(w: Writer, text: str) -> None:
    text = text.strip().rstrip(";")
    tokens = text.split()
    op = tokens[0]
    if op == "await":
        w.u8(1)
        write_register(w, tokens[1])
    elif op in ("contains", "get"):
        w.u8(2 if op == "contains" else 3)
        mapping, key = _split_mapping_access(tokens[1])
        _write_call_operator(w, mapping)
        write_operand(w, key)
        write_register(w, tokens[3])
    elif op == "get.or_use":
        w.u8(4)
        mapping, key = _split_mapping_access(tokens[1])
        _write_call_operator(w, mapping)
        write_operand(w, key)
        write_operand(w, tokens[2])
        write_register(w, tokens[4])
    elif op == "rand.chacha":
        w.u8(5)
        i = tokens.index("into")
        ops = tokens[1:i]
        dest = tokens[i + 1]
        dtype = tokens[i + 3]
        w.u8(len(ops))
        for o in ops:
            write_operand(w, o)
        write_register(w, dest)
        w.u8(LITERAL_TYPE_ID[dtype])
    elif op == "remove":
        w.u8(6)
        mapping, key = _split_mapping_access(tokens[1])
        w.ident(mapping)
        write_operand(w, key)
    elif op == "set":
        w.u8(7)
        value = tokens[1]
        mapping, key = _split_mapping_access(tokens[3])
        w.ident(mapping)
        write_operand(w, key)
        write_operand(w, value)
    elif op in ("branch.eq", "branch.neq"):
        w.u8(8 if op == "branch.eq" else 9)
        write_operand(w, tokens[1])
        write_operand(w, tokens[2])
        w.ident(tokens[4])
    elif op == "position":
        w.u8(10)
        w.ident(tokens[1])
    else:
        w.u8(0)
        write_instruction(w, text + ";")


# ---------------------------------------------------------------------------
# Value / register / finalize types (typed I/O declarations)
# ---------------------------------------------------------------------------

def read_value_type(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        return read_plaintext_type(r) + ".constant"
    if variant == 1:
        return read_plaintext_type(r) + ".public"
    if variant == 2:
        return read_plaintext_type(r) + ".private"
    if variant == 3:
        return r.ident() + ".record"
    if variant == 4:
        return read_locator(r) + ".record"
    if variant == 5:
        return read_locator(r) + ".future"
    raise ValueError(f"bad value type variant {variant}")


def write_value_type(w: Writer, ty: str) -> None:
    if ty.endswith(".constant"):
        w.u8(0)
        write_plaintext_type(w, ty[:-len(".constant")])
    elif ty.endswith(".public"):
        w.u8(1)
        write_plaintext_type(w, ty[:-len(".public")])
    elif ty.endswith(".private"):
        w.u8(2)
        write_plaintext_type(w, ty[:-len(".private")])
    elif ty.endswith(".record"):
        base = ty[:-len(".record")]
        if "/" in base:
            w.u8(4)
            write_locator(w, base)
        else:
            w.u8(3)
            w.ident(base)
    elif ty.endswith(".future"):
        w.u8(5)
        write_locator(w, ty[:-len(".future")])
    else:
        raise ValueError(f"bad value type {ty}")


def read_register_type(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        return read_plaintext_type(r)
    if variant == 1:
        return r.ident() + ".record"
    if variant == 2:
        return read_locator(r) + ".record"
    if variant == 3:
        return read_locator(r) + ".future"
    raise ValueError(f"bad register type variant {variant}")


def write_register_type(w: Writer, ty: str) -> None:
    if ty.endswith(".record"):
        base = ty[:-len(".record")]
        if "/" in base:
            w.u8(2)
            write_locator(w, base)
        else:
            w.u8(1)
            w.ident(base)
    elif ty.endswith(".future"):
        w.u8(3)
        write_locator(w, ty[:-len(".future")])
    else:
        w.u8(0)
        write_plaintext_type(w, ty)


def read_finalize_type(r: Reader) -> str:
    variant = r.u8()
    if variant == 0:
        return read_plaintext_type(r) + ".public"
    if variant == 1:
        return read_locator(r) + ".future"
    raise ValueError(f"bad finalize type variant {variant}")


def write_finalize_type(w: Writer, ty: str) -> None:
    if ty.endswith(".public"):
        w.u8(0)
        write_plaintext_type(w, ty[:-len(".public")])
    elif ty.endswith(".future"):
        w.u8(1)
        write_locator(w, ty[:-len(".future")])
    else:
        raise ValueError(f"bad finalize type {ty}")


# ---------------------------------------------------------------------------
# Program components
# ---------------------------------------------------------------------------

@dataclass
class FunctionAst:
    name: str
    inputs: list = field(default_factory=list)    # (register, value_type)
    instructions: list = field(default_factory=list)  # Inst
    outputs: list = field(default_factory=list)   # (operand, value_type)
    finalize: "FinalizeAst | None" = None

    def to_bytes(self) -> bytes:
        w = Writer()
        write_function(w, self)
        return w.getvalue()


@dataclass
class FinalizeAst:
    name: str
    inputs: list = field(default_factory=list)    # (register, finalize_type)
    commands: list = field(default_factory=list)  # Inst


@dataclass
class ClosureAst:
    name: str
    inputs: list = field(default_factory=list)    # (register, register_type)
    instructions: list = field(default_factory=list)
    outputs: list = field(default_factory=list)   # (operand, register_type)


@dataclass
class ProgramAst:
    id: str
    imports: list = field(default_factory=list)
    components: list = field(default_factory=list)  # (kind, obj) in decl order

    def functions(self):
        return [obj for kind, obj in self.components if kind == "function"]


def read_function(r: Reader) -> FunctionAst:
    name = r.ident()
    fn = FunctionAst(name)
    for _ in range(r.u16()):
        reg = read_register(r)
        vt = read_value_type(r)
        fn.inputs.append((reg, vt))
    for _ in range(r.u32()):
        fn.instructions.append(read_instruction(r))
    for _ in range(r.u16()):
        variant = r.u8()
        if variant == 0:
            operand = read_operand(r)
        elif variant == 1:
            operand = read_register(r)
        else:
            raise ValueError(f"bad output operand variant {variant}")
        vt = read_value_type(r)
        fn.outputs.append((variant, operand, vt))
    fv = r.u8()
    if fv == 1:
        fn.finalize = read_finalize(r)
    elif fv != 0:
        raise ValueError(f"bad finalize variant {fv}")
    return fn


def write_function(w: Writer, fn: FunctionAst) -> None:
    w.ident(fn.name)
    w.u16(len(fn.inputs))
    for reg, vt in fn.inputs:
        write_register(w, reg)
        write_value_type(w, vt)
    w.u32(len(fn.instructions))
    for inst in fn.instructions:
        write_instruction(w, inst.text)
    w.u16(len(fn.outputs))
    for variant, operand, vt in fn.outputs:
        w.u8(variant)
        if variant == 0:
            write_operand(w, operand)
        else:
            write_register(w, operand)
        write_value_type(w, vt)
    if fn.finalize is not None:
        w.u8(1)
        write_finalize(w, fn.finalize)
    else:
        w.u8(0)


def read_finalize(r: Reader) -> FinalizeAst:
    name = r.ident()
    fz = FinalizeAst(name)
    for _ in range(r.u16()):
        reg = read_register(r)
        ft = read_finalize_type(r)
        fz.inputs.append((reg, ft))
    for _ in range(r.u16()):
        fz.commands.append(read_command(r))
    return fz


def write_finalize(w: Writer, fz: FinalizeAst) -> None:
    w.ident(fz.name)
    w.u16(len(fz.inputs))
    for reg, ft in fz.inputs:
        write_register(w, reg)
        write_finalize_type(w, ft)
    w.u16(len(fz.commands))
    for cmd in fz.commands:
        write_command(w, cmd.text)


def read_closure(r: Reader) -> ClosureAst:
    name = r.ident()
    cl = ClosureAst(name)
    for _ in range(r.u16()):
        reg = read_register(r)
        rt = read_register_type(r)
        cl.inputs.append((reg, rt))
    for _ in range(r.u32()):
        cl.instructions.append(read_instruction(r))
    for _ in range(r.u16()):
        variant = r.u8()
        if variant == 0:
            operand = read_operand(r)
        elif variant == 1:
            operand = read_register(r)
        else:
            raise ValueError(f"bad output operand variant {variant}")
        rt = read_register_type(r)
        cl.outputs.append((variant, operand, rt))
    return cl


def write_closure(w: Writer, cl: ClosureAst) -> None:
    w.ident(cl.name)
    w.u16(len(cl.inputs))
    for reg, rt in cl.inputs:
        write_register(w, reg)
        write_register_type(w, rt)
    w.u32(len(cl.instructions))
    for inst in cl.instructions:
        write_instruction(w, inst.text)
    w.u16(len(cl.outputs))
    for variant, operand, rt in cl.outputs:
        w.u8(variant)
        if variant == 0:
            write_operand(w, operand)
        else:
            write_register(w, operand)
        write_register_type(w, rt)


def read_program(r: Reader) -> ProgramAst:
    r.version(1, "program")
    name = r.ident()
    network = r.ident()
    prog = ProgramAst(f"{name}.{network}")
    for _ in range(r.u8()):
        iname = r.ident()
        inetwork = r.ident()
        prog.imports.append(f"{iname}.{inetwork}")
    for _ in range(r.u16()):
        variant = r.u8()
        if variant == 0:   # mapping
            mname = r.ident()
            key = read_plaintext_type(r)
            value = read_plaintext_type(r)
            prog.components.append(("mapping", (mname, key, value)))
        elif variant == 1:  # struct
            sname = r.ident()
            members = [(r.ident(), read_plaintext_type(r)) for _ in range(r.u16())]
            prog.components.append(("struct", (sname, members)))
        elif variant == 2:  # record
            rname = r.ident()
            ov = r.u8()  # PublicOrPrivate: 0=public 1=private
            owner_vis = "public" if ov == 0 else "private"
            entries = []
            for _ in range(r.u16()):
                ename = r.ident()
                ev = r.u8()
                pt = read_plaintext_type(r)
                vis = ["constant", "public", "private"][ev]
                entries.append((ename, f"{pt}.{vis}"))
            prog.components.append(("record", (rname, owner_vis, entries)))
        elif variant == 3:
            prog.components.append(("closure", read_closure(r)))
        elif variant == 4:
            prog.components.append(("function", read_function(r)))
        else:
            raise ValueError(f"bad program component variant {variant}")
    return prog


def write_program(w: Writer, prog: ProgramAst) -> None:
    w.u8(1)
    name, network = prog.id.rsplit(".", 1)
    w.ident(name)
    w.ident(network)
    w.u8(len(prog.imports))
    for imp in prog.imports:
        iname, inetwork = imp.rsplit(".", 1)
        w.ident(iname)
        w.ident(inetwork)
    w.u16(len(prog.components))
    for kind, obj in prog.components:
        if kind == "mapping":
            w.u8(0)
            mname, key, value = obj
            w.ident(mname)
            write_plaintext_type(w, key)
            write_plaintext_type(w, value)
        elif kind == "struct":
            w.u8(1)
            sname, members = obj
            w.ident(sname)
            w.u16(len(members))
            for mname, pt in members:
                w.ident(mname)
                write_plaintext_type(w, pt)
        elif kind == "record":
            w.u8(2)
            rname, owner_vis, entries = obj
            w.ident(rname)
            w.u8(0 if owner_vis == "public" else 1)
            w.u16(len(entries))
            for ename, ty in entries:
                w.ident(ename)
                pt, vis = ty.rsplit(".", 1)
                w.u8(["constant", "public", "private"].index(vis))
                write_plaintext_type(w, pt)
        elif kind == "closure":
            w.u8(3)
            write_closure(w, obj)
        elif kind == "function":
            w.u8(4)
            write_function(w, obj)
        else:
            raise ValueError(f"bad component kind {kind}")


def program_to_text(prog: ProgramAst) -> str:
    """Render canonical Aleo source (Display-format) for the text parser."""
    out = []
    for imp in prog.imports:
        out.append(f"import {imp};")
    if prog.imports:
        out.append("")
    out.append(f"program {prog.id};")
    for kind, obj in prog.components:
        out.append("")
        if kind == "mapping":
            mname, key, value = obj
            out.append(f"mapping {mname}:")
            out.append(f"    key as {key}.public;")
            out.append(f"    value as {value}.public;")
        elif kind == "struct":
            sname, members = obj
            out.append(f"struct {sname}:")
            for mname, pt in members:
                out.append(f"    {mname} as {pt};")
        elif kind == "record":
            rname, owner_vis, entries = obj
            out.append(f"record {rname}:")
            out.append(f"    owner as address.{owner_vis};")
            for ename, ty in entries:
                out.append(f"    {ename} as {ty};")
        elif kind == "closure":
            out.append(f"closure {obj.name}:")
            for reg, rt in obj.inputs:
                out.append(f"    input {reg} as {rt};")
            for inst in obj.instructions:
                out.append(f"    {inst.text}")
            for _, operand, rt in obj.outputs:
                out.append(f"    output {operand} as {rt};")
        elif kind == "function":
            out.append(f"function {obj.name}:")
            for reg, vt in obj.inputs:
                out.append(f"    input {reg} as {vt};")
            for inst in obj.instructions:
                out.append(f"    {inst.text}")
            for _, operand, vt in obj.outputs:
                out.append(f"    output {operand} as {vt};")
            if obj.finalize is not None:
                fz = obj.finalize
                out.append(f"finalize {fz.name}:")
                for reg, ft in fz.inputs:
                    out.append(f"    input {reg} as {ft};")
                for cmd in fz.commands:
                    out.append(f"    {cmd.text}")
    return "\n".join(out) + "\n"


_RE_REGISTER = __import__("re").compile(r"^r\d+($|[.\[])")


def program_from_text(text: str) -> ProgramAst:
    """Parse canonical Aleo source into a ProgramAst — the inverse of
    program_to_text, so text -> AST -> bytes produces the reference binary
    program format (synthesizer/program bytes.rs) from a source package."""
    prog = None
    imports = []
    cur = None          # ("mapping"/"struct"/"record"/"closure"/"function", obj)
    cur_fn = None       # FunctionAst while inside a function or its finalize
    in_finalize = False

    def flush():
        nonlocal cur, cur_fn, in_finalize
        if cur is not None:
            prog.components.append(cur)
        cur = None
        cur_fn = None
        in_finalize = False

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("//", "/*", "*")):
            continue
        line = line.split("//")[0].strip().rstrip(";")
        if not line:
            continue
        if line.startswith("import "):
            imports.append(line.split()[1])
        elif line.startswith("program "):
            prog = ProgramAst(line.split()[1])
            prog.imports = imports
        elif line.startswith("mapping ") and line.endswith(":"):
            flush()
            cur = ("mapping", [line.split()[1].rstrip(":"), None, None])
        elif line.startswith("struct ") and line.endswith(":"):
            flush()
            cur = ("struct", (line.split()[1].rstrip(":"), []))
        elif line.startswith("record ") and line.endswith(":"):
            flush()
            cur = ("record", [line.split()[1].rstrip(":"), None, []])
        elif line.startswith("closure ") and line.endswith(":"):
            flush()
            cur = ("closure", ClosureAst(line.split()[1].rstrip(":")))
        elif line.startswith("function ") and line.endswith(":"):
            flush()
            cur_fn = FunctionAst(line.split()[1].rstrip(":"))
            cur = ("function", cur_fn)
        elif line.startswith("finalize ") and line.endswith(":"):
            assert cur_fn is not None, "finalize outside a function"
            cur_fn.finalize = FinalizeAst(line.split()[1].rstrip(":"))
            in_finalize = True
        elif cur is not None and cur[0] == "mapping":
            kind, rest = line.split(" as ", 1)
            ty = rest.rsplit(".", 1)[0]
            cur[1][1 if kind.strip() == "key" else 2] = ty
        elif cur is not None and cur[0] == "struct" and " as " in line:
            mname, pt = line.split(" as ", 1)
            cur[1][1].append((mname.strip(), pt.strip()))
        elif cur is not None and cur[0] == "record" and " as " in line:
            ename, ty = line.split(" as ", 1)
            ename, ty = ename.strip(), ty.strip()
            if ename == "owner":
                cur[1][1] = ty.rsplit(".", 1)[1]
            else:
                cur[1][2].append((ename, ty))
        elif line.startswith("input "):
            _, reg, _, ty = line.split()
            if in_finalize:
                cur_fn.finalize.inputs.append((reg, ty))
            elif cur[0] == "closure":
                cur[1].inputs.append((reg, ty))
            else:
                cur_fn.inputs.append((reg, ty))
        elif line.startswith("output "):
            _, operand, _, ty = line.split()
            variant = 1 if _RE_REGISTER.match(operand) else 0
            if cur[0] == "closure":
                cur[1].outputs.append((variant, operand, ty))
            else:
                cur_fn.outputs.append((variant, operand, ty))
        else:
            inst = Inst(line.split()[0], line + ";")
            if in_finalize:
                cur_fn.finalize.commands.append(inst)
            elif cur[0] == "closure":
                cur[1].instructions.append(inst)
            else:
                cur_fn.instructions.append(inst)
    flush()
    # normalize list-built components to the tuple shapes read_program makes
    comps = []
    for kind, obj in prog.components:
        if kind == "mapping":
            comps.append((kind, tuple(obj)))
        elif kind == "record":
            comps.append((kind, (obj[0], obj[1], obj[2])))
        else:
            comps.append((kind, obj if not isinstance(obj, list) else tuple(obj)))
    prog.components = comps
    return prog


def parse_program_bytes(data: bytes) -> ProgramAst:
    r = Reader(data)
    prog = read_program(r)
    if r.remaining():
        raise ValueError(f"{r.remaining()} trailing bytes after program")
    return prog


def program_to_bytes(prog: ProgramAst) -> bytes:
    w = Writer()
    write_program(w, prog)
    return w.getvalue()
