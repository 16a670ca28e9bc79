"""Strict cursor-based parser for Aleo instruction/command text — the
nom-grammar-faithful validator used by the reference parser golden
corpora (synthesizer/tests/tests/parser/*).

The reference grammar is whitespace-insensitive between tokens
("addr0r1intor2;" parses as "add r0 r1 into r2;") and maximal-munch on
registers/identifiers; the line-oriented `program.py` parser is the
permissive fast path, this module is the validation surface
(synthesizer/program/src/logic/instruction/mod.rs parse impls,
logic/command/mod.rs:64, logic/instruction/operand/mod.rs).
"""
from __future__ import annotations

import re

from ..formats.program_io import OPCODE_TABLE

OPCODES = dict(OPCODE_TABLE)

LITERAL_TYPES = {"address", "boolean", "field", "group", "i8", "i16", "i32",
                 "i64", "i128", "u8", "u16", "u32", "u64", "u128", "scalar",
                 "signature", "string"}
MAX_POSITIONS = 255            # u8::MAX (finalize/mod.rs:141)


class ParseError(ValueError):
    pass


class Cursor:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\r\n":
            self.i += 1

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def tag(self, t: str) -> bool:
        if self.s.startswith(t, self.i):
            self.i += len(t)
            return True
        return False

    def expect(self, t: str, what: str = ""):
        if not self.tag(t):
            raise ParseError(f"expected {what or t!r} at {self.s[self.i:self.i+20]!r}")

    def match(self, pattern: str):
        m = re.compile(pattern).match(self.s, self.i)
        if m:
            self.i = m.end()
            return m.group(0)
        return None

    def save(self):
        return self.i

    def restore(self, mark):
        self.i = mark


_IDENT = r"[a-zA-Z][a-zA-Z0-9_]*"


def _identifier(c: Cursor) -> str:
    """Aleo identifier: starts with a lowercase letter (the reference
    requires lowercase ASCII alpha start), alphanum/underscore body."""
    v = c.match(r"[a-z][a-z0-9_]*")
    if v is None:
        raise ParseError("expected identifier")
    return v


def _register(c: Cursor) -> str:
    v = c.match(r"r\d+")
    if v is None:
        raise ParseError("expected register")
    # optional member accesses: .owner / .token_amount / [index]
    while True:
        m = c.save()
        if c.tag("."):
            acc = c.match(r"[a-z][a-z0-9_]*")
            if acc is None:
                c.restore(m)
                break
            v += "." + acc
        else:
            break
    return v


def _literal(c: Cursor) -> str:
    """One console literal token; delegates validity (range, bech32,
    underscore placement) to console.types.literal_from_str."""
    from ..console.types import literal_from_str
    m = c.save()
    tok = c.match(r"-?[A-Za-z0-9_]+")
    if tok is None:
        raise ParseError("expected literal")
    # string literal support is not needed by the corpus (no string ops)
    try:
        literal_from_str(tok)
    except Exception as e:
        c.restore(m)
        raise ParseError(f"bad literal {tok!r}: {e}")
    return tok


def _program_id(c: Cursor) -> str:
    """ProgramID operand: name.network where the network identifier must
    be 'aleo' (console ProgramID::from_str is_aleo check) — this is what
    rejects 'block.length' while accepting 'hello.aleo'."""
    name = _identifier(c)
    c.expect(".", "program network suffix")
    network = _identifier(c)
    if network != "aleo":
        raise ParseError(f"bad program network {network!r}")
    return f"{name}.{network}"


def _operand(c: Cursor) -> str:
    """Operand (operand/mod.rs): register | literal | program ID |
    self.signer | self.caller | block.height | network.id | group::GEN."""
    c.ws()
    for special in ("self.signer", "self.caller", "block.height",
                    "network.id", "group::GEN"):
        if c.s.startswith(special, c.i):
            # must not be followed by an identifier character
            end = c.i + len(special)
            if end >= len(c.s) or not (c.s[end].isalnum() or c.s[end] == "_"):
                c.i = end
                return special
    m = c.save()
    # register first (maximal munch: r0r1 -> r0, then r1)
    try:
        return _register(c)
    except ParseError:
        c.restore(m)
    # literal
    try:
        return _literal(c)
    except ParseError:
        c.restore(m)
    # program id
    try:
        return _program_id(c)
    except ParseError:
        c.restore(m)
    raise ParseError(f"bad operand at {c.s[c.i:c.i+20]!r}")


def _plaintext_type(c: Cursor) -> str:
    c.ws()
    t = c.match(r"[a-z][a-z0-9_]*(\.aleo/[a-z][a-z0-9_]*)?")
    if t is None:
        raise ParseError("expected type")
    return t


def _as_literal_type(c: Cursor) -> str:
    c.ws()
    t = c.match(r"[a-z][a-z0-9_]*")
    if t is None or t not in LITERAL_TYPES:
        raise ParseError(f"expected literal type, got {t!r}")
    return t


def check_instruction(line: str) -> None:
    """Validate one instruction line (with trailing semicolon). Raises
    ParseError on any syntax the reference parser rejects."""
    c = Cursor(line)
    c.ws()
    # longest-match opcode (e.g. add.w before add? tags are unambiguous
    # because '.' continues the opcode and operands cannot start with '.')
    op = None
    for cand in sorted(OPCODES, key=len, reverse=True):
        mark = c.save()
        if c.tag(cand):
            nxt = c.s[c.i:c.i + 1]
            if cand in ("cast", "cast.lossy") and nxt == ".":
                c.restore(mark)
                continue
            op = cand
            break
    if op is None:
        raise ParseError(f"unknown opcode in {line!r}")
    kind = OPCODES[op]
    if kind == "U":
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif kind == "B":
        _operand(c)
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif kind == "ASSERT":
        _operand(c)
        _operand(c)
    elif kind == "TERNARY":
        _operand(c)
        _operand(c)
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif kind == "SIGNV":
        _operand(c)
        _operand(c)
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif kind in ("HASH1", "HASH2"):
        _operand(c)
        if kind == "HASH2":
            _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
        c.ws()
        c.expect("as")
        _plaintext_type(c)
    elif kind == "COMMIT":
        _operand(c)
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
        c.ws()
        c.expect("as")
        t = _as_literal_type(c)
        if t not in ("address", "field", "group"):
            raise ParseError(f"bad commit destination type {t}")
    elif kind == "CAST":
        ops = [_operand(c)]
        while True:
            m = c.save()
            c.ws()
            if c.s.startswith("into", c.i):
                c.restore(m)
                break
            try:
                ops.append(_operand(c))
            except ParseError:
                c.restore(m)
                break
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
        c.ws()
        c.expect("as")
        _plaintext_type(c)
        c.ws()
        c.match(r"\.(record|private|public|constant)")
    elif kind == "CALL":
        c.ws()
        m = c.save()
        # locator foo.aleo/bar or local identifier
        loc = c.match(r"[a-z][a-z0-9_]*\.[a-z][a-z0-9_]*/[a-z][a-z0-9_]*")
        if loc is None:
            c.restore(m)
            _identifier(c)
        ops, dests = [], []
        while True:
            m = c.save()
            c.ws()
            if c.s.startswith("into", c.i) or c.s.startswith(";", c.i):
                c.restore(m)
                break
            try:
                ops.append(_operand(c))
            except ParseError:
                c.restore(m)
                break
        c.ws()
        if c.tag("into"):
            while True:
                m = c.save()
                c.ws()
                try:
                    dests.append(_register(c))
                except ParseError:
                    c.restore(m)
                    break
            if not dests:
                raise ParseError("call into requires destinations")
    elif kind == "ASYNC":
        c.ws()
        _identifier(c)
        while True:
            m = c.save()
            c.ws()
            if c.s.startswith("into", c.i) or c.s.startswith(";", c.i):
                c.restore(m)
                break
            try:
                _operand(c)
            except ParseError:
                c.restore(m)
                break
        c.ws()
        if c.tag("into"):
            c.ws()
            _register(c)
    else:
        raise ParseError(f"unhandled opcode kind {kind}")
    c.ws()
    c.expect(";")
    c.ws()
    if not c.eof():
        raise ParseError(f"trailing input {c.s[c.i:]!r}")


def _mapping_access(c: Cursor):
    """identifier immediately followed by [operand] (no whitespace
    between the mapping name and '[' — command_fail corpus)."""
    _identifier(c)
    c.expect("[", "mapping key bracket")
    _operand(c)
    c.ws()
    c.expect("]")


def check_command(line: str) -> None:
    """Validate one finalize command line (command/mod.rs:64): mapping
    ops, rand.chacha, branch/position, await — or any instruction."""
    c = Cursor(line)
    c.ws()
    if c.tag("contains"):
        c.ws()
        _mapping_access(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif c.tag("get.or_use"):
        c.ws()
        _mapping_access(c)
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif c.tag("get"):
        c.ws()
        _mapping_access(c)
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
    elif c.tag("set"):
        _operand(c)
        c.ws()
        c.expect("into")
        c.ws()
        _mapping_access(c)
    elif c.tag("remove"):
        c.ws()
        _mapping_access(c)
    elif c.tag("rand.chacha"):
        n = 0
        while n < 2:
            m = c.save()
            c.ws()
            if c.s.startswith("into", c.i):
                c.restore(m)
                break
            try:
                _operand(c)
                n += 1
            except ParseError:
                c.restore(m)
                break
        c.ws()
        c.expect("into")
        c.ws()
        _register(c)
        c.ws()
        c.expect("as")
        _as_literal_type(c)
    elif c.tag("branch.eq") or c.tag("branch.neq"):
        _operand(c)
        _operand(c)
        c.ws()
        c.expect("to")
        c.ws()
        _identifier(c)
    elif c.tag("position"):
        c.ws()
        _identifier(c)
    elif c.tag("await"):
        c.ws()
        _register(c)
    else:
        check_instruction(line)
        return
    c.ws()
    c.expect(";")
    c.ws()
    if not c.eof():
        raise ParseError(f"trailing input {c.s[c.i:]!r}")


def check_finalize_positions(commands) -> None:
    """Structural checks the reference enforces WHILE parsing a finalize
    block (finalize/mod.rs:127-143): a branch may not target an
    already-defined (earlier) position, labels are unique, and at most
    u8::MAX positions exist. `commands` is [(op, label_or_None)]."""
    positions = set()
    for op, label in commands:
        if op in ("branch.eq", "branch.neq"):
            if label in positions:
                raise ParseError(f"cannot branch to earlier position {label}")
        elif op == "position":
            if label in positions:
                raise ParseError(f"cannot redefine position {label}")
            if len(positions) >= MAX_POSITIONS:
                raise ParseError("too many positions")
            positions.add(label)
