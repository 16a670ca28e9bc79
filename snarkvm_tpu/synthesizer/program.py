"""Aleo instruction program parser + in-memory representation.

Mirrors synthesizer/program/src (ProgramCore at lib.rs:108): the text
format with structs, records, mappings, closures, functions, finalize
blocks, and the 68-opcode instruction set (instruction/mod.rs:68-135).
Recursive-descent over the line-oriented grammar (the reference uses nom).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

# The full opcode inventory (68; instruction/mod.rs:68-135).
OPCODES = {
    "abs", "abs.w", "add", "add.w", "and", "assert.eq", "assert.neq", "async",
    "call", "cast", "cast.lossy", "commit.bhp256", "commit.bhp512",
    "commit.bhp768", "commit.bhp1024", "commit.ped64", "commit.ped128",
    "div", "div.w", "double", "gt", "gte", "hash.bhp256", "hash.bhp512",
    "hash.bhp768", "hash.bhp1024", "hash.keccak256", "hash.keccak384",
    "hash.keccak512", "hash.ped64", "hash.ped128", "hash.psd2", "hash.psd4",
    "hash.psd8", "hash.sha3_256", "hash.sha3_384", "hash.sha3_512",
    "hash_many.psd2", "hash_many.psd4", "hash_many.psd8", "inv", "is.eq",
    "is.neq", "lt", "lte", "mod", "mul", "mul.w", "nand", "neg", "nor",
    "not", "or", "pow", "pow.w", "rem", "rem.w", "shl", "shl.w", "shr",
    "shr.w", "sign.verify", "square", "sqrt", "sub", "sub.w", "ternary", "xor",
}

# finalize commands (command/mod.rs:64)
COMMANDS = {"contains", "get", "get.or_use", "set", "remove", "rand.chacha",
            "branch.eq", "branch.neq", "position", "await"}


@dataclass
class Instruction:
    opcode: str
    operands: list          # operand strings (registers/literals/specials)
    destinations: list      # "rN" or "rN.member" strings
    as_type: str | None = None


@dataclass
class FunctionInput:
    register: str
    value_type: str         # e.g. "i8.private", "token.record", "field.public"


@dataclass
class FunctionOutput:
    operand: str
    value_type: str


@dataclass
class Function:
    name: str
    inputs: list = field(default_factory=list)
    outputs: list = field(default_factory=list)
    instructions: list = field(default_factory=list)
    finalize_name: str | None = None


@dataclass
class Closure:
    name: str
    inputs: list = field(default_factory=list)
    outputs: list = field(default_factory=list)
    instructions: list = field(default_factory=list)


@dataclass
class Finalize:
    name: str
    inputs: list = field(default_factory=list)
    commands: list = field(default_factory=list)   # Instruction-like entries
    positions: dict = field(default_factory=dict)  # label -> command index


@dataclass
class StructType:
    name: str
    members: list  # [(member_name, type_str)]


@dataclass
class RecordType:
    name: str
    owner_visibility: str
    entries: list  # [(entry_name, type_str_with_visibility)]


@dataclass
class Mapping:
    name: str
    key_type: str
    value_type: str


@dataclass
class Program:
    id: str
    imports: list = field(default_factory=list)
    structs: dict = field(default_factory=dict)
    records: dict = field(default_factory=dict)
    mappings: dict = field(default_factory=dict)
    closures: dict = field(default_factory=dict)
    functions: dict = field(default_factory=dict)
    finalizes: dict = field(default_factory=dict)


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    return text


def parse_program(text: str) -> Program:
    text = _strip_comments(text)
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    prog = None
    ctx = None          # current block object
    ctx_kind = None
    i = 0
    for ln in lines:
        if ln.startswith("import "):
            m = re.match(r"import\s+([\w.]+);", ln)
            if prog is None:
                # imports appear before the program decl
                pass
            (prog.imports if prog else _pending_imports).append(m.group(1))
            continue
        if ln.startswith("program "):
            m = re.match(r"program\s+([\w.]+);", ln)
            prog = Program(id=m.group(1))
            prog.imports.extend(_pending_imports)
            _pending_imports.clear()
            ctx = None
            continue
        m = re.match(r"struct\s+(\w+):", ln)
        if m:
            ctx = StructType(m.group(1), [])
            prog.structs[ctx.name] = ctx
            ctx_kind = "struct"
            continue
        m = re.match(r"record\s+(\w+):", ln)
        if m:
            ctx = RecordType(m.group(1), "private", [])
            prog.records[ctx.name] = ctx
            ctx_kind = "record"
            continue
        m = re.match(r"mapping\s+(\w+):", ln)
        if m:
            ctx = Mapping(m.group(1), None, None)
            prog.mappings[ctx.name] = ctx
            ctx_kind = "mapping"
            continue
        m = re.match(r"closure\s+(\w+):", ln)
        if m:
            ctx = Closure(m.group(1))
            prog.closures[ctx.name] = ctx
            ctx_kind = "closure"
            continue
        m = re.match(r"function\s+(\w+):", ln)
        if m:
            ctx = Function(m.group(1))
            prog.functions[ctx.name] = ctx
            ctx_kind = "function"
            continue
        m = re.match(r"finalize\s+(\w+):", ln)
        if m:
            ctx = Finalize(m.group(1))
            prog.finalizes[ctx.name] = ctx
            ctx_kind = "finalize"
            continue

        assert ctx is not None, f"statement outside block: {ln}"
        if ctx_kind == "struct":
            m = re.match(r"(\w+)\s+as\s+([\w\[\];. ]+);", ln)
            ctx.members.append((m.group(1), m.group(2).strip()))
        elif ctx_kind == "record":
            m = re.match(r"(\w+)\s+as\s+([\w\[\];. ]+);", ln)
            name, ty = m.group(1), m.group(2).strip()
            if name == "owner":
                ctx.owner_visibility = ty.split(".")[-1]
            else:
                ctx.entries.append((name, ty))
        elif ctx_kind == "mapping":
            m = re.match(r"(key|value)\s+as\s+([\w.\[\] ]+);", ln)
            if m.group(1) == "key":
                ctx.key_type = m.group(2).strip()
            else:
                ctx.value_type = m.group(2).strip()
        else:
            _parse_statement(ctx, ctx_kind, ln)
    assert prog is not None, "no program declaration"
    # modern linkage: `finalize NAME:` blocks bind to the same-named
    # function (the in-function "finalize ..." statement is legacy)
    for fname, fn in prog.functions.items():
        if fname in prog.finalizes:
            fn.finalize_name = fname
    return prog


_pending_imports: list = []


def _parse_statement(ctx, ctx_kind, ln):
    assert ln.endswith(";"), f"missing semicolon: {ln}"
    ln = ln[:-1]
    m = re.match(r"input\s+(\S+)\s+as\s+(.+)", ln)
    if m:
        ctx.inputs.append(FunctionInput(m.group(1), m.group(2).strip()))
        return
    m = re.match(r"output\s+(\S+)\s+as\s+(.+)", ln)
    if m:
        ctx.outputs.append(FunctionOutput(m.group(1), m.group(2).strip()))
        return
    if ctx_kind == "function" and re.match(r"finalize\s", ln):
        # "finalize r0 r1 ..." is the legacy form; "async fn into rN" is modern
        ctx.finalize_name = ctx.name
    if ctx_kind == "finalize" and ln.startswith("position "):
        label = ln.split()[1]
        ctx.positions[label] = len(ctx.commands)
        ctx.commands.append(Instruction("position", [label], []))
        return

    tokens = ln.split()
    opcode = tokens[0]
    rest = tokens[1:]
    operands, dests, as_type = [], [], None
    mode = "operands"
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok == "into":
            mode = "dest"
        elif tok == "as":
            mode = "astype"
        elif tok == "to":
            mode = "branch_target"
            operands.append(("to", rest[i + 1]))
            i += 2
            continue
        elif mode == "operands":
            operands.append(tok)
        elif mode == "dest":
            dests.append(tok)
        elif mode == "astype":
            as_type = tok if as_type is None else as_type + " " + tok
        i += 1
    inst = Instruction(opcode, operands, dests, as_type)
    if ctx_kind == "finalize":
        ctx.commands.append(inst)
    else:
        ctx.instructions.append(inst)
