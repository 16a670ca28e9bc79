"""Epoch synthesis puzzle: sampled `puzzle.aleo` programs.

Mirror of ledger/puzzle/epoch/src/synthesis/ — the consensus-critical
program sampler:
  - RegisterTable (helpers/register_table.rs:16): the fixed 26-instruction
    preamble over 14 public inputs, the per-type register pools, and the
    next-locator counter starting at 40.
  - sample_instructions (helpers/mod.rs:39): ChaChaRng::seed_from_u64 over
    the low 8 bytes of the epoch hash, 100 draws from the weighted
    instruction table (choose_weighted = WeightedIndex<u16>), register/
    ephemeral/input operand resolution, duplicate-instruction rejection.
  - EpochProgram (program/mod.rs:56): program text assembly + parse,
    construct_inputs (program/construct_inputs.rs) from a per-solution
    ChaCha rng, to_leaves (program/to_leaves.rs): R1CS variable values as
    little-endian bit leaves padded to a power of ARITY=8 with 254-bit
    zero leaves.

The weighted table itself is extracted to JSON by
tools/extract_puzzle_table.py (resources/puzzle_instruction_set.json).
"""
from __future__ import annotations

import json
import os
from functools import lru_cache

from ..params import bls12_377 as P
from ..utils.chacha import ChaCha20Rng, WeightedIndex

NUM_INSTRUCTIONS = 100        # helpers/mod.rs:48
NUM_SEQUENCE_INSTRUCTIONS = 4  # helpers/mod.rs:50
NUM_PREAMBLE_INSTRUCTIONS = 26  # register_table.rs:286
ARITY = 8                      # program/mod.rs:31

_TYPE_NAME = {
    "Boolean": "boolean", "Field": "field",
    "I8": "i8", "I16": "i16", "I32": "i32", "I64": "i64", "I128": "i128",
    "U8": "u8", "U16": "u16", "U32": "u32", "U64": "u64", "U128": "u128",
}

_OPCODE = {
    "Abs": "abs", "AbsWrapped": "abs.w", "Add": "add", "AddWrapped": "add.w",
    "And": "and", "AssertEq": "assert.eq", "AssertNeq": "assert.neq",
    "BranchEq": "branch.eq", "BranchNeq": "branch.neq", "Cast": "cast",
    "CastLossy": "cast.lossy",
    "CommitBhp256": "commit.bhp256", "CommitBhp512": "commit.bhp512",
    "CommitBhp768": "commit.bhp768", "CommitBhp1024": "commit.bhp1024",
    "CommitPed64": "commit.ped64", "CommitPed128": "commit.ped128",
    "Div": "div", "DivWrapped": "div.w", "Double": "double",
    "Gt": "gt", "Gte": "gte",
    "HashBhp256": "hash.bhp256", "HashBhp512": "hash.bhp512",
    "HashBhp768": "hash.bhp768", "HashBhp1024": "hash.bhp1024",
    "HashKeccak256": "hash.keccak256", "HashKeccak384": "hash.keccak384",
    "HashKeccak512": "hash.keccak512",
    "HashPed64": "hash.ped64", "HashPed128": "hash.ped128",
    "HashPsd2": "hash.psd2", "HashPsd4": "hash.psd4", "HashPsd8": "hash.psd8",
    "HashSha3256": "hash.sha3_256", "HashSha3384": "hash.sha3_384",
    "HashSha3512": "hash.sha3_512",
    "Inv": "inv", "IsEq": "is.eq", "IsNeq": "is.neq", "Lt": "lt", "Lte": "lte",
    "Mod": "mod", "Mul": "mul", "MulWrapped": "mul.w", "Nand": "nand",
    "Neg": "neg", "Nor": "nor", "Not": "not", "Or": "or",
    "Pow": "pow", "PowWrapped": "pow.w", "Rem": "rem", "RemWrapped": "rem.w",
    "Shl": "shl", "ShlWrapped": "shl.w", "Shr": "shr", "ShrWrapped": "shr.w",
    "Sqrt": "sqrt", "Square": "square", "Sub": "sub", "SubWrapped": "sub.w",
    "Ternary": "ternary", "Xor": "xor",
}

# opcodes that append " as <type>" from their first table destination
# (helpers/mod.rs:196-229)
_TYPED_OPCODES = {
    "Cast", "CastLossy",
    "CommitBhp256", "CommitBhp512", "CommitBhp768", "CommitBhp1024",
    "CommitPed64", "CommitPed128",
    "HashBhp256", "HashBhp512", "HashBhp768", "HashBhp1024",
    "HashKeccak256", "HashKeccak384", "HashKeccak512",
    "HashPed64", "HashPed128", "HashPsd2", "HashPsd4", "HashPsd8",
    "HashSha3256", "HashSha3384", "HashSha3512",
}

INPUT_BLOCK = """
    input r0 as boolean.public;
    input r1 as boolean.public;
    input r2 as i8.public;
    input r3 as i8.public;
    input r4 as i16.public;
    input r5 as i16.public;
    input r6 as i32.public;
    input r7 as i32.public;
    input r8 as i64.public;
    input r9 as i64.public;
    input r10 as i128.public;
    input r11 as i128.public;
    input r12 as field.public;
    input r13 as field.public;

    is.eq r1 r0 into r14;
    is.eq r3 r2 into r15;
    is.eq r5 r4 into r16;
    is.eq r7 r6 into r17;
    is.eq r9 r8 into r18;
    is.eq r11 r10 into r19;

    hash.psd2 r12 into r20 as u8;
    hash.psd2 r13 into r21 as u8;

    hash.psd2 r12 into r22 as u16;
    hash.psd2 r13 into r23 as u16;

    hash.psd2 r12 into r24 as u32;
    hash.psd2 r13 into r25 as u32;

    hash.psd2 r12 into r26 as u64;
    hash.psd2 r13 into r27 as u64;

    hash.psd2 r12 into r28 as u128;
    hash.psd2 r13 into r29 as u128;

    mul.w r3 r2 into r30;
    mul.w r5 r4 into r31;
    mul.w r7 r6 into r32;
    mul.w r9 r8 into r33;
    mul.w r11 r10 into r34;

    ternary r15 r30 r2 into r35;
    ternary r16 r31 r4 into r36;
    ternary r17 r32 r6 into r37;
    ternary r18 r33 r8 into r38;
    ternary r19 r34 r10 into r39;
"""

INPUT_REGISTER_TYPES = [
    "boolean", "boolean", "i8", "i8", "i16", "i16", "i32", "i32",
    "i64", "i64", "i128", "i128", "field", "field",
]


class RegisterTable:
    """register_table.rs:16 — typed register pools over insertion order."""

    def __init__(self):
        self.input_registers = {
            "Boolean": ["r0", "r1"], "I8": ["r2", "r3"], "I16": ["r4", "r5"],
            "I32": ["r6", "r7"], "I64": ["r8", "r9"], "I128": ["r10", "r11"],
            "Field": ["r12", "r13"],
        }
        self.register_table = {
            "Boolean": ["r0", "r1"], "I8": ["r3", "r35"], "I16": ["r5", "r36"],
            "I32": ["r7", "r37"], "I64": ["r9", "r38"], "I128": ["r11", "r39"],
            "Field": ["r12", "r13"],
            "U8": ["r20", "r21"], "U16": ["r22", "r23"], "U32": ["r24", "r25"],
            "U64": ["r26", "r27"], "U128": ["r28", "r29"],
        }
        self.next_register_locator = 40

    def get_next_locator(self) -> int:
        loc = self.next_register_locator
        self.next_register_locator += 1
        return loc

    def insert(self, literal_type: str, register: str):
        regs = self.register_table[literal_type]
        if register not in regs:  # IndexSet semantics
            regs.append(register)

    def get_k_th_last_register(self, literal_type: str, k: int) -> str:
        regs = self.register_table[literal_type]
        index = max(len(regs) - k - 1, 0)  # saturating_sub chain
        return regs[index]

    def get_input_at_index(self, literal_type: str, index: int):
        regs = self.input_registers.get(literal_type)
        if regs is None or index >= len(regs):
            return None
        return regs[index]

    def contains_key(self, literal_type: str) -> bool:
        return literal_type in self.register_table


@lru_cache(maxsize=1)
def instruction_set():
    path = os.path.join(os.path.dirname(__file__), "..", "synthesizer",
                        "resources", "puzzle_instruction_set.json")
    return json.load(open(path))


@lru_cache(maxsize=1)
def _weighted_index():
    return WeightedIndex([e["weight"] for e in instruction_set()])


def sample_instructions(epoch_hash: int, register_table: RegisterTable):
    """helpers/mod.rs:39 — returns the ordered list of instruction strings."""
    lower = int(epoch_hash).to_bytes(32, "little")[:8]
    rng = ChaCha20Rng.seed_from_u64(int.from_bytes(lower, "little"))

    table = instruction_set()
    widx = _weighted_index()
    instructions: list[str] = []
    seen: set[str] = set()
    opcode_count = 0

    for _ in range(NUM_INSTRUCTIONS):
        if opcode_count > NUM_INSTRUCTIONS - NUM_SEQUENCE_INSTRUCTIONS:
            break
        entry = table[widx.sample(rng)]
        cache_ephemeral: dict[int, str] = {}
        constructed = []
        abort = False

        for inst in entry["sequence"]:
            name = inst["instruction"]
            if name in ("BranchEq", "BranchNeq"):
                abort = True
                break
            operands = []
            cache_types: dict[str, int] = {}
            for op in inst["operands"]:
                kind = op["kind"]
                if kind == "Literal":
                    operands.append(op["text"])
                elif kind == "Ephemeral":
                    reg = cache_ephemeral.get(op["index"])
                    if reg is None:
                        abort = True
                        break
                    operands.append(reg)
                elif kind == "Input":
                    reg = register_table.get_input_at_index(op["type"], op["index"])
                    if reg is None:
                        abort = True
                        break
                    operands.append(reg)
                elif kind == "Register":
                    t = op["type"]
                    if not register_table.contains_key(t):
                        abort = True
                        break
                    if t in cache_types:
                        cache_types[t] += 1
                    else:
                        cache_types[t] = 0
                    operands.append(
                        register_table.get_k_th_last_register(t, cache_types[t]))
                elif kind == "RegisterOffset":
                    t = op["type"]
                    if not register_table.contains_key(t):
                        abort = True
                        break
                    operands.append(
                        register_table.get_k_th_last_register(t, op["index"]))
                else:
                    raise ValueError(f"operand kind {kind}")
            if abort:
                break

            destinations = []
            for dest in inst["destinations"]:
                reg = f"r{register_table.get_next_locator()}"
                if dest["kind"] == "Ephemeral":
                    cache_ephemeral[dest["index"]] = reg
                else:
                    register_table.insert(dest["type"], reg)
                destinations.append(reg)

            text = f"{_OPCODE[name]} {' '.join(operands)} into {' '.join(destinations)}"
            if name in _TYPED_OPCODES:
                if not inst["destinations"]:
                    abort = True
                    break
                text += f" as {_TYPE_NAME[inst['destinations'][0]['type']]}"
            text += ";"

            if text in seen:
                abort = True
                break
            constructed.append(text)

        if abort:
            continue
        for text in constructed:
            seen.add(text)
            instructions.append(text)
            opcode_count += 1

    return instructions


class EpochProgram:
    """program/mod.rs:56 — the sampled puzzle.aleo program for an epoch."""

    def __init__(self, epoch_hash: int):
        self.epoch_hash = int(epoch_hash)
        self.register_table = RegisterTable()
        self.instructions = sample_instructions(self.epoch_hash, self.register_table)
        body = "".join(f"    {i}\n" for i in self.instructions)
        self.text = (f"program puzzle.aleo;\n\nfunction synthesize:\n"
                     f"{INPUT_BLOCK}\n{body}\n")
        from ..synthesizer.program import parse_program
        from ..synthesizer.process import Stack
        self.stack = Stack(parse_program(self.text))

    def construct_inputs(self, rng: ChaCha20Rng):
        """program/construct_inputs.rs:10 — Literal list in input order."""
        from ..console.types import Literal, INT_WIDTHS
        inputs = []
        for t in INPUT_REGISTER_TYPES:
            if t == "boolean":
                inputs.append(Literal("boolean", rng.gen_bool()))
            elif t == "field":
                v = rng.rand_field(P.R, 3)
                if v == 0:
                    raise ValueError("Invalid input, zero field element found")
                inputs.append(Literal("field", v))
            else:
                inputs.append(Literal(t, rng.gen_int(INT_WIDTHS[t])))
        return inputs

    def to_r1cs(self, console_inputs):
        """program/to_r1cs.rs:14 — synthesize the circuit with all-public
        inputs; returns the satisfied CircuitBuilder."""
        from ..synthesizer.circuit_exec import DualStack
        dual = DualStack(self.stack)
        _, builder = dual.execute_function("synthesize", list(console_inputs))
        return builder

    def to_leaves(self, console_inputs):
        """program/to_leaves.rs:9 — variable values (public then private) as
        LE bit-vectors, padded to a power of 8 with 254-bit zero leaves."""
        builder = self.to_r1cs(console_inputs)
        leaves = []
        for v in builder.public:
            leaves.append(_bits_le(v, 253))
        for v in builder.private:
            leaves.append(_bits_le(v, 253))
        n = 1
        while n < len(leaves):
            n *= ARITY
        leaves.extend([[False] * 254] * (n - len(leaves)))
        return leaves


def _bits_le(value: int, width: int):
    return [(value >> i) & 1 == 1 for i in range(width)]
