"""Network-wide program/function/argument blocklists with block-height
ranges — the TPU build's equivalent of `synthesizer/src/restrictions/`
(reference: mod.rs:32 `Restrictions`, helpers/block_range.rs `BlockRange`,
helpers/argument_locator.rs `ArgumentLocator`).

The restrictions ID commits to the full list contents via BHP-1024 over a
field-element preimage (mod.rs:217 `compute_restrictions_id`); the mainnet
list ships empty with ID
7562506206353711030068167991213732850758501012603348777370400520506564970105field
(parameters/src/mainnet/resources/restrictions.json) — reproduced here as
a golden test (tests/test_restrictions.py).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..console import network as N
from ..console.types import (
    Identifier, Literal, Plaintext, literal_from_str, literal_to_str,
    int_to_bits_le,
)

FIELD_BITS = 253
_NEG_ONE = None  # lazily N.R - 1


def _neg_one() -> int:
    return N.R - 1


@dataclass(frozen=True)
class BlockRange:
    """helpers/block_range.rs — five Rust range variants over u32 heights."""
    kind: str          # "range" | "from" | "to" | "inclusive" | "full"
    start: int | None = None
    end: int | None = None

    def contains(self, height: int) -> bool:
        if self.kind == "range":
            return self.start <= height < self.end
        if self.kind == "from":
            return height >= self.start
        if self.kind == "to":
            return height < self.end
        if self.kind == "inclusive":
            return self.start <= height <= self.end
        return True  # full

    def to_fields(self) -> list[int]:
        """block_range.rs to_fields: [variant u8, start|−1, end|−1]."""
        neg = _neg_one()
        if self.kind == "range":
            return [0, self.start, self.end]
        if self.kind == "from":
            return [1, self.start, neg]
        if self.kind == "to":
            return [2, neg, self.end]
        if self.kind == "inclusive":
            return [3, self.start, self.end]
        return [4, neg, neg]

    # serde-compatible JSON (externally tagged enum)
    def to_json(self):
        if self.kind == "range":
            return {"Range": [self.start, self.end]}
        if self.kind == "from":
            return {"RangeFrom": self.start}
        if self.kind == "to":
            return {"RangeTo": self.end}
        if self.kind == "inclusive":
            return {"RangeInclusive": [self.start, self.end]}
        return "FullRange"

    @classmethod
    def from_json(cls, v):
        if v == "FullRange":
            return cls("full")
        (tag, payload), = v.items()
        if tag == "Range":
            return cls("range", payload[0], payload[1])
        if tag == "RangeFrom":
            return cls("from", payload)
        if tag == "RangeTo":
            return cls("to", end=payload)
        if tag == "RangeInclusive":
            return cls("inclusive", payload[0], payload[1])
        raise ValueError(f"unknown BlockRange variant {tag!r}")


@dataclass(frozen=True)
class ArgumentLocator:
    """helpers/argument_locator.rs — `{is_input}/{index}`."""
    is_input: bool
    index: int

    def __str__(self):
        return f"{'true' if self.is_input else 'false'}/{self.index}"

    @classmethod
    def parse(cls, s: str) -> "ArgumentLocator":
        flag, idx = s.split("/")
        return cls(flag == "true", int(idx))


def _split_locator(locator: str) -> tuple[str, str]:
    """'prog.aleo/fn' -> (program_id, function_name)."""
    prog, fn = locator.split("/")
    return prog, fn


def _program_id_fields(program_id: str) -> list[int]:
    """ProgramID::to_fields = [name.to_field(), network.to_field()]."""
    name, network = program_id.rsplit(".", 1)
    return [Identifier(name).to_field(), Identifier(network).to_field()]


class Restrictions:
    """synthesizer/src/restrictions/mod.rs:32."""

    def __init__(self, programs=None, functions=None, arguments=None,
                 restrictions_id: int | None = None):
        # program_id -> BlockRange
        self.programs: dict[str, BlockRange] = dict(programs or {})
        # (program_id, function) -> BlockRange
        self.functions: dict[tuple[str, str], BlockRange] = dict(functions or {})
        # (program_id, function) -> {ArgumentLocator -> [(Literal, BlockRange)]}
        self.arguments: dict = {k: {al: list(lits) for al, lits in v.items()}
                                for k, v in (arguments or {}).items()}
        self.restrictions_id = (restrictions_id
                                if restrictions_id is not None
                                else self.compute_restrictions_id())

    # ---- ID ----------------------------------------------------------
    def compute_restrictions_id(self) -> int:
        """mod.rs:217 — BHP-1024 over the field-element preimage bits."""
        preimage: list[int] = [len(self.programs)]
        for program_id, rng in self.programs.items():
            preimage += _program_id_fields(program_id)
            preimage += rng.to_fields()
        preimage.append(len(self.functions))
        for (program_id, fn), rng in self.functions.items():
            preimage += _program_id_fields(program_id)
            preimage.append(Identifier(fn).to_field())
            preimage += rng.to_fields()
        preimage.append(len(self.arguments))
        for (program_id, fn), entries in self.arguments.items():
            preimage += _program_id_fields(program_id)
            preimage.append(Identifier(fn).to_field())
            preimage.append(len(entries))
            for arg_loc, literal_ranges in entries.items():
                preimage.append(1 if arg_loc.is_input else 0)
                preimage.append(arg_loc.index)
                preimage.append(len(literal_ranges))
                for literal, rng in literal_ranges:
                    preimage += Plaintext("literal", literal).to_fields()
                    preimage += rng.to_fields()
        bits = []
        for f in preimage:
            bits += int_to_bits_le(f % N.R, FIELD_BITS)
        return N.hash_bhp(1024, bits)

    # ---- queries (mod.rs:116-185) ------------------------------------
    def is_program_restricted(self, program_id: str, height: int) -> bool:
        rng = self.programs.get(program_id)
        return rng is not None and rng.contains(height)

    def is_function_restricted(self, program_id: str, function_name: str,
                               height: int) -> bool:
        rng = self.functions.get((program_id, function_name))
        return rng is not None and rng.contains(height)

    def is_argument_restricted(self, transition, height: int) -> bool:
        entries = self.arguments.get(
            (transition.program_id, transition.function_name))
        if not entries:
            return False
        in_vals = getattr(transition, "input_values", None) or []
        out_vals = getattr(transition, "output_values", None) or []
        for arg_loc, literal_ranges in entries.items():
            vals = in_vals if arg_loc.is_input else out_vals
            if arg_loc.index >= len(vals):
                continue
            v = vals[arg_loc.index]
            # only plain literal arguments participate (mod.rs: Constant/
            # Public inputs & outputs whose plaintext is a Literal)
            lit = None
            if isinstance(v, Literal):
                lit = v
            elif isinstance(v, Plaintext) and v.kind == "literal":
                lit = v.value
            if lit is None:
                continue
            for literal, rng in literal_ranges:
                if literal == lit and rng.contains(height):
                    return True
        return False

    def contains_restricted_transitions(self, transitions, height: int) -> bool:
        """mod.rs:188 — any restricted transition in the execution?"""
        for t in transitions:
            if self.is_program_restricted(t.program_id, height):
                return True
            if self.is_function_restricted(t.program_id, t.function_name, height):
                return True
            if self.is_argument_restricted(t, height):
                return True
        return False

    # ---- serde-compatible JSON (serialize.rs) -------------------------
    def to_json_str(self) -> str:
        args = {}
        for (prog, fn), entries in self.arguments.items():
            args[f"{prog}/{fn}"] = {
                str(al): {literal_to_str(lit): rng.to_json()
                          for lit, rng in lits}
                for al, lits in entries.items()}
        return json.dumps({
            "restrictions_id": f"{self.restrictions_id}field",
            "programs": {p: r.to_json() for p, r in self.programs.items()},
            "functions": {f"{p}/{f}": r.to_json()
                          for (p, f), r in self.functions.items()},
            "arguments": args,
        }, indent=2)

    @classmethod
    def from_json_str(cls, s: str) -> "Restrictions":
        data = json.loads(s)
        programs = {p: BlockRange.from_json(r)
                    for p, r in data.get("programs", {}).items()}
        functions = {_split_locator(loc): BlockRange.from_json(r)
                     for loc, r in data.get("functions", {}).items()}
        arguments = {}
        for loc, entries in data.get("arguments", {}).items():
            key = _split_locator(loc)
            arguments[key] = {
                ArgumentLocator.parse(al): [
                    (literal_from_str(lit_s), BlockRange.from_json(r))
                    for lit_s, r in lits.items()]
                for al, lits in entries.items()}
        out = cls(programs, functions, arguments)
        want = data.get("restrictions_id")
        if want is not None:
            want_int = int(want.removesuffix("field"))
            if want_int != out.restrictions_id:
                raise ValueError(
                    f"restrictions ID mismatch: listed {want_int}, "
                    f"computed {out.restrictions_id}")
        return out

    @classmethod
    def new_blank(cls) -> "Restrictions":
        return cls()

    @classmethod
    def load_mainnet(cls) -> "Restrictions":
        """N::restrictions_list_as_str() — mainnet ships an empty list."""
        return cls.new_blank()
