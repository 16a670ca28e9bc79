"""Dual console/circuit execution of Aleo functions.

The defining architectural idea of the reference (SURVEY.md §1): every
instruction runs twice in lock-step — natively on plaintext values and as
R1CS constraint synthesis (stack/execute.rs:276-321). Here the circuit
side runs over the gadget types in circuit/types.py; the produced
CircuitBuilder ejects an Assignment for Varuna.

Covered circuit opcodes (round-1 subset, widening each round): field/
boolean/integer add/sub/mul (+wrapped), double/square/inv, is.eq,
assert.eq/neq, ternary, and hash.psd{2,4,8} on field inputs.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
from ..circuit.types import CField, CBool, CInteger
from ..circuit import poseidon_gadget
from ..console.types import Literal, Plaintext, INT_WIDTHS
from ..console import network as N
from .interpreter import HaltError
from .process import Stack, _as_literal

R = P.R


class CircuitValue:
    """Wrapper pairing a console literal with its circuit gadget."""

    def __init__(self, literal: Literal, gadget):
        self.literal = literal
        self.gadget = gadget


def _inject(builder, lit: Literal, mode: str):
    t = lit.type_name
    if t == "field":
        return CircuitValue(lit, CField.new(builder, mode, lit.value))
    if t == "boolean":
        return CircuitValue(lit, CBool.new(builder, mode, lit.value))
    if t in INT_WIDTHS:
        return CircuitValue(lit, CInteger.new(builder, mode, lit.value, INT_WIDTHS[t], t[0] == "i"))
    raise HaltError(f"circuit injection unsupported for {t}")


def _hash_dest_cast(builder, field_gadget, dest_type: str, console):
    """Lossy destination cast of a hash output field/x-coordinate
    (cast_lossy semantics: integers take the low bits)."""
    if dest_type == "field":
        return field_gadget
    if dest_type in INT_WIDTHS:
        w = INT_WIDTHS[dest_type]
        bits = field_gadget.to_bits_le(253)
        return CInteger(builder, bits[:w], w, dest_type[0] == "i")
    return _inject(builder, console, PRIVATE).gadget


class DualStack:
    """Executes a function in both worlds; mirrors Stack::execute_function."""

    def __init__(self, stack: Stack):
        self.stack = stack

    def execute_function(self, name: str, inputs, input_visibility=None,
                         builder: CircuitBuilder | None = None,
                         input_gadgets=None, expose_outputs: bool = True):
        """inputs: console literals (or strings). Returns (outputs, builder).

        Public inputs become public circuit variables; private inputs
        private — per the function's declared visibility. When `builder`
        and `input_gadgets` are given (the request-verification path),
        inputs reuse the already-injected gadgets instead of re-injecting."""
        fn = self.stack.program.functions.get(name) or self.stack.program.closures.get(name)
        if fn is None:
            raise HaltError(f"no function {name}")
        builder = builder if builder is not None else CircuitBuilder()
        regs = {}
        for idx, (finput, value) in enumerate(zip(fn.inputs, inputs)):
            lit = value
            if isinstance(lit, str):
                from .process import parse_plaintext_str
                lit = parse_plaintext_str(lit)
            lit = _as_literal(lit) if not isinstance(lit, Literal) else lit
            if input_gadgets is not None:
                regs[finput.register] = CircuitValue(lit, input_gadgets[idx])
                continue
            vis = finput.value_type.split(".")[-1]
            mode = PUBLIC if vis == "public" else PRIVATE
            try:
                regs[finput.register] = _inject(builder, lit, mode)
            except HaltError:
                # no gadget type yet (scalar/group/...): console-only value;
                # instructions over it take the witness-fallback path
                regs[finput.register] = CircuitValue(lit, None)
        for inst in fn.instructions:
            self._execute(builder, inst, regs)
        outputs = []
        for out in fn.outputs:
            cv = regs[out.operand.split(".")[0]]
            outputs.append(cv)
            if not expose_outputs or cv.gadget is None:
                continue  # futures/gadgetless values have no public exposure
            # outputs surface as public variables (response commitments in the
            # full protocol; direct exposure in the run-mode circuit)
            pub = builder.new_public(builder.value_of(cv.gadget.lc)
                                     if isinstance(cv.gadget, (CField, CBool))
                                     else cv.gadget.to_field().value)
            if isinstance(cv.gadget, (CField, CBool)):
                builder.assert_eq(cv.gadget.lc, pub)
            else:
                builder.assert_eq(cv.gadget.to_field().lc, pub)
        assert builder.is_satisfied(), "circuit not satisfied after execution"
        return outputs, builder

    def _load(self, builder, regs, operand):
        if operand in regs:
            return regs[operand]
        from ..console.types import literal_from_str
        lit = literal_from_str(operand)
        return _inject(builder, lit, "constant")

    def _execute(self, builder, inst, regs):
        op = inst.opcode
        ld = lambda o: self._load(builder, regs, o)
        if op in ("add", "add.w", "sub", "sub.w", "mul", "mul.w"):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            t = a.literal.type_name
            from . import interpreter as I
            console = {"add": I.op_add, "add.w": I.op_add_wrapped, "sub": I.op_sub,
                       "sub.w": I.op_sub_wrapped, "mul": I.op_mul, "mul.w": I.op_mul_wrapped}[op](a.literal, b.literal)
            if t == "field":
                gadget = {"add": lambda: a.gadget + b.gadget, "sub": lambda: a.gadget - b.gadget,
                          "mul": lambda: a.gadget * b.gadget}[op.split(".")[0]]()
            elif t in INT_WIDTHS and isinstance(a.gadget, CInteger):
                ag, bg = a.gadget, b.gadget
                if op == "add" and t[0] == "u":
                    gadget = ag.add_checked(bg)
                elif op == "add.w":
                    gadget = ag.add_wrapped(bg)
                elif op == "sub" and t[0] == "u":
                    gadget = ag.sub_checked(bg)
                elif op == "sub.w":
                    gadget = ag.sub_wrapped(bg)
                elif op == "mul.w":
                    gadget = ag.mul_wrapped(bg)
                else:
                    gadget = _inject(builder, console, PRIVATE).gadget
            else:
                # fall back: re-inject the console result as a private witness
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("and", "or", "xor", "nand", "nor") and \
                isinstance(ld(inst.operands[0]).gadget, (CInteger, CBool)):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            console = {"and": I.op_and, "or": I.op_or, "xor": I.op_xor,
                       "nand": I.op_nand, "nor": I.op_nor}[op](a.literal, b.literal)
            if isinstance(a.gadget, CInteger):
                gadget = {"and": a.gadget.bitand, "or": a.gadget.bitor,
                          "xor": a.gadget.bitxor, "nand": a.gadget.nand_int,
                          "nor": a.gadget.nor_int}[op](b.gadget)
            else:
                gadget = {"and": lambda: a.gadget & b.gadget,
                          "or": lambda: a.gadget | b.gadget,
                          "xor": lambda: a.gadget ^ b.gadget,
                          "nand": lambda: ~(a.gadget & b.gadget),
                          "nor": lambda: ~(a.gadget | b.gadget)}[op]()
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op == "not" and isinstance(ld(inst.operands[0]).gadget, (CInteger, CBool)):
            a = ld(inst.operands[0])
            from . import interpreter as I
            console = I.op_not(a.literal)
            gadget = a.gadget.bitnot() if isinstance(a.gadget, CInteger) else ~a.gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("shl.w", "shr.w") and isinstance(ld(inst.operands[0]).gadget, CInteger) \
                and isinstance(ld(inst.operands[1]).gadget, CInteger):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            console = (I.op_shl_wrapped if op == "shl.w" else I.op_shr_wrapped)(a.literal, b.literal)
            gadget = (a.gadget.shl_wrapped if op == "shl.w" else a.gadget.shr_wrapped)(b.gadget)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op.startswith("commit."):
            a = ld(inst.operands[0])
            rand = ld(inst.operands[1])
            dest_type = (inst.as_type or "field").split(".")[0]
            from . import interpreter as I
            console = I.commit_instruction(op, a.literal, rand.literal, dest_type)
            t = a.literal.type_name
            if (t in ("field", "boolean") or t in INT_WIDTHS) and \
                    dest_type not in ("group", "address"):
                try:
                    from ..circuit.response_gadget import plaintext_bits_gadget
                    from ..circuit.inclusion_gadget import bhp_commit_gadget
                    from ..circuit.keccak_gadget import pedersen_commit_gadget
                    from ..params import bls12_377 as _P
                    bits = plaintext_bits_gadget(builder, a.gadget, t)
                    r = rand.literal.value % _P.S
                    rbits = [CBool.new(builder, PRIVATE, (r >> i) & 1 == 1)
                             for i in range(251)]
                    kind = op.split(".", 1)[1]
                    if kind.startswith("bhp"):
                        x = bhp_commit_gadget(builder, int(kind[3:]),
                                              f"AleoBHP{kind[3:]}", bits, rbits)
                    else:
                        x = pedersen_commit_gadget(builder, int(kind[3:]),
                                                   bits, rbits)
                    gadget = _hash_dest_cast(builder, x, dest_type, console)
                except (AssertionError, NotImplementedError):
                    gadget = _inject(builder, console, PRIVATE).gadget
            else:
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("lt", "lte", "gt", "gte") and isinstance(ld(inst.operands[0]).gadget, CInteger):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            console = {"lt": I.op_lt, "lte": I.op_lte, "gt": I.op_gt, "gte": I.op_gte}[op](a.literal, b.literal)
            gadget = {"lt": a.gadget.lt, "lte": a.gadget.lte,
                      "gt": a.gadget.gt, "gte": a.gadget.gte}[op](b.gadget)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("double", "square", "inv"):
            a = ld(inst.operands[0])
            from . import interpreter as I
            console = {"double": I.op_double, "square": I.op_square, "inv": I.op_inv}[op](a.literal)
            if a.literal.type_name == "field":
                gadget = {"double": lambda: a.gadget + a.gadget,
                          "square": lambda: a.gadget.square(),
                          "inv": lambda: a.gadget.inverse()}[op]()
            else:
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op == "is.eq":
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            eq_console = Literal("boolean", I.plaintext_eq(a.literal, b.literal))
            if isinstance(a.gadget, CField):
                gadget = a.gadget.is_equal(b.gadget)
            elif isinstance(a.gadget, CInteger):
                gadget = a.gadget.is_equal(b.gadget)
            else:
                gadget = ~(a.gadget ^ b.gadget)
            regs[inst.destinations[0]] = CircuitValue(eq_console, gadget)
            return
        if op in ("assert.eq", "assert.neq"):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            eq = I.plaintext_eq(a.literal, b.literal)
            if (op == "assert.eq") != eq:
                raise HaltError(f"{op} failed")
            if isinstance(a.gadget, CField):
                if op == "assert.eq":
                    a.gadget.assert_eq(b.gadget)
                else:
                    a.gadget.is_equal(b.gadget).__invert__().assert_true()
            elif isinstance(a.gadget, CInteger):
                flag = a.gadget.is_equal(b.gadget)
                (flag if op == "assert.eq" else ~flag).assert_true()
            return
        if op == "ternary":
            c, a, b = ld(inst.operands[0]), ld(inst.operands[1]), ld(inst.operands[2])
            from . import interpreter as I
            console = I.op_ternary(c.literal, a.literal, b.literal)
            if isinstance(a.gadget, CField):
                gadget = a.gadget.ternary(c.gadget, b.gadget)
            elif isinstance(a.gadget, CInteger) and isinstance(c.gadget, CBool):
                gadget = a.gadget.ternary(c.gadget, b.gadget)
            else:
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("hash.psd2", "hash.psd4", "hash.psd8"):
            a = ld(inst.operands[0])
            rate = int(op[-1])
            dest_type = (inst.as_type or "field").split(".")[0]
            from . import interpreter as I
            console = I.hash_instruction(op, a.literal, dest_type)
            t = a.literal.type_name
            if t in ("field", "boolean") or t in INT_WIDTHS:
                from ..circuit.response_gadget import plaintext_fields_gadget
                cfields = plaintext_fields_gadget(builder, a.gadget, t)
                out = poseidon_gadget.hash_psd(builder, rate, cfields)[0]
                gadget = _hash_dest_cast(builder, out, dest_type, console)
            else:
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op.startswith(("hash.bhp", "hash.ped", "hash.keccak", "hash.sha3")):
            a = ld(inst.operands[0])
            dest_type = (inst.as_type or "field").split(".")[0]
            from . import interpreter as I
            console = I.hash_instruction(op, a.literal, dest_type)
            t = a.literal.type_name
            if (t in ("field", "boolean") or t in INT_WIDTHS) and \
                    dest_type not in ("group", "address"):
                from ..circuit.response_gadget import plaintext_bits_gadget
                from ..circuit.bhp_gadget import bhp_hash_gadget
                from ..circuit.keccak_gadget import (keccak_hash_gadget,
                                                     pedersen_hash_gadget)
                try:
                    bits = plaintext_bits_gadget(builder, a.gadget, t)
                    kind = op.split(".", 1)[1]
                    if kind.startswith("bhp"):
                        x = bhp_hash_gadget(builder, int(kind[3:]),
                                            f"AleoBHP{kind[3:]}", bits)
                    elif kind.startswith("ped"):
                        x = pedersen_hash_gadget(builder, int(kind[3:]), bits)
                    else:
                        hk = "keccak" if kind.startswith("keccak") else "sha3"
                        variant = int(kind.replace("keccak", "").replace("sha3_", ""))
                        digest = keccak_hash_gadget(builder, hk, variant, bits)
                        bhp_variant = 256 if variant == 256 else 512
                        x = bhp_hash_gadget(builder, bhp_variant,
                                            f"AleoBHP{bhp_variant}", digest)
                    gadget = _hash_dest_cast(builder, x, dest_type, console)
                except (AssertionError, NotImplementedError):
                    # input shape outside the single-block gadget (multi-
                    # block BHP chaining is a follow-up) -> witness fallback
                    gadget = _inject(builder, console, PRIVATE).gadget
            else:
                gadget = _inject(builder, console, PRIVATE).gadget
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        # Generic fallback: run the instruction console-side through the
        # Stack dispatcher and re-inject results as private witnesses. This
        # keeps every console opcode circuit-executable (weakly constrained;
        # per-opcode gadgets replace these as they land).
        from .process import Registers
        creg = Registers()
        for name, cv in regs.items():
            creg.store(name, cv.literal)
        self.stack._execute(inst, creg)
        for d in inst.destinations:
            raw = creg.load(d)
            try:
                lit = _as_literal(raw)
            except HaltError:
                # non-literal console value (future/struct/record): flows
                # console-side only
                regs[d] = CircuitValue(raw, None)
                continue
            try:
                gadget = _inject(builder, lit, PRIVATE).gadget
            except HaltError:
                gadget = None  # non-injectable type; console value still flows
            regs[d] = CircuitValue(lit, gadget)


def prove_run(srs, stack: Stack, function: str, inputs, rng, mode=None):
    """Package::run analog (SURVEY.md §3.5): dual-execute + Varuna-prove.
    Returns (outputs, proof, vk, public_inputs)."""
    from ..snark import varuna
    mode = mode or varuna.VarunaNonHidingMode
    dual = DualStack(stack)
    outputs, builder = dual.execute_function(function, inputs)
    synth = builder.to_synthesizer()
    pk, vk = varuna.circuit_setup(srs, synth, mode)
    proof = varuna.prove_batch(srs, [(pk, [synth])], rng, mode)
    public = [1] + builder.public[1:]
    return outputs, proof, vk, public
