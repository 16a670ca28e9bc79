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
from ..circuit.types import (CField, CBool, CInteger, CGroup, CScalar,
                             CAddress)
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


class FutureGadget:
    """Circuit-side finalize future (circuit/program/src/data/future):
    the console Future plus the argument gadgets, so the response
    output-ID hash can recompose Future::to_fields from bound bits."""

    def __init__(self, future, arg_gadgets):
        self.future = future          # console Future
        self.arg_gadgets = arg_gadgets  # [(type_name, gadget|None, console_arg)]


def _inject(builder, lit: Literal, mode: str):
    t = lit.type_name
    if t == "field":
        return CircuitValue(lit, CField.new(builder, mode, lit.value))
    if t == "boolean":
        return CircuitValue(lit, CBool.new(builder, mode, lit.value))
    if t in INT_WIDTHS:
        return CircuitValue(lit, CInteger.new(builder, mode, lit.value, INT_WIDTHS[t], t[0] == "i"))
    if t == "group":
        return CircuitValue(lit, CGroup.new(builder, mode, lit.value))
    if t == "scalar":
        return CircuitValue(lit, CScalar.new(builder, mode, lit.value))
    if t == "address":
        return CircuitValue(lit, CAddress.new(builder, mode, lit.value))
    if t == "string":
        from ..circuit.types import CString
        return CircuitValue(lit, CString.new(builder, mode, lit.value))
    raise HaltError(f"circuit injection unsupported for {t}")


def _hash_dest_cast(builder, field_gadget, dest_type: str, console):
    """Lossy destination cast of a hash output field/x-coordinate
    (cast_lossy semantics: integers/scalars take the low bits of the
    CANONICAL decomposition — non-canonical bits would be malleable)."""
    if dest_type == "field":
        return field_gadget
    if dest_type in INT_WIDTHS:
        w = INT_WIDTHS[dest_type]
        bits = field_gadget.to_bits_le(253, canonical=True)
        return CInteger(builder, bits[:w], w, dest_type[0] == "i")
    if dest_type == "scalar":
        # from_field_lossy: truncate to 250 bits (< S by construction)
        return CScalar.from_field_lossy(builder, field_gadget)
    if dest_type == "boolean":
        bits = field_gadget.to_bits_le(253, canonical=True)
        return bits[0]
    return _inject(builder, console, PRIVATE).gadget


def _subgroup_point_gadget(builder, x_field: CField, console_pt):
    """Witness the subgroup point with the given x-coordinate: witness Q
    on-curve with 4Q = P (multiplication by the cofactor surjects onto
    the prime-order subgroup since gcd(4, r) = 1), bind P.x to x_field."""
    from ..curves import edwards as ed
    from ..fields.scalar import Fr
    # console quarter-point: Q = (1/4 mod r) * P
    inv4 = pow(4, -1, P.S)
    q_c = ed.mul(console_pt, inv4)
    Q = CGroup.new(builder, PRIVATE, q_c)     # on-curve enforced by new()
    Pg = Q.double().double()
    builder.assert_eq(Pg.x.lc, x_field.lc)
    return Pg


def cast_gadget(builder, gadget, src: str, dest: str, lossy: bool, console):
    """Circuit cast/cast.lossy between literal types (circuit mirrors of
    console cast_literal, interpreter.py:381; reference
    circuit/types/*/src/from_bits.rs + cast_lossy semantics). Returns the
    destination gadget or None when the combination is out of gadget
    scope (caller falls back loudly)."""
    from ..curves import edwards as ed
    INT = INT_WIDTHS

    def int_signed_lc(g: CInteger):
        lc = g.to_field().lc
        if g.signed:
            lc = lc.add(g.msb.lc, R - (1 << g.width) % R)
        return lc

    if dest == src:
        return gadget
    # group/address interchange + x-coordinate views
    if isinstance(gadget, CAddress):
        gadget, src = gadget.group, "group"
        if dest == "address":
            return CAddress(builder, gadget)
    if isinstance(gadget, CGroup):
        if dest == "address":
            return CAddress(builder, gadget)
        # everything else goes through the x-coordinate field
        return cast_gadget(builder, gadget.x, "field", dest, lossy, console)
    if isinstance(gadget, CBool):
        if dest == "field":
            return CField(builder, gadget.lc)
        if dest in INT:
            zero = CBool.constant(builder, False)
            return CInteger(builder, [gadget] + [zero] * (INT[dest] - 1),
                            INT[dest], dest[0] == "i")
        if dest == "scalar":
            return CScalar.from_bits_le(builder, [gadget])
        return None
    if isinstance(gadget, CInteger):
        if dest == "field":
            return CField(builder, gadget.to_field().lc)
        if dest == "scalar":
            return CScalar.from_bits_le(builder, list(gadget.bits))
        if dest == "boolean":
            if lossy:
                return gadget.bits[0]
            hi = LinearCombination(0)
            for bt in gadget.bits[1:]:
                hi = hi.add(bt.lc, 1)
            builder.assert_eq(hi, LinearCombination(0))
            return gadget.bits[0]
        if dest in INT:
            w2, s2 = INT[dest], dest[0] == "i"
            w1 = gadget.width
            if lossy:
                if w2 <= w1:
                    return CInteger(builder, gadget.bits[:w2], w2, s2)
                fill = gadget.msb if gadget.signed \
                    else CBool.constant(builder, False)
                return CInteger(builder,
                                list(gadget.bits) + [fill] * (w2 - w1), w2, s2)
            # checked: witness dest bits, equate SIGNED field embeddings
            out = CInteger.new(builder, PRIVATE, console.value, w2, s2)
            builder.assert_eq(int_signed_lc(gadget), int_signed_lc(out))
            return out
        if dest in ("group", "address"):
            # group_from_x(uv): x = unsigned value as field
            pt = _subgroup_point_gadget(
                builder, CField(builder, gadget.to_field().lc), console.value)
            return CAddress(builder, pt) if dest == "address" else pt
        return None
    if isinstance(gadget, CScalar):
        if dest == "field":
            return CField(builder, gadget.to_field().lc)
        if dest in INT:
            w2, s2 = INT[dest], dest[0] == "i"
            if lossy:
                return CInteger(builder, gadget.bits[:w2], w2, s2)
            cut = w2 - 1 if s2 else w2
            hi = LinearCombination(0)
            for bt in gadget.bits[cut:]:
                hi = hi.add(bt.lc, 1)
            builder.assert_eq(hi, LinearCombination(0))
            return CInteger(builder, gadget.bits[:w2], w2, s2)
        return None
    if isinstance(gadget, CField):
        if dest in INT:
            w2, s2 = INT[dest], dest[0] == "i"
            bits = gadget.to_bits_le(253, canonical=True)
            if not lossy:
                cut = w2 - 1 if s2 else w2
                hi = LinearCombination(0)
                for bt in bits[cut:]:
                    hi = hi.add(bt.lc, 1)
                builder.assert_eq(hi, LinearCombination(0))
            return CInteger(builder, bits[:w2], w2, s2)
        if dest == "scalar":
            if lossy:
                return CScalar.from_field_lossy(builder, gadget)
            return CScalar.from_field(builder, gadget)
        if dest == "boolean":
            if lossy:
                return gadget.to_bits_le(253, canonical=True)[0]
            # checked: field must be 0/1: f * (f - 1) = 0
            builder.enforce(gadget.lc, gadget.lc.add(LinearCombination(R - 1)),
                            LinearCombination(0))
            return CBool(builder, gadget.lc)
        if dest in ("group", "address") and not lossy:
            pt = _subgroup_point_gadget(builder, gadget, console.value)
            return CAddress(builder, pt) if dest == "address" else pt
        # lossy field->group has the generator/Elligator fallback chain —
        # out of gadget scope for now
        return None
    return None


class DualStack:
    """Executes a function in both worlds; mirrors Stack::execute_function."""

    def __init__(self, stack: Stack):
        self.stack = stack
        # ops whose circuit side fell back to an unconstrained private
        # witness this execution: [(opcode, type)] — exposed so callers
        # (deployments, tests) can see exactly what is weakly constrained
        self.weak_ops = []

    def _weak_witness(self, builder, op, console):
        """LOUD witness fallback: the console result enters the circuit as
        an unconstrained private witness. Recorded in self.weak_ops.

        STRICT BY DEFAULT (VERDICT r4 #4): the reference never synthesizes
        unconstrained ops (circuit/types/* has a real gadget for every
        op x type combination), so an uncovered combination raises.
        SNARKVM_TPU_STRICT_CIRCUIT=0 opts into the weak-witness fallback
        for development runs only; deployments reject weak synthesis
        regardless (synthesizer/deploy.py)."""
        import os
        self.weak_ops.append((op, console.type_name
                              if hasattr(console, "type_name") else "?"))
        if os.environ.get("SNARKVM_TPU_STRICT_CIRCUIT", "1") != "0":
            raise HaltError(
                f"no circuit gadget for {op} over "
                f"{getattr(console, 'type_name', '?')} (strict mode)")
        import logging
        logging.getLogger(__name__).warning(
            "circuit fallback: %s over %s is weakly constrained",
            op, getattr(console, "type_name", "?"))
        try:
            return _inject(builder, console, PRIVATE).gadget
        except HaltError:
            return None

    def execute_function(self, name: str, inputs, input_visibility=None,
                         builder: CircuitBuilder | None = None,
                         input_gadgets=None, expose_outputs: bool = True,
                         ctx=None):
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
        self._ctx = ctx
        self._tvk_console = (builder.value_of(ctx.tvk.lc)
                             if ctx is not None else None)
        if ctx is not None:
            # bind self.signer / self.caller to the request-verification
            # gadgets (stack/execute.rs:245-252 set_signer/caller_circuit)
            regs["self.signer"] = CircuitValue(
                Literal("address", (ctx.signer.x.value, ctx.signer.y.value)),
                CAddress(builder, ctx.signer))
            regs["self.caller"] = CircuitValue(
                Literal("address", (ctx.caller.x.value, ctx.caller.y.value)),
                CAddress(builder, ctx.caller))
        for idx, (finput, value) in enumerate(zip(fn.inputs, inputs)):
            lit = value
            if isinstance(lit, str):
                from .process import parse_plaintext_str
                lit = parse_plaintext_str(lit)
            from ..console.record import Record as _Record
            if isinstance(lit, Plaintext) and lit.kind != "literal":
                pass                          # struct/array plaintext as-is
            elif not isinstance(lit, (Literal, _Record)):
                lit = _as_literal(lit)
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
            if not expose_outputs or cv.gadget is None or isinstance(cv.gadget, FutureGadget):
                continue  # futures/gadgetless values have no public exposure
            # outputs surface as public variables (response commitments in the
            # full protocol; direct exposure in the run-mode circuit)
            if isinstance(cv.gadget, (CField, CBool)):
                pub = builder.new_public(builder.value_of(cv.gadget.lc))
                builder.assert_eq(cv.gadget.lc, pub)
            elif isinstance(cv.gadget, CGroup):
                for coord in (cv.gadget.x, cv.gadget.y):
                    pub = builder.new_public(coord.value)
                    builder.assert_eq(coord.lc, pub)
            elif isinstance(cv.gadget, CAddress):
                for coord in (cv.gadget.group.x, cv.gadget.group.y):
                    pub = builder.new_public(coord.value)
                    builder.assert_eq(coord.lc, pub)
            else:
                f = cv.gadget.to_field()
                pub = builder.new_public(f.value)
                builder.assert_eq(f.lc, pub)
        assert builder.is_satisfied(), "circuit not satisfied after execution"
        return outputs, builder

    def _load(self, builder, regs, operand):
        if operand in regs:
            return regs[operand]
        base = operand.split(".", 1)[0]
        if "." in operand and base in regs:
            # record/struct member access (stack/registers load_member)
            cv = regs[base]
            member = operand.split(".", 1)[1]
            from ..circuit.record_gadget import RecordGadget
            from ..circuit.types import CStruct
            from ..console.record import Record
            if isinstance(cv.gadget, CStruct):
                for ident, tname, g in cv.gadget.members:
                    if ident.name == member:
                        pt = dict((i.name, v) for i, v in
                                  cv.gadget.plaintext.value)[member]
                        lit = pt.value if pt.kind == "literal" else pt
                        return CircuitValue(lit, g)
                raise HaltError(f"struct has no member '{member}'")
            if isinstance(cv.gadget, RecordGadget):
                if member == "owner":
                    rec = cv.gadget.record
                    return CircuitValue(Literal("address", rec.owner),
                                        cv.gadget.owner)
                for ident, vis, lit, g in cv.gadget.data:
                    if ident.name == member:
                        return CircuitValue(lit, g)
                raise HaltError(f"record has no entry '{member}'")
            if isinstance(cv.literal, Record) and cv.gadget is None:
                rec = cv.literal
                if member == "owner":
                    return CircuitValue(Literal("address", rec.owner), None)
                for ident, entry in rec.data:
                    if ident.name == member:
                        val = entry.value
                        lit = val.value if hasattr(val, "kind") and \
                            val.kind == "literal" else val
                        return CircuitValue(lit, None)
                raise HaltError(f"record has no entry '{member}'")
        from ..console.types import literal_from_str
        lit = literal_from_str(operand)
        return _inject(builder, lit, "constant")

    def _execute(self, builder, inst, regs):
        op = inst.opcode
        ld = lambda o: self._load(builder, regs, o)
        if op == "async":
            # `async fn r0 ... into rN` -> FutureGadget carrying the
            # argument gadgets (the response hashes Future::to_fields
            # from these bound bits)
            from ..console.types import Value, future_from_value
            fname = inst.operands[0]
            args_cv = [ld(o) for o in inst.operands[1:]]
            fut_v = Value("future", (self.stack.program.id, fname,
                                     [cv.literal for cv in args_cv]))
            fut = future_from_value(fut_v)
            arg_gadgets = []
            for cv in args_cv:
                if isinstance(cv.gadget, FutureGadget):
                    # child-call future argument: carry the BOUND gadget so
                    # this future's field hash commits to the child's bits
                    arg_gadgets.append(("future", cv.gadget, cv.literal))
                    continue
                tname = getattr(cv.literal, "type_name", None)
                arg_gadgets.append((tname, cv.gadget if tname else None,
                                    cv.literal))
            regs[inst.destinations[0]] = CircuitValue(
                fut_v, FutureGadget(fut, arg_gadgets))
            return
        if op == "call":
            # external/internal FUNCTION call -> child transition + the
            # call-site gadget (stack/call/mod.rs:396: child tcm/input
            # ids/output ids as parent publics). Closures fall through to
            # the generic console path below.
            callee = inst.operands[0]
            pid, fname = (callee.split("/", 1) if "/" in callee
                          else (self.stack.program.id, callee))
            sub = (self.stack if pid == self.stack.program.id
                   else (self.stack.external or {}).get(pid))
            if sub is not None and fname in sub.program.functions:
                args_cv = [ld(o) for o in inst.operands[1:]]
                runner = getattr(self, "call_runner", None)
                if runner is None:
                    raise HaltError(
                        "external function call requires call-tree "
                        "execution (authorize + execute_authorization)")
                child_tt, child_req, child_types = runner(
                    self.stack.program.id)
                from ..circuit.call_gadget import external_call_gadget
                out_cvs = external_call_gadget(
                    builder, sub, child_req, child_types, args_cv, child_tt)
                for dest, cv in zip(inst.destinations, out_cvs):
                    regs[dest] = cv
                return
        if op in ("add", "add.w", "sub", "sub.w", "mul", "mul.w",
                  "div", "div.w", "rem", "rem.w", "mod"):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            t = a.literal.type_name
            from . import interpreter as I
            console = {"add": I.op_add, "add.w": I.op_add_wrapped,
                       "sub": I.op_sub, "sub.w": I.op_sub_wrapped,
                       "mul": I.op_mul, "mul.w": I.op_mul_wrapped,
                       "div": I.op_div, "div.w": I.op_div_wrapped,
                       "rem": I.op_rem, "rem.w": I.op_rem_wrapped,
                       "mod": I.op_modulo}[op](a.literal, b.literal)
            if t == "field" and op in ("add", "sub", "mul", "div"):
                gadget = {"add": lambda: a.gadget + b.gadget,
                          "sub": lambda: a.gadget - b.gadget,
                          "mul": lambda: a.gadget * b.gadget,
                          "div": lambda: a.gadget.div(b.gadget)}[op]()
            elif t == "group" and op in ("add", "sub") and \
                    isinstance(a.gadget, CGroup):
                gadget = (a.gadget + b.gadget) if op == "add" \
                    else (a.gadget - b.gadget)
            elif t == "scalar" and op == "add" and \
                    isinstance(a.gadget, CScalar):
                gadget = a.gadget + b.gadget
            elif op == "mul" and isinstance(a.gadget, CGroup) and \
                    isinstance(b.gadget, CScalar):
                gadget = a.gadget.mul_scalar(b.gadget)
            elif op == "mul" and isinstance(a.gadget, CScalar) and \
                    isinstance(b.gadget, CGroup):
                gadget = b.gadget.mul_scalar(a.gadget)
            elif t in INT_WIDTHS and isinstance(a.gadget, CInteger):
                ag, bg = a.gadget, b.gadget
                gadget = {"add": ag.add_checked, "add.w": ag.add_wrapped,
                          "sub": ag.sub_checked, "sub.w": ag.sub_wrapped,
                          "mul": ag.mul_checked, "mul.w": ag.mul_wrapped,
                          "div": ag.div_checked, "div.w": ag.div_wrapped,
                          "rem": ag.rem_checked, "rem.w": ag.rem_wrapped,
                          "mod": ag.modulo}[op](bg)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("pow", "pow.w"):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            t = a.literal.type_name
            from . import interpreter as I
            console = (I.op_pow if op == "pow" else I.op_pow_wrapped)(
                a.literal, b.literal)
            if t == "field" and op == "pow" and isinstance(a.gadget, CField):
                gadget = a.gadget.pow_var(b.gadget)
            elif t in INT_WIDTHS and isinstance(a.gadget, CInteger) \
                    and isinstance(b.gadget, CInteger):
                gadget = (a.gadget.pow_checked if op == "pow"
                          else a.gadget.pow_wrapped)(b.gadget)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("abs", "abs.w", "neg"):
            a = ld(inst.operands[0])
            t = a.literal.type_name
            from . import interpreter as I
            console = {"abs": I.op_abs, "abs.w": I.op_abs_wrapped,
                       "neg": I.op_neg}[op](a.literal)
            if t == "field" and op == "neg":
                gadget = -a.gadget
            elif t == "group" and op == "neg" and isinstance(a.gadget, CGroup):
                gadget = a.gadget.neg()
            elif t in INT_WIDTHS and isinstance(a.gadget, CInteger):
                gadget = {"abs": a.gadget.abs_checked,
                          "abs.w": a.gadget.abs_wrapped,
                          "neg": a.gadget.neg_checked}[op]()
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("shl", "shr") and isinstance(ld(inst.operands[0]).gadget, CInteger) \
                and isinstance(ld(inst.operands[1]).gadget, CInteger):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            console = (I.op_shl if op == "shl" else I.op_shr)(a.literal, b.literal)
            gadget = (a.gadget.shl_checked if op == "shl"
                      else a.gadget.shr_checked)(b.gadget)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op == "sqrt":
            a = ld(inst.operands[0])
            from . import interpreter as I
            console = I.op_sqrt(a.literal)
            if isinstance(a.gadget, CField):
                gadget = a.gadget.sqrt()
            else:
                gadget = self._weak_witness(builder, op, console)
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
                    gadget = self._weak_witness(builder, op, console)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("lt", "lte", "gt", "gte") and \
                isinstance(ld(inst.operands[0]).gadget,
                           (CInteger, CField, CScalar, CAddress)):
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
            elif a.literal.type_name == "group" and op == "double" and \
                    isinstance(a.gadget, CGroup):
                gadget = a.gadget.double()
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("is.eq", "is.neq"):
            a, b = ld(inst.operands[0]), ld(inst.operands[1])
            from . import interpreter as I
            eqv = I.plaintext_eq(a.literal, b.literal)
            eq_console = Literal("boolean", eqv if op == "is.eq" else not eqv)
            from ..circuit.types import CString
            if isinstance(a.gadget, (CField, CInteger, CGroup, CScalar,
                                     CAddress, CString)) and type(a.gadget) is type(b.gadget):
                gadget = a.gadget.is_equal(b.gadget)
            elif isinstance(a.gadget, CBool) and isinstance(b.gadget, CBool):
                gadget = ~(a.gadget ^ b.gadget)
            else:
                regs[inst.destinations[0]] = CircuitValue(
                    eq_console, self._weak_witness(builder, op, eq_console))
                return
            if op == "is.neq":
                gadget = ~gadget
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
            elif isinstance(a.gadget, (CInteger, CGroup, CScalar, CAddress)) \
                    and type(a.gadget) is type(b.gadget):
                flag = a.gadget.is_equal(b.gadget)
                (flag if op == "assert.eq" else ~flag).assert_true()
            elif isinstance(a.gadget, CBool) and isinstance(b.gadget, CBool):
                flag = ~(a.gadget ^ b.gadget)
                (flag if op == "assert.eq" else ~flag).assert_true()
            else:
                # never skip an assert silently — an unconstrained assert
                # would be a soundness hole in the transition circuit
                self._weak_witness(builder, op, a.literal)
            return
        if op == "ternary":
            c, a, b = ld(inst.operands[0]), ld(inst.operands[1]), ld(inst.operands[2])
            from . import interpreter as I
            console = I.op_ternary(c.literal, a.literal, b.literal)
            if isinstance(a.gadget, CField):
                gadget = a.gadget.ternary(c.gadget, b.gadget)
            elif isinstance(a.gadget, (CInteger, CGroup, CScalar, CAddress)) \
                    and isinstance(c.gadget, CBool) \
                    and type(a.gadget) is type(b.gadget):
                gadget = a.gadget.ternary(c.gadget, b.gadget)
            elif isinstance(a.gadget, CBool) and isinstance(c.gadget, CBool):
                from ..circuit.types import _bool_select
                gadget = _bool_select(builder, c.gadget, a.gadget, b.gadget)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op in ("hash.psd2", "hash.psd4", "hash.psd8"):
            a = ld(inst.operands[0])
            rate = int(op[-1])
            dest_type = (inst.as_type or "field").split(".")[0]
            from . import interpreter as I
            from ..circuit.types import CStruct
            console = I.hash_instruction(op, a.literal, dest_type)
            t = getattr(a.literal, "type_name", None)
            if (t in ("field", "boolean", "address", "group", "scalar")
                    or t in INT_WIDTHS
                    or isinstance(a.gadget, CStruct)):
                from ..circuit.response_gadget import plaintext_fields_gadget
                cfields = plaintext_fields_gadget(builder, a.gadget, t)
                if dest_type in ("group", "address"):
                    from ..circuit.elligator_gadget import hash_to_group_gadget
                    pt = hash_to_group_gadget(builder, rate, cfields)
                    gadget = CAddress(builder, pt) if dest_type == "address" \
                        else pt
                else:
                    out = poseidon_gadget.hash_psd(builder, rate, cfields)[0]
                    gadget = _hash_dest_cast(builder, out, dest_type, console)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op.startswith(("hash.bhp", "hash.ped", "hash.keccak", "hash.sha3")):
            a = ld(inst.operands[0])
            dest_type = (inst.as_type or "field").split(".")[0]
            from . import interpreter as I
            from ..circuit.types import CStruct
            console = I.hash_instruction(op, a.literal, dest_type)
            t = getattr(a.literal, "type_name", None)
            if (t in ("field", "boolean", "address", "group", "scalar")
                    or t in INT_WIDTHS
                    or isinstance(a.gadget, CStruct)):
                from ..circuit.response_gadget import plaintext_bits_gadget
                from ..circuit.bhp_gadget import (bhp_hash_gadget,
                                                  bhp_hash_point_gadget)
                from ..circuit.keccak_gadget import (keccak_hash_gadget,
                                                     pedersen_hash_gadget)
                try:
                    bits = plaintext_bits_gadget(builder, a.gadget, t)
                    kind = op.split(".", 1)[1]
                    pt = None
                    if kind.startswith("bhp"):
                        pt = bhp_hash_point_gadget(builder, int(kind[3:]),
                                                   f"AleoBHP{kind[3:]}", bits)
                    elif kind.startswith("ped"):
                        x = pedersen_hash_gadget(builder, int(kind[3:]), bits)
                    else:
                        hk = "keccak" if kind.startswith("keccak") else "sha3"
                        variant = int(kind.replace("keccak", "").replace("sha3_", ""))
                        digest = keccak_hash_gadget(builder, hk, variant, bits)
                        bhp_variant = 256 if variant == 256 else 512
                        pt = bhp_hash_point_gadget(builder, bhp_variant,
                                                   f"AleoBHP{bhp_variant}",
                                                   digest)
                    if pt is not None and dest_type in ("group", "address"):
                        gadget = CAddress(builder, pt) \
                            if dest_type == "address" else pt
                    else:
                        x = pt.x if pt is not None else x
                        gadget = _hash_dest_cast(builder, x, dest_type,
                                                 console)
                except (AssertionError, NotImplementedError):
                    # input shape outside the gadget surface (pedersen max
                    # bits) -> loud witness fallback
                    gadget = self._weak_witness(builder, op, console)
            else:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op == "sign.verify":
            # circuit/account/src/signature/verify.rs gadget (VERDICT r2
            # #5 straggler): signature components enter as fresh private
            # witnesses, the result is a Boolean VALUE
            a_sig, a_addr, a_msg = (ld(inst.operands[0]), ld(inst.operands[1]),
                                    ld(inst.operands[2]))
            from ..console.types import _group_from_x
            from .process import _as_plaintext
            sig_lit, addr_lit = a_sig.literal, a_addr.literal
            fields = _as_plaintext(a_msg.literal).to_fields()
            addr_pt = addr_lit.value if isinstance(addr_lit.value, tuple) \
                else _group_from_x(addr_lit.value)
            console = Literal("boolean", sig_lit.value.verify(addr_pt, fields))
            addr_g = a_addr.gadget.group if isinstance(a_addr.gadget, CAddress) \
                else a_addr.gadget
            gadget = None
            if getattr(sig_lit, "type_name", None) == "signature" and \
                    isinstance(addr_g, CGroup) and a_msg.gadget is not None \
                    and not isinstance(a_msg.gadget, FutureGadget):
                from ..circuit.request_gadget import signature_verify_gadget
                from ..circuit.response_gadget import plaintext_fields_gadget
                try:
                    msg_fields = plaintext_fields_gadget(
                        builder, a_msg.gadget, a_msg.literal.type_name)
                    gadget = signature_verify_gadget(builder, sig_lit.value,
                                                     addr_g, msg_fields)
                except (NotImplementedError, AssertionError):
                    gadget = None
            if gadget is None:
                gadget = self._weak_witness(builder, op, console)
            regs[inst.destinations[0]] = CircuitValue(console, gadget)
            return
        if op.startswith("hash_many.psd"):
            a = ld(inst.operands[0])
            from .interpreter import hash_many_instruction
            k = len(inst.destinations)
            outs = hash_many_instruction(op, a.literal, k)
            if a.gadget is not None and not isinstance(a.gadget, FutureGadget):
                from ..circuit.response_gadget import plaintext_fields_gadget
                rate = int(op.split("psd")[1])
                try:
                    fg = plaintext_fields_gadget(builder, a.gadget,
                                                 a.literal.type_name)
                    hs = poseidon_gadget.hash_psd(builder, rate, fg,
                                                  num_outputs=k)
                    for d, lit, h in zip(inst.destinations, outs, hs):
                        regs[d] = CircuitValue(lit, h)
                    return
                except (NotImplementedError, AssertionError):
                    pass
            for d, lit in zip(inst.destinations, outs):
                regs[d] = CircuitValue(lit, self._weak_witness(builder, op, lit))
            return
        if op == "cast" and inst.as_type and inst.as_type.endswith(".record") \
                and inst.as_type.split(".")[0] in self.stack.program.records \
                and getattr(self, "_ctx", None) is not None:
            # record cast in-circuit (circuit cast.rs record arm): build
            # the RecordGadget from the operand gadgets; nonce =
            # G^HashToScalar_psd2([tvk, dest locator]) computed in-circuit
            rec_base = inst.as_type.split(".")[0]
            rt = self.stack.program.records[rec_base]
            operand_cvs = [ld(o) for o in inst.operands]
            if all(cv.gadget is not None for cv in operand_cvs):
                from ..circuit.record_gadget import RecordGadget
                from ..circuit.request_gadget import (
                    g_scalar_multiply_gadget, hash_to_scalar_bits_gadget)
                from ..circuit.types import CAddress as _CAddr
                from ..console.record import Record, Entry
                from ..console.types import Identifier, _group_from_x
                owner_cv = operand_cvs[0]
                owner_g = owner_cv.gadget
                if not isinstance(owner_g, _CAddr):
                    owner_g = _CAddr(builder, owner_g)   # CGroup -> address view
                locator = int(inst.destinations[0][1:])
                rand_bits = hash_to_scalar_bits_gadget(
                    builder, 2, [self._ctx.tvk,
                                 CField.constant(builder, locator)])
                nonce_g = g_scalar_multiply_gadget(builder, rand_bits)
                # console twin (process.py cast record arm)
                tvk_c = self._tvk_console
                if tvk_c is None:
                    raise HaltError("record cast requires a transition view key")
                randomizer_c = N.hash_to_scalar_psd(2, [tvk_c, locator])
                nonce_c = N.g_scalar_multiply(randomizer_c)
                owner_lit = owner_cv.literal
                owner_pt = owner_lit.value if isinstance(owner_lit.value, tuple) \
                    else _group_from_x(owner_lit.value)
                data_c, data_g = [], []
                for (ename, etype), cv in zip(rt.entries, operand_cvs[1:]):
                    vis = etype.split(".")[-1]
                    lit = cv.literal
                    data_c.append((Identifier(ename),
                                   Entry(vis, Plaintext("literal", lit))))
                    data_g.append((Identifier(ename), vis, lit, cv.gadget))
                record_c = Record(owner_pt, rt.owner_visibility, data_c, nonce_c)
                rg = RecordGadget(builder, owner_g, data_g, nonce_g, record_c)
                rg.randomizer_bits = rand_bits
                rg.locator = locator
                regs[inst.destinations[0]] = CircuitValue(record_c, rg)
                return
        if op == "cast" and inst.as_type in self.stack.program.structs:
            st = self.stack.program.structs[inst.as_type]
            cvs = [ld(o) for o in inst.operands]
            ok_gadgets = all(
                cv.gadget is not None and not isinstance(cv.gadget, FutureGadget)
                for cv in cvs)
            if ok_gadgets and len(cvs) == len(st.members):
                from ..circuit.types import CStruct
                from ..console.types import Identifier
                from .process import _as_plaintext
                members_c = []
                members_g = []
                for (mname, _mtype), cv in zip(st.members, cvs):
                    members_c.append((Identifier(mname),
                                      _as_plaintext(cv.literal)))
                    members_g.append((Identifier(mname),
                                      cv.literal.type_name, cv.gadget))
                pt = Plaintext("struct", members_c)
                regs[inst.destinations[0]] = CircuitValue(
                    pt, CStruct(builder, members_g, pt))
                return
        if op in ("cast", "cast.lossy") and len(inst.operands) == 1 and \
                inst.as_type:
            dest_type = inst.as_type.split(".")[0]
            is_literal_dest = (dest_type in ("field", "boolean", "scalar",
                                             "group", "address")
                               or dest_type in INT_WIDTHS)
            a = ld(inst.operands[0])
            if is_literal_dest and a.gadget is not None:
                from . import interpreter as I
                console = I.cast_literal(a.literal, dest_type,
                                         op == "cast.lossy")
                gadget = cast_gadget(builder, a.gadget,
                                     a.literal.type_name, dest_type,
                                     op == "cast.lossy", console)
                if gadget is None:
                    gadget = self._weak_witness(builder, op, console)
                regs[inst.destinations[0]] = CircuitValue(console, gadget)
                return
        # Generic fallback: run the instruction console-side through the
        # Stack dispatcher and re-inject results as private witnesses. This
        # keeps every console opcode circuit-executable, but LOUDLY weakly
        # constrained (self.weak_ops + warning; SNARKVM_TPU_STRICT_CIRCUIT
        # raises) — per-opcode gadgets replace these as they land.
        from .process import Registers
        creg = Registers(tvk=getattr(self, "_tvk_console", None))
        for name, cv in regs.items():
            if name == "self.signer":
                creg.signer = cv.literal.value
            elif name == "self.caller":
                creg.caller = cv.literal.value
            else:
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
            regs[d] = CircuitValue(lit, self._weak_witness(builder, op, lit))


def prove_run(srs, stack: Stack, function: str, inputs, rng, mode=None):
    """Package::run analog (SURVEY.md §3.5): dual-execute + Varuna-prove.
    Returns (outputs, proof, vk, public_inputs). With srs=None a test SRS
    sized to the synthesized circuit is created (dev CLI path)."""
    from ..snark import varuna
    mode = mode or varuna.VarunaNonHidingMode
    dual = DualStack(stack)
    outputs, builder = dual.execute_function(function, inputs)
    synth = builder.to_synthesizer()
    if srs is None:
        from ..polycommit import kzg

        def pow2(n):
            return 1 << max(1, (n - 1).bit_length())

        cd = pow2(builder.num_constraints)
        vd = pow2(builder.num_public + builder.num_private)
        nz = pow2(max(
            sum(len(abc[i].terms) + (1 if abc[i].constant else 0)
                for abc in builder.constraints)
            for i in range(3)))
        need = max(2 * cd + 4, 2 * vd + 6, nz, 1 << 12)
        srs = kzg.test_srs(1 << (need - 1).bit_length())
    pk, vk = varuna.circuit_setup(srs, synth, mode)
    proof = varuna.prove_batch(srs, [(pk, [synth])], rng, mode)
    public = [1] + builder.public[1:]
    return outputs, proof, vk, public, srs
