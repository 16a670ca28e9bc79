"""Stack execution: register file + instruction dispatch (console path).

Mirrors synthesizer/process/src/stack/ evaluate semantics: registers
load/store, operand resolution (literals, registers, member accesses,
special operands), per-opcode dispatch into interpreter.py. The circuit
path (dual execution) hooks in via the same dispatch table.
"""
from __future__ import annotations

from ..console.types import (
    Literal, Plaintext, Identifier, literal_from_str, literal_to_str, INT_WIDTHS,
)
from ..console import network as N
from . import interpreter as I
from .interpreter import HaltError
from .program import Program, parse_program


LITERAL_TYPES = set(INT_WIDTHS) | {"field", "group", "scalar", "boolean", "address", "string", "signature"}


class Registers:
    def __init__(self, signer=None, caller=None, tvk=None, authctx=None):
        self.regs = {}
        self.signer = signer
        self.caller = caller
        self.tvk = tvk
        # CallStack::Authorize context (process/src/stack/call/mod.rs:230):
        # {"auth": Authorization, "private_key", "rng", "root_tvk"} — set
        # only while authorizing; external function calls sign CHILD
        # requests into the authorization instead of evaluating anonymously
        self.authctx = authctx

    def store(self, dest: str, value):
        assert dest.startswith("r")
        self.regs[dest] = value

    def load(self, operand):
        if isinstance(operand, tuple):
            raise HaltError(f"unsupported operand {operand}")
        if operand.startswith("r") and operand[1:2].isdigit():
            import re as _re
            m = _re.match(r"(r\d+)((?:\.\w+|\[[^\]]+\])*)$", operand)
            if m and m.group(1) in self.regs:
                v = self.regs[m.group(1)]
                for acc in _re.findall(r"\.(\w+)|\[([^\]]+)\]", m.group(2)):
                    member, index = acc
                    if member:
                        v = _access_member(v, member)
                    else:
                        idx = literal_from_str(index).value
                        if getattr(v, "kind", None) == "future":
                            # future argument access fN[idx] (finalize
                            # operand form, logic/command/await + operand
                            # access.rs): index into the future's args
                            v = v.value[2][idx]
                        else:
                            assert isinstance(v, Plaintext) and v.kind == "array", \
                                f"indexed access on non-array {operand}"
                            v = v.value[idx]
                return v
        if operand == "self.signer":
            return Literal("address", self.signer)
        if operand == "self.caller":
            return Literal("address", self.caller)
        if operand in ("group::GEN",):
            from ..curves import edwards as ed
            return Literal("group", ed.GENERATOR)
        return literal_from_str(operand)


def _access_member(v, member):
    if isinstance(v, Plaintext) and v.kind == "struct":
        for ident, val in v.value:
            if ident.name == member:
                return val.value if isinstance(val, Plaintext) and val.kind == "literal" and False else val
    from ..console.record import Record
    if isinstance(v, Record):
        if member == "owner":
            return Literal("address", v.owner)
        for ident, entry in v.data:
            if ident.name == member:
                return entry.value
    if isinstance(v, dict):  # record entries
        if member in v:
            return v[member]
    raise HaltError(f"no member {member}")


_BINARY = {
    "add": I.op_add, "add.w": I.op_add_wrapped, "sub": I.op_sub, "sub.w": I.op_sub_wrapped,
    "mul": I.op_mul, "mul.w": I.op_mul_wrapped, "div": I.op_div, "div.w": I.op_div_wrapped,
    "rem": I.op_rem, "rem.w": I.op_rem_wrapped, "mod": I.op_modulo,
    "pow": I.op_pow, "pow.w": I.op_pow_wrapped,
    "shl": I.op_shl, "shl.w": I.op_shl_wrapped, "shr": I.op_shr, "shr.w": I.op_shr_wrapped,
    "and": I.op_and, "or": I.op_or, "xor": I.op_xor, "nand": I.op_nand, "nor": I.op_nor,
    "lt": I.op_lt, "lte": I.op_lte, "gt": I.op_gt, "gte": I.op_gte,
}
_UNARY = {
    "abs": I.op_abs, "abs.w": I.op_abs_wrapped, "neg": I.op_neg, "not": I.op_not,
    "inv": I.op_inv, "double": I.op_double, "square": I.op_square, "sqrt": I.op_sqrt,
}


def _validate_program(program: Program, external: dict) -> None:
    """Deploy-time structural checks (Stack::new / Program wf-rules the
    reference enforces; mirrored against the synthesizer/tests
    vm/execute_and_finalize *_fail corpus):
      * async requires a finalize block; at most one async; no call after
        async; the last output of an async function is its OWN future;
      * every future produced by calls must be consumed by the async;
      * finalize must await every future input;
      * mapping references resolve: local mappings defined; external
        locators imported + defined remotely + read-only."""
    pid = program.id

    def future_outputs_of(callee_locator: str):
        """Does calling `callee` yield a future? -> bool."""
        if "/" in callee_locator:
            cp, cf = callee_locator.split("/")
            cprog = external[cp].program if cp in external else None
        else:
            cprog, cf = program, callee_locator
        if cprog is None:
            return False
        fn = cprog.functions.get(cf)
        return fn is not None and fn.finalize_name is not None

    for fname, fn in program.functions.items():
        asyncs = [i for i in fn.instructions if i.opcode == "async"]
        if len(asyncs) > 1:
            raise HaltError(
                f"Function '{fname}' can contain at most one 'async' instruction")
        seen_async = False
        future_regs = []
        for inst in fn.instructions:
            if inst.opcode == "async":
                seen_async = True
                if fn.finalize_name is None or fname not in program.finalizes:
                    raise HaltError(
                        f"'{pid}/{fname}' does not have a finalize block")
            elif inst.opcode == "call":
                if seen_async:
                    raise HaltError(
                        "The 'call' can only be invoked before an 'async' instruction")
                if future_outputs_of(inst.operands[0]) and inst.destinations:
                    future_regs.append(inst.destinations[-1])
        if future_regs and not asyncs:
            raise HaltError(
                f"Function '{pid}/{fname}' must contain a finalize block, "
                f"since it calls an async function")
        if asyncs:
            consumed = set(asyncs[0].operands[1:])
            missing = [r for r in future_regs if r not in consumed]
            if missing:
                raise HaltError(
                    f"Function '{fname}' contains futures, but the 'async' "
                    f"instruction does not consume all of the ones produced")
            if not fn.outputs or not fn.outputs[-1].value_type.endswith(".future") \
                    or fn.outputs[-1].value_type != f"{pid}/{fname}.future":
                raise HaltError(
                    f"The last output of function '{fname}' must be a future "
                    f"associated with itself")

    for fin_name, fin in program.finalizes.items():
        future_inputs = {i.register for i in fin.inputs
                        if i.value_type.endswith(".future")}
        awaited = {c.operands[0] for c in fin.commands if c.opcode == "await"}
        if not future_inputs <= awaited:
            raise HaltError(
                f"Futures in finalize '{fin_name}' are not all awaited.")
        for cmd in fin.commands:
            if cmd.opcode in ("contains", "get", "get.or_use"):
                token = cmd.operands[0]
            elif cmd.opcode == "set":
                token = cmd.destinations[0]
            elif cmd.opcode == "remove":
                token = cmd.operands[0]
            else:
                continue
            mapping = token.partition("[")[0]
            if "/" in mapping:
                ext_pid, ext_map = mapping.split("/")
                if ext_pid == pid:
                    raise HaltError(
                        f"Locator '{mapping}' does not reference an external mapping.")
                if cmd.opcode in ("set", "remove"):
                    raise HaltError(
                        f"Cannot write to the external mapping '{mapping}'")
                if ext_pid not in program.imports:
                    raise HaltError(
                        f"External program '{ext_pid}' is not imported by '{pid}'.")
                ext_stack = external.get(ext_pid)
                if ext_stack is not None and \
                        ext_map not in ext_stack.program.mappings:
                    raise HaltError(
                        f"Mapping '{ext_map}' in '{ext_pid}' is not defined.")
            elif mapping not in program.mappings:
                raise HaltError(
                    f"Mapping '{mapping}' in '{pid}/{fin_name}' is not defined.")


class Stack:
    def __init__(self, program: Program, external=None, validate: bool = True):
        self.program = program
        self.external = external or {}
        if validate:
            _validate_program(program, self.external)

    def evaluate_function(self, name: str, inputs, signer=None, caller=None,
                          tvk=None, authctx=None):
        """Run a function (or closure) on console values; returns output list.
        tvk: the request's transition view key — record casts derive output
        nonces from it (cast.rs:317). authctx: authorize-mode context (child
        requests get signed into the authorization at external call sites)."""
        fn = self.program.functions.get(name) or self.program.closures.get(name)
        if fn is None:
            raise HaltError(f"no function {name}")
        if len(inputs) != len(fn.inputs):
            raise HaltError("input arity mismatch")
        regs = Registers(signer=signer, caller=caller, tvk=tvk, authctx=authctx)
        for finput, value in zip(fn.inputs, inputs):
            value = self._check_input_type(finput.value_type, value)
            regs.store(finput.register, value)
        self._run_instructions(fn.instructions, regs)
        outputs = []
        for out in fn.outputs:
            outputs.append(regs.load(out.operand))
        return outputs

    def _check_input_type(self, value_type: str, value):
        base = value_type.split(".")[0]
        if isinstance(value, str):
            value = parse_plaintext_str(value)
            if isinstance(value, Literal):
                value = value
        if base in LITERAL_TYPES:
            if isinstance(value, Plaintext) and value.kind == "literal":
                value = value.value
            assert isinstance(value, Literal), f"expected literal for {value_type}"
            if value.type_name != base:
                raise HaltError(f"type mismatch: {value.type_name} vs {base}")
            return value
        return value  # struct/record values pass through

    def _run_instructions(self, instructions, regs: Registers):
        for inst in instructions:
            self._execute(inst, regs)

    def _execute(self, inst, regs: Registers):
        op = inst.opcode
        if op in _BINARY:
            a = _as_literal(regs.load(inst.operands[0]))
            b = _as_literal(regs.load(inst.operands[1]))
            regs.store(inst.destinations[0], _BINARY[op](a, b))
            return
        if op in _UNARY:
            a = _as_literal(regs.load(inst.operands[0]))
            regs.store(inst.destinations[0], _UNARY[op](a))
            return
        if op == "ternary":
            c = _as_literal(regs.load(inst.operands[0]))
            a = regs.load(inst.operands[1])
            b = regs.load(inst.operands[2])
            regs.store(inst.destinations[0], I.op_ternary(c, _as_literal(a), _as_literal(b)))
            return
        if op in ("is.eq", "is.neq"):
            a = regs.load(inst.operands[0])
            b = regs.load(inst.operands[1])
            eq = I.plaintext_eq(a, b)
            regs.store(inst.destinations[0], Literal("boolean", eq if op == "is.eq" else not eq))
            return
        if op in ("assert.eq", "assert.neq"):
            a = regs.load(inst.operands[0])
            b = regs.load(inst.operands[1])
            eq = I.plaintext_eq(a, b)
            if (op == "assert.eq") != eq:
                raise HaltError(f"{op} failed")
            return
        if op.startswith("hash_many."):
            value = regs.load(inst.operands[0])
            num = int(inst.operands[1]) if len(inst.operands) > 1 else 1
            outs = I.hash_many_instruction(op, value, num)
            regs.store(inst.destinations[0], Plaintext.array([Plaintext("literal", o) for o in outs]))
            return
        if op.startswith("hash."):
            value = regs.load(inst.operands[0])
            dest_type = (inst.as_type or "field").split(".")[0]
            if dest_type in self.program.structs:
                raise HaltError("Invalid destination type in 'hash' instruction")
            regs.store(inst.destinations[0], I.hash_instruction(op, value, dest_type))
            return
        if op.startswith("commit."):
            value = regs.load(inst.operands[0])
            rand = _as_literal(regs.load(inst.operands[1]))
            dest_type = (inst.as_type or "field").split(".")[0]
            regs.store(inst.destinations[0], I.commit_instruction(op, value, rand, dest_type))
            return
        if op in ("cast", "cast.lossy"):
            dest_type = inst.as_type
            lossy = op.endswith("lossy")
            rec_base = (dest_type or "").split(".")[0]
            if rec_base in self.program.records and dest_type.endswith(".record"):
                # record cast (cast.rs:269): operands = [owner, entries...];
                # nonce = g * HashToScalar_psd2([tvk, destination locator])
                from ..console.record import Record, Entry
                from ..console.types import Identifier, _group_from_x
                rt = self.program.records[rec_base]
                assert len(inst.operands) == 1 + len(rt.entries), \
                    "cast: operand count must match the record entries"
                owner_lit = _as_literal(regs.load(inst.operands[0]))
                if owner_lit.type_name != "address":
                    raise HaltError("record owner must be an address")
                owner = owner_lit.value if isinstance(owner_lit.value, tuple) \
                    else _group_from_x(owner_lit.value)
                data = []
                for (ename, etype), operand in zip(rt.entries, inst.operands[1:]):
                    vis = etype.split(".")[-1]
                    data.append((Identifier(ename),
                                 Entry(vis, _as_plaintext(regs.load(operand)))))
                if regs.tvk is None:
                    raise HaltError("record cast requires a transition view key")
                index = int(inst.destinations[0][1:])
                randomizer = N.hash_to_scalar_psd(2, [regs.tvk, index])
                nonce = N.g_scalar_multiply(randomizer)
                regs.store(inst.destinations[0],
                           Record(owner, rt.owner_visibility, data, nonce))
                return
            if dest_type in self.program.structs:
                st = self.program.structs[dest_type]
                assert len(inst.operands) == len(st.members)
                members = []
                for (mname, mtype), operand in zip(st.members, inst.operands):
                    v = regs.load(operand)
                    members.append((mname, _as_plaintext(v)))
                regs.store(inst.destinations[0], Plaintext.struct(members))
                return
            base = dest_type if dest_type in ("group.x", "group.y") else dest_type.split(".")[0]
            if base.startswith("["):
                elems = [_as_plaintext(regs.load(o)) for o in inst.operands]
                regs.store(inst.destinations[0], Plaintext.array(elems))
                return
            v = _as_literal(regs.load(inst.operands[0]))
            regs.store(inst.destinations[0], I.cast_literal(v, base, lossy))
            return
        if op == "sign.verify":
            sig = _as_literal(regs.load(inst.operands[0]))
            addr = _as_literal(regs.load(inst.operands[1]))
            msg = regs.load(inst.operands[2])
            fields = _as_plaintext(msg).to_fields()
            from ..console.types import _group_from_x
            addr_pt = addr.value if isinstance(addr.value, tuple) else _group_from_x(addr.value)
            ok = sig.value.verify(addr_pt, fields)
            regs.store(inst.destinations[0], Literal("boolean", ok))
            return
        if op == "call":
            # stack/call/mod.rs:49 — closures inherit the current caller;
            # external functions run with caller = calling program's address
            # (ProgramID::to_address), signer preserved. In authorize mode
            # (regs.authctx) each external FUNCTION call signs a CHILD
            # request into the authorization (CallStack::Authorize,
            # call/mod.rs:230) — one transition per call on the wire.
            callee = inst.operands[0]
            args = [regs.load(o) for o in inst.operands[1:]]
            if "/" in callee:
                pid, fname = callee.split("/", 1)
                sub = self.external.get(pid)
                if sub is None:
                    raise HaltError(f"external program {pid} not found")
            else:
                pid, fname, sub = self.program.id, callee, self
            if fname in sub.program.closures:
                results = sub.evaluate_function(fname, args, regs.signer,
                                                regs.caller, authctx=regs.authctx)
            elif fname in sub.program.functions:
                from ..console import network as _N
                parent_addr = _N.program_address(self.program.id)
                if regs.authctx is not None:
                    from ..console.request import Request
                    actx = regs.authctx
                    types = fn_input_types(sub.program.functions[fname])
                    vals = [_sign_value(a) for a in args]
                    child = Request.sign(
                        actx["private_key"], pid, fname, vals, types,
                        actx["rng"], root_tvk=actx["root_tvk"],
                        is_root=False)
                    actx["auth"].push(child, types)
                    results = sub.evaluate_function(
                        fname, list(child.inputs), child.signer,
                        parent_addr, tvk=child.tvk, authctx=actx)
                else:
                    results = sub.evaluate_function(
                        fname, args, regs.signer, parent_addr, tvk=regs.tvk)
            else:
                raise HaltError(f"no function or closure {fname} in {pid}")
            for dest, res in zip(inst.destinations, results):
                regs.store(dest, res)
            return
        if op == "async":
            # `async fn r0 r1... into rN` -> a Future carrying the finalize args
            fname = inst.operands[0]
            args = [regs.load(o) for o in inst.operands[1:]]
            from ..console.types import Value
            future = Value("future", (self.program.id, fname, args))
            regs.store(inst.destinations[0], future)
            return
        raise HaltError(f"unknown opcode {op}")


def fn_input_types(fn):
    """[(visibility, type_name)] for a function declaration — the
    Request.sign input_types shape. Records map to ('record', name);
    another program's records to ('external_record', name)."""
    out = []
    for fi in fn.inputs:
        vt = fi.value_type
        if vt.endswith(".record"):
            base = vt[: -len(".record")]
            if "/" in base:
                out.append(("external_record", base.split("/", 1)[1]))
            else:
                out.append(("record", base))
        else:
            base, vis = vt.rsplit(".", 1)
            out.append((vis, base))
    return out


def fn_output_types(fn):
    """[(visibility, type_name)] for a function's outputs (the
    Response.new output_types shape)."""
    out = []
    for fo in fn.outputs:
        vt = fo.value_type
        if vt.endswith(".record"):
            base = vt[: -len(".record")]
            if "/" in base:
                out.append(("external_record", base.split("/", 1)[1]))
            else:
                out.append(("record", base))
        elif vt.endswith(".future"):
            out.append(("future", vt[: -len(".future")]))
        else:
            base, vis = vt.rsplit(".", 1)
            out.append((vis, base))
    return out


def _sign_value(v):
    """Call operand -> the Plaintext/Record shape Request.sign expects."""
    from ..console.record import Record
    if isinstance(v, (Record, Plaintext)):
        return v
    if isinstance(v, Literal):
        return Plaintext("literal", v)
    raise HaltError(f"cannot sign call operand of type {type(v).__name__}")


def _as_literal(v):
    if isinstance(v, Plaintext) and v.kind == "literal":
        return v.value
    if isinstance(v, Literal):
        return v
    raise HaltError("expected literal operand")


def _as_plaintext(v):
    if isinstance(v, Literal):
        return Plaintext("literal", v)
    assert isinstance(v, Plaintext)
    return v


def value_to_str(v, depth: int = 0) -> str:
    """Exact Plaintext Display (plaintext/parse.rs fmt_internal)."""
    IND = "  "
    if isinstance(v, Literal):
        return IND * depth + literal_to_str(v) if depth else literal_to_str(v)
    if isinstance(v, Plaintext):
        if v.kind == "literal":
            return literal_to_str(v.value)
        if v.kind == "struct":
            out = "{"
            n = len(v.value)
            for i, (ident, member) in enumerate(v.value):
                if member.kind == "literal":
                    out += f"\n{IND * (depth + 1)}{ident.name}: {literal_to_str(member.value)}"
                    out += f"\n{IND * depth}}}" if i == n - 1 else ","
                else:
                    out += f"\n{IND * (depth + 1)}{ident.name}: "
                    out += value_to_str(member, depth + 1)
                    out += f"\n{IND * depth}}}" if i == n - 1 else ","
            if n == 0:
                out += "}"
            return out
        out = "["
        n = len(v.value)
        for i, member in enumerate(v.value):
            if member.kind == "literal":
                out += f"\n{IND * (depth + 1)}{literal_to_str(member.value)}"
                out += f"\n{IND * depth}]" if i == n - 1 else ","
            else:
                out += f"\n{IND * (depth + 1)}"
                out += value_to_str(member, depth + 1)
                out += f"\n{IND * depth}]" if i == n - 1 else ","
        if n == 0:
            out += "]"
        return out
    return str(v)


def parse_plaintext_str(s: str) -> "Plaintext | Literal":
    """Parse a plaintext text value: literal, [a, b, ...], { name: v, ... }."""
    s = s.strip()
    pt, rest = _parse_pt(s)
    assert not rest.strip(), f"trailing input: {rest}"
    return pt


def _parse_pt(s: str):
    s = s.lstrip()
    if s.startswith("["):
        s = s[1:]
        elems = []
        while True:
            s = s.lstrip()
            if s.startswith("]"):
                return Plaintext.array(elems), s[1:]
            pt, s = _parse_pt(s)
            elems.append(pt if isinstance(pt, Plaintext) else Plaintext("literal", pt))
            s = s.lstrip()
            if s.startswith(","):
                s = s[1:]
    if s.startswith("{"):
        s = s[1:]
        members = []
        while True:
            s = s.lstrip()
            if s.startswith("}"):
                return Plaintext.struct(members), s[1:]
            name, s = s.split(":", 1)
            pt, s = _parse_pt(s)
            members.append((name.strip(), pt if isinstance(pt, Plaintext) else Plaintext("literal", pt)))
            s = s.lstrip()
            if s.startswith(","):
                s = s[1:]
    # literal token: up to , ] } or end
    import re as _re
    m = _re.match(r"[^,\]\}]+", s)
    tok = m.group(0).strip()
    return literal_from_str(tok), s[m.end():]
