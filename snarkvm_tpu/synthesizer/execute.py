"""Execution pipeline: Request -> dual execution -> Transition -> batched proof.

Mirror of the reference's hot path (SURVEY.md §3.1): Process::execute
runs the call via the circuit layer, accumulates (transition, assignment)
pairs in a Trace, and proves them in ONE batched Varuna proof
(process/src/trace/mod.rs:151 prove_execution -> varuna.rs:336).

Two transition-circuit modes:
  * verify_in_circuit=True — the FULL protocol circuit: in-circuit
    Request::verify + the function body + Response::from_outputs, all in
    one builder with the typed input gadgets bit-bound to the packed
    request-commitment fields (stack/execute.rs:225-238);
  * default — the light run-mode circuit (tcm + input id fields public,
    outputs exposed directly).
"""
from __future__ import annotations

import random
from dataclasses import dataclass

from ..params import bls12_377 as P
from ..console import network as N
from ..console.request import Request
from ..console.types import Plaintext, Literal
from ..circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
from ..circuit.types import CField
from ..snark import varuna
from ..polycommit import kzg
from ..ledger.block import Transition
from .process import Stack, parse_plaintext_str, _as_literal
from .circuit_exec import DualStack
from .interpreter import HaltError

R = P.R


@dataclass
class TracedTransition:
    transition: Transition
    builder: CircuitBuilder
    public_inputs: list
    function_key: tuple    # (program_id, function_name) — circuit cache key
    # record inputs needing inclusion proofs: [(commitment, gamma, sn)]
    record_inputs: list = None


INCLUSION_KEY = ("inclusion", "state_path")


class Trace:
    """Accumulates transitions + assignments; prove_execution batches them.

    Inclusion instances (one per record input, trace/inclusion/mod.rs:45)
    join the same batch as an extra circuit group — exactly the
    reference's prove_batch shape (trace/mod.rs:260: inclusion-circuit
    assignments are appended before the single batched Varuna proof)."""

    def __init__(self):
        self.traced = []
        # (commitment, gamma, serial_number, transition_pos) — the
        # position feeds the per-transition local_state_root public
        # (trace/inclusion/mod.rs:134)
        self.inclusion_tasks = []
        self._inclusion_paths = None

    def insert(self, tt: TracedTransition):
        self.traced.append(tt)
        pos = len(self.traced) - 1
        for task in getattr(tt, "record_inputs", None) or []:
            self.inclusion_tasks.append(tuple(task[:3]) + (pos,))

    def insert_inclusion(self, commitment: int, gamma, serial_number: int,
                         transition_pos: int | None = None):
        """Register a record input that needs a state-path inclusion proof."""
        if transition_pos is None:
            transition_pos = max(len(self.traced) - 1, 0)
        self.inclusion_tasks.append((commitment, gamma, serial_number,
                                     transition_pos))

    def prepare(self, query):
        """Trace::prepare (trace/mod.rs:117): fetch the global state root +
        a StatePath per record-input commitment from the Query."""
        self._inclusion_paths = [
            (query.get_state_path_for_commitment(c), c, gamma, sn, pos)
            for c, gamma, sn, pos in self.inclusion_tasks]

    def _inclusion_builders(self):
        from ..circuit.inclusion_gadget import ledger_inclusion_assignment
        if self.inclusion_tasks and self._inclusion_paths is None:
            raise ValueError("Trace has record inputs: call prepare(query) first")
        if not self._inclusion_paths:
            return []
        local_roots = _local_state_roots(
            [tt.transition for tt in self.traced])
        return [ledger_inclusion_assignment(
                    sp, c, gamma, sn,
                    local_state_root=local_roots[pos], is_global=True)
                for sp, c, gamma, sn, pos in self._inclusion_paths]

    def prove_execution(self, srs: kzg.UniversalSRS, rng, mode=varuna.VarunaNonHidingMode,
                        key_cache: dict | None = None):
        """One batched Varuna proof across all transitions, grouped per
        circuit (function) like prove_batch's keys_to_constraints.

        key_cache: optional {function_key: (pk, vk)} shared across calls
        (Stack.proving_keys analog, process/src/stack/mod.rs:186) so
        repeated executions of one function skip the indexer."""
        groups = {}
        for tt in self.traced:
            groups.setdefault(tt.function_key, []).append(tt)
        keys = []
        vks = []
        for fkey, tts in sorted(groups.items()):
            if key_cache is not None and fkey in key_cache:
                pk, vk = key_cache[fkey]
            else:
                synth = tts[0].builder.to_synthesizer()
                pk, vk = varuna.circuit_setup(srs, synth, mode)
                if key_cache is not None:
                    key_cache[fkey] = (pk, vk)
            keys.append((pk, [t.builder.to_synthesizer() for t in tts]))
            vks.append((fkey, vk, [t.public_inputs for t in tts]))
        inclusion = self._inclusion_builders()
        if inclusion:
            if key_cache is not None and INCLUSION_KEY in key_cache:
                pk, vk = key_cache[INCLUSION_KEY]
            else:
                synth = inclusion[0].to_synthesizer()
                pk, vk = varuna.circuit_setup(srs, synth, mode)
                if key_cache is not None:
                    key_cache[INCLUSION_KEY] = (pk, vk)
            keys.append((pk, [b.to_synthesizer() for b in inclusion]))
            vks.append((INCLUSION_KEY, vk,
                        [[1] + b.public[1:] for b in inclusion]))
        keys.sort(key=lambda kv: kv[0].circuit.id)
        proof = varuna.prove_batch(srs, keys, rng, mode)
        # align vks with the sorted key order
        id_order = [pk.circuit.id for pk, _ in keys]
        vks_by_id = {pk.circuit.id: next(v for v in vks if v[1].id == pk.vk.id) for pk, _ in keys}
        ordered_vks = [vks_by_id[cid] for cid in id_order]
        return proof, ordered_vks


class CallStack:
    """The 6 execution modes of process/src/stack/mod.rs:82-89. The mode
    decides what the dual-execution driver materializes:
      AUTHORIZE / SYNTHESIZE / CHECK_DEPLOYMENT / EVALUATE / EXECUTE /
      PACKAGE_RUN.
    Console-only modes (AUTHORIZE, EVALUATE) skip circuit synthesis;
    EXECUTE also proves; CHECK_DEPLOYMENT runs on sampled inputs with
    constraint limits (deploy.py); PACKAGE_RUN stops at assignments
    (cli.py run)."""
    AUTHORIZE = "authorize"
    SYNTHESIZE = "synthesize"
    CHECK_DEPLOYMENT = "check_deployment"
    EVALUATE = "evaluate"
    EXECUTE = "execute"
    PACKAGE_RUN = "package_run"


class Authorization:
    """stack/authorization/mod.rs:28 — the signed, yet-unproven call
    tree: a FIFO of Requests plus the transitions materialized while
    authorizing (console semantics only). `Process::execute` later
    replays the queue through the circuit layer to prove it."""

    def __init__(self, requests=None, input_types=None):
        self.requests = list(requests or [])
        self.input_types = list(input_types or [])
        self.transitions = []

    def push(self, request: Request, types) -> None:
        self.requests.append(request)
        self.input_types.append(types)

    def next(self) -> Request:
        return self.requests[0]

    def is_fee(self) -> bool:
        r = self.requests[0]
        return (r.program_id == "credits.aleo"
                and r.function_name in ("fee_public", "fee_private"))

    def to_execution_id(self) -> int:
        from ..console import network as N
        from ..console.types import int_to_bits_le
        from ..params import bls12_377 as P
        bits = []
        for t in self.transitions:
            bits += int_to_bits_le(t.id() % P.R, 253)
        if not bits:
            bits = int_to_bits_le(0, 253)
        return N.hash_bhp(1024, bits)


def authorize(stack: Stack, private_key, function_name: str, inputs,
              input_types, rng) -> Authorization:
    """Process::authorize (process/src/authorize.rs:21): sign the root
    request and run the call tree in CallStack::AUTHORIZE mode (console
    only) — every external function call signs a CHILD request into the
    authorization (pre-order), one wire transition each."""
    request = Request.sign(private_key, stack.program.id, function_name,
                           list(inputs), input_types, rng)
    auth = Authorization([request], [input_types])
    signer = request.signer
    authctx = {"auth": auth, "private_key": private_key, "rng": rng,
               "root_tvk": request.tvk}
    stack.evaluate_function(function_name, list(request.inputs),
                            signer=signer, caller=signer, tvk=request.tvk,
                            authctx=authctx)
    return auth


def call_tree_order(process_or_stacks, auth: Authorization):
    """Post-order (request_index, parent_request_index|None) pairs for
    the authorization's PRE-ORDER request queue, derived from the static
    call structure of each function (the verifier reconstructs the same
    tree from the wire transitions via construct_call_graph)."""
    stacks = getattr(process_or_stacks, "stacks", process_or_stacks)
    pos = {"i": 0}
    order = []

    def visit(parent_idx):
        i = pos["i"]
        pos["i"] += 1
        req = auth.requests[i]
        stack = stacks[req.program_id]
        fn = stack.program.functions[req.function_name]
        for inst in fn.instructions:
            if inst.opcode != "call":
                continue
            callee = inst.operands[0]
            pid, fname = (callee.split("/", 1) if "/" in callee
                          else (req.program_id, callee))
            sub = stacks.get(pid)
            if sub is not None and fname in sub.program.functions:
                visit(i)
        order.append((i, parent_idx))
        return i

    visit(None)
    if pos["i"] != len(auth.requests):
        raise HaltError("authorization request count does not match the "
                        "static call structure")
    return order


def execute_authorization(stack: Stack, auth: Authorization,
                          verify_in_circuit: bool = True) -> "Trace":
    """Process::execute (process/src/execute.rs:21): replay the
    authorization's call tree through dual execution (CallStack::EXECUTE).
    The PRE-ORDER request queue is consumed recursively: when a parent's
    `call` instruction fires in the circuit, the next queued request runs
    as its own transition FIRST (post-order trace insertion, like the
    reference's Execution ordering), then the call-site gadget binds the
    child's tcm/input ids/output ids as public inputs of the parent."""
    trace = Trace()
    queue = list(zip(auth.requests, auth.input_types))
    stacks = dict(getattr(stack, "external", {}) or {})
    stacks[stack.program.id] = stack
    pos = {"i": 0}
    root_tvk = auth.requests[0].tvk

    def run_next(parent_pid):
        if pos["i"] >= len(queue):
            raise HaltError("call site has no matching authorized request")
        req, types = queue[pos["i"]]
        pos["i"] += 1
        sub = stacks.get(req.program_id)
        if sub is None:
            raise HaltError(f"program {req.program_id} not in scope")
        tt = execute_function(sub, req, types,
                              verify_in_circuit=verify_in_circuit,
                              is_root=(parent_pid is None),
                              parent_pid=parent_pid,
                              root_tvk=root_tvk,
                              call_runner=run_next)
        auth.transitions.append(tt.transition)
        trace.insert(tt)
        return tt, req, types

    run_next(None)
    if pos["i"] != len(queue):
        raise HaltError("authorization carries unconsumed requests")
    return trace


def execute_function(stack: Stack, request: Request, input_types,
                     verify_in_circuit: bool = False, is_root: bool = True,
                     parent_pid: str | None = None,
                     root_tvk: int | None = None, call_runner=None):
    """Stack::execute_function analog: dual-execute with request context.
    With verify_in_circuit=True the full Request::verify gadget runs inside
    the transition circuit (stack/execute.rs:225-238 A::assert(request.verify)).
    parent_pid/is_root/root_tvk: call-tree position (child transitions
    verify with is_root=0 and parent = calling program's address);
    call_runner: consumes the next authorized child request at a `call`
    site (execute_authorization's recursive driver). Returns a
    TracedTransition."""
    if not request.verify(input_types, is_root=is_root):
        raise HaltError("invalid request")
    dual = DualStack(stack)
    dual.call_runner = call_runner
    builder = CircuitBuilder()
    inputs = [inp if isinstance(inp, (Plaintext, Literal)) else inp for inp in request.inputs]
    fn = stack.program.functions.get(request.function_name)
    if fn is None:
        raise HaltError(f"no function {request.function_name}")

    if verify_in_circuit:
        from ..circuit.request_gadget import verify_request_gadget
        from ..circuit.response_gadget import (plaintext_fields_gadget,
                                               from_outputs_gadget)
        from ..circuit.builder import PRIVATE as _PRIV
        from ..circuit.types import CBool, CInteger
        from ..console.types import INT_WIDTHS, Literal as _Lit
        from ..console.request import Response

        # typed input gadgets, with their packed plaintext fields BOUND to
        # the same bits (request/verify + function body share witnesses)
        from ..console.record import Record as _Rec
        from ..circuit.record_gadget import RecordGadget as _RG
        typed_gadgets = []
        input_field_gadgets = []
        def inject_literal(lit):
            t = lit.type_name if isinstance(lit, _Lit) else None
            if t == "field":
                return CField.new(builder, _PRIV, lit.value)
            if t == "boolean":
                return CBool.new(builder, _PRIV, lit.value)
            if t in INT_WIDTHS:
                return CInteger.new(builder, _PRIV, lit.value, INT_WIDTHS[t], t[0] == "i")
            if t == "address":
                from ..circuit.types import CAddress
                return CAddress.new(builder, _PRIV, lit.value)
            if t == "group":
                from ..circuit.types import CGroup
                return CGroup.new(builder, _PRIV, lit.value)
            if t == "scalar":
                from ..circuit.types import CScalar
                return CScalar.new(builder, _PRIV, lit.value)
            if t == "string":
                # a CString allocates 8 bits PER BYTE of the concrete
                # value, so the circuit shape would depend on the input —
                # breaking prover/verifier circuit identity (the verifier's
                # vk is synthesized from sampled inputs and key caches are
                # keyed per (program, function)). The reference forbids
                # string-typed function inputs for the same reason.
                raise HaltError("string-typed function inputs are not "
                                "provable (input-dependent circuit shape)")
            raise HaltError(f"in-circuit input type {t}")

        for inp, finput in zip(inputs, fn.inputs):
            lit = inp.value if isinstance(inp, Plaintext) and inp.kind == "literal" else inp
            if isinstance(lit, _Rec):
                # record input: one RecordGadget feeds both the request
                # gadget's record arm and the function body registers
                g = _RG.inject(builder, lit)
                typed_gadgets.append(g)
                input_field_gadgets.append(g)
                continue
            if isinstance(lit, Plaintext) and lit.kind == "struct":
                from ..circuit.types import CStruct
                members = []
                for ident, member_pt in lit.value:
                    if member_pt.kind != "literal":
                        raise HaltError("in-circuit nested-struct input "
                                        "(follow-up)")
                    mlit = member_pt.value
                    members.append((ident, mlit.type_name,
                                    inject_literal(mlit)))
                g = CStruct(builder, members, lit)
                typed_gadgets.append(g)
                input_field_gadgets.append(
                    plaintext_fields_gadget(builder, g, None))
                continue
            t = lit.type_name if isinstance(lit, _Lit) else None
            g = inject_literal(lit)
            typed_gadgets.append(g)
            input_field_gadgets.append(plaintext_fields_gadget(builder, g, t))
        parent_addr = (N.program_address(parent_pid)
                       if parent_pid is not None else None)
        ctx = verify_request_gadget(builder, request, input_types,
                                    input_field_gadgets, is_root=is_root,
                                    parent=parent_addr, root_tvk=root_tvk)
        tcm_g, tvk_g = ctx.tcm, ctx.tvk
        dual_outputs, _ = dual.execute_function(
            request.function_name, inputs, builder=builder,
            input_gadgets=typed_gadgets, expose_outputs=False, ctx=ctx)
        # Response::from_outputs over the output gadgets
        output_types = [(o.value_type.split(".")[-1], o.value_type.split(".")[0])
                        for o in fn.outputs]
        out_field_gadgets = []
        for cv, (vis, tname) in zip(dual_outputs, output_types):
            if vis in ("future", "record"):
                out_field_gadgets.append(cv.gadget)  # FutureGadget / RecordGadget
            else:
                out_field_gadgets.append(plaintext_fields_gadget(
                    builder, cv.gadget, getattr(cv.literal, "type_name", None)))
        output_registers = [int(o.operand.split(".")[0][1:])
                            for o in fn.outputs]
        out_entries = from_outputs_gadget(
            builder, request, output_types, out_field_gadgets,
            len(inputs), tvk_g, tcm_g, output_registers=output_registers)
        assert builder.is_satisfied(), "protocol circuit unsatisfied"
    else:
        # public request context: tcm + input id fields (round-1 light path)
        tcm_pub = CField.new(builder, PUBLIC, request.tcm)
        for iid in request.input_ids:
            for f in iid.fields:
                v = f[0] if isinstance(f, tuple) else f
                CField.new(builder, PUBLIC, v % R)
        dual_outputs, fn_builder = dual.execute_function(request.function_name, inputs)
        _merge_builders(builder, fn_builder)

    # transition record
    t_inputs = []
    input_tags = []
    for iid in request.input_ids:
        if iid.kind == "record":
            # Input::Record(serial_number, tag) — the wire carries sn+tag
            # (transition/input/mod.rs:104 verifier_inputs)
            t_inputs.append(("record", iid.fields[2] % R))
            input_tags.append(iid.fields[3] % R)
        else:
            f0 = iid.fields[0][0] if isinstance(iid.fields[0], tuple) else iid.fields[0]
            t_inputs.append((iid.kind, f0 % R))
            input_tags.append(None)
    tpk = None
    output_records = []
    if verify_in_circuit:
        # the full protocol circuit's public layout is
        #   [1, tpk.x, tpk.y, tcm, scm, input_ids..., is_root, parent.x,
        #    parent.y, output_ids...]
        # (stack/execute.rs:225-238 + response/from_outputs.rs); lift tpk
        # and the in-circuit output IDs straight off the public vector so
        # the wire transition carries exactly what the proof binds
        # (block/src/transition/mod.rs:51 Input/Output id semantics).
        pubs = builder.public
        tpk = (pubs[1], pubs[2])
        t_outputs = []
        for (vis, tname), entry, cv, fn_out in zip(
                [(o.value_type.split(".")[-1], o.value_type.split(".")[0])
                 for o in fn.outputs], out_entries, dual_outputs, fn.outputs):
            if vis == "record":
                com = builder.value_of(entry[0].lc) % R
                cks = builder.value_of(entry[1].lc) % R
                t_outputs.append(("record", com))
                # console encrypted record for the wire (Output::Record)
                locator = int(fn_out.operand.split(".")[0][1:])
                randomizer = N.hash_to_scalar_psd(2, [request.tvk, locator])
                enc = cv.literal.encrypt(randomizer)
                output_records.append((com, cks, enc))
            else:
                t_outputs.append((vis, builder.value_of(entry.lc) % R))
    else:
        t_outputs = []
        for out in dual_outputs:
            lit = out.literal
            if not hasattr(lit, "value") or isinstance(lit.value, str):
                # future/struct output: recorded by value, no field id here
                t_outputs.append(("future", 0))
                continue
            val = lit.value
            if isinstance(val, tuple) and val and isinstance(val[0], int):
                x = val[0]
            elif isinstance(val, (int, bool)):
                x = int(val) % R
            else:
                t_outputs.append(("future", 0))
                continue
            t_outputs.append(("public", x % R))
    transition = Transition(
        program_id=request.program_id,
        function_name=request.function_name,
        inputs=t_inputs,
        outputs=t_outputs,
        tpk=tpk,
        tcm=request.tcm,
        scm=request.scm,
        input_values=list(inputs),
        output_values=[out.literal for out in dual_outputs],
    )
    transition.input_tags = input_tags
    transition.output_records = output_records
    public = [1] + builder.public[1:]
    record_inputs = [(iid.fields[0], iid.fields[1], iid.fields[2])
                     for iid in request.input_ids if iid.kind == "record"]
    tt = TracedTransition(transition, builder, public,
                          (request.program_id, request.function_name),
                          record_inputs=record_inputs)
    tt.weak_ops = list(dual.weak_ops)
    return tt


def _merge_builders(dst: CircuitBuilder, src: CircuitBuilder):
    """Append src's variables/constraints into dst with index remapping."""
    pub_off = dst.num_public
    priv_off = dst.num_private
    dst.public.extend(src.public[1:])
    dst.private.extend(src.private)

    def remap(lc):
        from ..circuit.builder import LinearCombination
        out = LinearCombination(lc.constant)
        for (kind, idx), coeff in lc.terms.items():
            if kind == "public":
                # src index 0 is the shared ONE; others append after dst's
                out.terms[("public", 0 if idx == 0 else pub_off + idx - 1)] = coeff
            else:
                out.terms[("private", priv_off + idx)] = coeff
        return out

    for a, b, c in src.constraints:
        dst.enforce(remap(a), remap(b), remap(c))


def verify_execution(srs, proof, ordered_vks, mode=None) -> bool:
    keys_to_inputs = [(vk, inputs) for _, vk, inputs in ordered_vks]
    if mode is None:
        mode = varuna.VarunaHidingMode if proof.is_hiding() else varuna.VarunaNonHidingMode
    return varuna.verify_batch(srs, keys_to_inputs, proof, mode)


def _input_verifier_inputs(t):
    """Per-input public fields: record -> (serial_number, tag); else the
    id hash (transition/input/mod.rs:104 verifier_inputs)."""
    out = []
    input_tags = getattr(t, "input_tags", None) or [None] * len(t.inputs)
    for (kind, v), tag in zip(t.inputs, input_tags):
        if kind == "record":
            if tag is None:
                raise ValueError("record input carries no tag")
            out += [v % R, tag % R]
        else:
            out.append(v % R)
    return out


def transition_public_inputs(t, is_root: bool = True,
                             parent: tuple | None = None,
                             children=()) -> list:
    """Reconstruct the full protocol circuit's public-input vector from a
    wire Transition — the reference's verifier-side derivation
    (process/src/verify_execution.rs:164 to_transition_verifier_inputs:
    inputs are built from each transition's tpk/tcm/scm + input/output
    IDs, NEVER taken from the prover). Layout matches
    verify_request_gadget + the call-site gadget + from_outputs_gadget:
      [1, tpk.x, tpk.y, tcm, scm, input_ids..., is_root, parent.x,
       parent.y, (per child: tcm, input_ids..., output_ids...),
       output_ids...]
    `children`: this transition's direct callees (wire Transitions, call
    order) from the reconstructed call graph.
    """
    if t.tpk is None:
        raise ValueError(f"transition {t.program_id}/{t.function_name} "
                         "carries no tpk (not proven with the protocol circuit)")
    if parent is None:
        parent = N.program_address(t.program_id)
    pubs = [1, t.tpk[0] % R, t.tpk[1] % R, t.tcm % R, t.scm % R]
    pubs += _input_verifier_inputs(t)
    pubs += [1 if is_root else 0, parent[0] % R, parent[1] % R]
    for c in children:
        # verify_execution.rs:192-203: child tcm + input IDs + output IDs
        # (ONE id per output — record children contribute the commitment)
        pubs.append(c.tcm % R)
        pubs += _input_verifier_inputs(c)
        pubs += [v % R for _kind, v in c.outputs]
    checksums = {com % R: cks % R
                 for com, cks, _ in getattr(t, "output_records", None) or []}
    for kind, v in t.outputs:
        if kind == "record":
            # Output::Record contributes (commitment, checksum)
            if v % R not in checksums:
                raise ValueError("record output carries no checksum")
            pubs += [v % R, checksums[v % R]]
        else:
            pubs.append(v % R)
    return pubs


def construct_call_graph(process, transitions):
    """Process::construct_call_graph (verify_execution.rs:237): rebuild
    parent->children links from the POST-ORDER wire transitions and each
    function's static call structure. Returns {index: [child indices]}.
    Raises ValueError if the transitions do not form a valid call tree."""
    stacks = getattr(process, "stacks", process)
    counter = [0]
    graph = {}
    uid_to_idx = {}
    frames = []          # [{uid, pid, fname, idx, children(uids)|None}]

    def new_meta(pid, fname, idx):
        m = {"uid": counter[0], "pid": pid, "fname": fname, "idx": idx,
             "children": None}
        counter[0] += 1
        return m

    def complete(m):
        return m["idx"] is not None and m["children"] is not None

    def flush(m):
        try:
            graph[m["idx"]] = [uid_to_idx[u] for u in m["children"]]
        except KeyError:
            raise ValueError("invalid call-graph traversal (missing child)")
        uid_to_idx[m["uid"]] = m["idx"]

    for ti in range(len(transitions) - 1, -1, -1):
        t = transitions[ti]
        if not frames:
            frames.append(new_meta(t.program_id, t.function_name, ti))
        else:
            head = frames[-1]
            if head["pid"] == t.program_id and \
                    head["fname"] == t.function_name:
                head["idx"] = ti
            else:
                raise ValueError("unexpected transition in the execution")
        top = frames[-1]
        if complete(top):
            flush(frames.pop())
        else:
            stack = stacks.get(top["pid"])
            if stack is None:
                raise ValueError(f"program {top['pid']} not in scope")
            fn = stack.program.functions.get(top["fname"])
            if fn is None:
                raise ValueError(f"no function {top['fname']}")
            children = []
            for inst in fn.instructions:
                if inst.opcode != "call":
                    continue
                callee = inst.operands[0]
                pid, fname = (callee.split("/", 1) if "/" in callee
                              else (top["pid"], callee))
                sub = stacks.get(pid)
                if sub is not None and fname in sub.program.functions:
                    children.append(new_meta(pid, fname, None))
            top["children"] = [c["uid"] for c in children]
            frames.extend(children)
        while frames and complete(frames[-1]):
            flush(frames.pop())
    if frames or counter[0] != len(transitions):
        raise ValueError("invalid call-graph traversal")
    return graph


def verify_execution_transitions(srs, transitions, vk_resolver, proof,
                                 mode=varuna.VarunaNonHidingMode,
                                 global_state_root: int | None = None,
                                 process=None) -> bool:
    """Process::verify_execution analog (verify_execution.rs:22): group
    the transitions per function, resolve each function's TRUSTED
    verifying key via vk_resolver(fkey) (deployment store / locally
    re-synthesized — never the prover's claim), reconstruct every public
    input vector from the transitions themselves, and run one batched
    Varuna verify. Record inputs add one inclusion instance each with
    publics [1, global_state_root, serial_number] (trace/mod.rs:260;
    inclusion_gadget.ledger_inclusion_assignment layout). Raises
    ValueError on structural problems; returns the batch-verify outcome."""
    # call-tree reconstruction: which transitions are children, of whom
    # (with no process the transitions must all be roots with no calls)
    if process is not None:
        call_graph = construct_call_graph(process, transitions)
    else:
        call_graph = {i: [] for i in range(len(transitions))}
    parent_pid = {}
    for i, childs in call_graph.items():
        for c in childs:
            parent_pid[c] = transitions[i].program_id
    t_index = {id(t): i for i, t in enumerate(transitions)}

    groups = {}
    inclusion_publics = []
    # local_state_root per transition: the INCREMENTAL transaction-tree
    # root over the PRECEDING transitions' leaves
    # (trace/inclusion/mod.rs:127 prepare_verifier_inputs)
    local_roots = _local_state_roots(transitions)
    for ti, t in enumerate(transitions):
        groups.setdefault((t.program_id, t.function_name), []).append(t)
        for kind, v in t.inputs:
            if kind == "record":
                if not global_state_root:
                    raise ValueError(
                        "record inputs require a global state root")
                inclusion_publics.append(
                    [1, global_state_root % R, local_roots[ti], v % R])
    entries = []
    for fkey, ts in sorted(groups.items()):
        vk = vk_resolver(fkey)
        if vk is None:
            raise ValueError(f"no verifying key for {fkey[0]}/{fkey[1]}")
        pubs = []
        for t in ts:
            i = t_index[id(t)]
            is_root = i not in parent_pid
            parent = (N.program_address(parent_pid[i])
                      if not is_root else None)
            children = [transitions[c] for c in call_graph.get(i, [])]
            pubs.append(transition_public_inputs(
                t, is_root=is_root, parent=parent, children=children))
        entries.append((vk, pubs))
    if inclusion_publics:
        vk = vk_resolver(INCLUSION_KEY)
        if vk is None:
            raise ValueError("no inclusion verifying key")
        entries.append((vk, inclusion_publics))
    # prove_execution orders circuit groups by circuit id (varuna.rs:336
    # prove_batch's BTreeMap key order) — mirror it
    entries.sort(key=lambda e: e[0].id)
    return varuna.verify_batch(srs, entries, proof, mode)


def _local_state_roots(transitions):
    """Per-transition incremental transaction-tree roots: root over the
    TransactionLeaf structs of all PRECEDING transitions
    (trace/inclusion/mod.rs:134)."""
    from ..console.merkle import MerkleTree, BHPHasher
    from ..ledger.block import transaction_leaf_bits, TRANSACTION_DEPTH
    bhp = BHPHasher(1024, 512)
    roots, leaves = [], []
    for i, t in enumerate(transitions):
        roots.append(MerkleTree(TRANSACTION_DEPTH, bhp, list(leaves)).root)
        leaves.append(transaction_leaf_bits(1, i, t.id()))
    return roots
