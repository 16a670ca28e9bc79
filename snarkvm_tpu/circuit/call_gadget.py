"""In-circuit external function call — the parent-side gadget of
`call child.aleo/fn` (synthesizer/process/src/stack/call/mod.rs:396-446):

  * child `tcm` injected PUBLIC and asserted == Hash_psd2(child tvk)
    (tvk/signer/sk_tag private);
  * child input IDs injected PUBLIC and recomputed from the PARENT's
    operand gadgets (circuit::Request::check_input_ids::<false> — the
    input-id arms WITHOUT the signature message);
  * child outputs injected PRIVATE with their output IDs PUBLIC
    (circuit::Response::process_outputs_from_callback — the
    from_outputs arms over injected values), and bound into the
    parent's destination registers.

The public-variable sequence this appends at the call site — child tcm,
child input IDs, child output IDs — is exactly what the verifier
re-derives per child in the call graph (verify_execution.rs:192-203),
and what the CHILD transition's own circuit proves about the same ids.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..console import network as N
from ..console.record import Record
from ..console.types import Plaintext, Literal, Value, future_from_value
from ..console.request import compute_function_id
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField, CBool, CGroup
from . import poseidon_gadget

R = P.R


def _operand_field_gadgets(builder, cv, vis):
    """Parent operand CircuitValue -> the input-arm gadget shape:
    RecordGadget for (external_)record inputs, else the packed plaintext
    field list of the typed gadget."""
    from .record_gadget import RecordGadget
    from .response_gadget import plaintext_fields_gadget
    from .types import CStruct
    if vis in ("record", "external_record"):
        if isinstance(cv.gadget, RecordGadget):
            return cv.gadget
        from ..synthesizer.interpreter import HaltError
        raise HaltError(f"call record operand has no record gadget")
    g = cv.gadget
    if g is None:
        from ..synthesizer.interpreter import HaltError
        raise HaltError("call operand is not circuit-bound")
    if isinstance(g, CStruct):
        return plaintext_fields_gadget(builder, g, None)
    tname = getattr(cv.literal, "type_name", None)
    return plaintext_fields_gadget(builder, g, tname)


def check_child_input_ids(builder, request, input_types, operand_cvs,
                          tcm, tvk, signer, sk_tag):
    """check_input_ids::<false>: inject each child input id PUBLIC and
    assert it matches the recomputation from the parent's operands."""
    from .record_gadget import (RecordGadget,
                                serial_number_from_gamma_gadget,
                                record_tag_gadget)
    fid = CField.constant(builder, compute_function_id(
        request.network_id, request.program_id, request.function_name))
    checks = []
    for index, (iid, (vis, _name), cv) in enumerate(
            zip(request.input_ids, input_types, operand_cvs)):
        gadgets = _operand_field_gadgets(builder, cv, vis)
        if vis == "record":
            commitment_c, gamma_pt, sn_c, tag_c = iid.fields
            commitment_g = CField.new(builder, PRIVATE, commitment_c)
            gamma_g = CGroup.new(builder, PRIVATE, gamma_pt)
            sn_pub = CField.new(builder, PUBLIC, sn_c)
            tag_pub = CField.new(builder, PUBLIC, tag_c)
            rg = gadgets
            cand_commitment = rg.to_commitment(request.program_id, _name)
            cand_sn = serial_number_from_gamma_gadget(
                builder, gamma_g, cand_commitment)
            cand_tag = record_tag_gadget(builder, sk_tag, cand_commitment)
            checks += [sn_pub.is_equal(cand_sn),
                       commitment_g.is_equal(cand_commitment),
                       tag_pub.is_equal(cand_tag),
                       rg.owner.group.is_equal(signer)]
            continue
        iid_pub = CField.new(builder, PUBLIC, iid.fields[0])
        idx_c = CField.constant(builder, index)
        if vis in ("public", "constant"):
            preimage = [fid] + list(gadgets) + [tcm, idx_c]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        elif vis == "private":
            ivk = poseidon_gadget.hash_psd(builder, 4, [fid, tvk, idx_c])[0]
            n = len(gadgets)
            randomizers = poseidon_gadget.hash_psd(
                builder, 8,
                [CField.constant(builder, N.ENCRYPTION_DOMAIN), ivk],
                num_outputs=n)
            ct = [g + r for g, r in zip(gadgets, randomizers)]
            h = poseidon_gadget.hash_psd(builder, 8, ct)[0]
        elif vis == "external_record":
            preimage = [fid] + gadgets.to_fields() + [tvk, idx_c]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        else:
            from ..synthesizer.interpreter import HaltError
            raise HaltError(f"call input visibility {vis}")
        checks.append(iid_pub.is_equal(h))
    return checks


def _inject_output(builder, value, vis, tname):
    """Child output (console value) -> (CircuitValue-ish pair: console,
    gadget-for-from_outputs, gadget-for-register)."""
    from ..synthesizer.circuit_exec import _inject, FutureGadget, CircuitValue
    from .record_gadget import RecordGadget
    from .response_gadget import plaintext_fields_gadget
    if vis == "future":
        # child future output: Value("future", (pid, fname, args)) — the
        # arguments inject privately so the parent's own future (which
        # awaits this one) hashes BOUND bits, not constants
        fut = future_from_value(value)
        args = value.value[2] if getattr(value, "kind", None) == "future" \
            else [a for _, a in fut.arguments]
        arg_gadgets = []
        for arg in args:
            lit = arg.value if isinstance(arg, Plaintext) and \
                arg.kind == "literal" else arg
            at = getattr(lit, "type_name", None)
            if at is None:
                arg_gadgets.append((None, None, arg))
                continue
            cv = _inject(builder, lit, PRIVATE)
            arg_gadgets.append((at, cv.gadget, lit))
        fg = FutureGadget(fut, arg_gadgets)
        return CircuitValue(value, fg), fg
    if vis in ("record", "external_record"):
        assert isinstance(value, Record)
        rg = RecordGadget.inject(builder, value)
        return CircuitValue(value, rg), rg
    lit = value.value if isinstance(value, Plaintext) and \
        value.kind == "literal" else value
    cv = _inject(builder, lit, PRIVATE)
    fields = plaintext_fields_gadget(builder, cv.gadget,
                                     getattr(lit, "type_name", None))
    return cv, fields


def _callback_output_ids(builder, request, output_types, out_field_gadgets,
                         num_inputs, tvk, tcm):
    """Response::process_outputs_from_callback
    (circuit/program/src/response/process_outputs_from_callback.rs):
    ONE public id per output — record child outputs expose only the
    commitment (the child's own circuit proves checksum/nonce)."""
    from .response_gadget import future_fields_gadget
    from .record_gadget import RecordGadget
    fid = CField.constant(builder, compute_function_id(
        request.network_id, request.program_id, request.function_name))
    for index, ((vis, _name), gadgets) in enumerate(
            zip(output_types, out_field_gadgets)):
        idx_c = CField.constant(builder, num_inputs + index)
        if vis in ("constant", "public"):
            preimage = [fid] + list(gadgets) + [tcm, idx_c]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        elif vis == "private":
            ovk = poseidon_gadget.hash_psd(builder, 4, [fid, tvk, idx_c])[0]
            n = len(gadgets)
            randomizers = poseidon_gadget.hash_psd(
                builder, 8,
                [CField.constant(builder, N.ENCRYPTION_DOMAIN), ovk],
                num_outputs=n)
            ct = [g + r for g, r in zip(gadgets, randomizers)]
            h = poseidon_gadget.hash_psd(builder, 8, ct)[0]
        elif vis == "record":
            assert isinstance(gadgets, RecordGadget)
            h = gadgets.to_commitment(request.program_id, _name)
        elif vis == "external_record":
            assert isinstance(gadgets, RecordGadget)
            preimage = [fid] + gadgets.to_fields() + [tvk, idx_c]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        elif vis == "future":
            fut_fields = future_fields_gadget(builder, gadgets)
            preimage = [fid] + fut_fields + [tcm, idx_c]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        else:
            from ..synthesizer.interpreter import HaltError
            raise HaltError(f"callback output visibility {vis}")
        pub = CField.new(builder, PUBLIC, builder.value_of(h.lc))
        h.assert_eq(pub)


def external_call_gadget(builder: CircuitBuilder, child_stack, request,
                         input_types, operand_cvs, child_tt):
    """The full call-site gadget; returns the parent-register
    CircuitValues for the child's outputs."""
    from ..synthesizer.process import fn_output_types

    fn = child_stack.program.functions[request.function_name]
    # --- child context: tvk/signer/sk_tag private, tcm public + checked
    signer = CGroup.new(builder, PRIVATE, request.signer)
    sk_tag = CField.new(builder, PRIVATE, request.sk_tag)
    tvk = CField.new(builder, PRIVATE, request.tvk)
    tcm = CField.new(builder, PUBLIC, request.tcm)
    cand_tcm = poseidon_gadget.hash_psd(builder, 2, [tvk])[0]
    builder.assert_eq(tcm.lc, cand_tcm.lc)

    # --- child input ids (public) recomputed from the parent's operands
    checks = check_child_input_ids(builder, request, input_types,
                                   operand_cvs, tcm, tvk, signer, sk_tag)
    ok = checks[0]
    for c in checks[1:]:
        ok = ok & c
    builder.assert_eq(ok.lc, LinearCombination(1))

    # --- child outputs: inject private, ONE public id each
    output_types = fn_output_types(fn)
    outputs = child_tt.transition.output_values
    out_cvs, out_field_gadgets = [], []
    for value, (vis, tname) in zip(outputs, output_types):
        cv, g = _inject_output(builder, value, vis, tname)
        out_cvs.append(cv)
        out_field_gadgets.append(g)
    _callback_output_ids(builder, request, output_types, out_field_gadgets,
                         len(request.inputs), tvk, tcm)
    return out_cvs
