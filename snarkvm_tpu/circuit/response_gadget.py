"""In-circuit Response::from_outputs (circuit/program/src/response/mod.rs):
recompute each transition output ID inside the circuit and expose it as a
public input.

Covered output kinds: constant/public (hash_psd8 over [fid, fields, tcm,
index]), private (ovk = H4([fid, tvk, index]), field-stream encryption,
H8 over the ciphertext), future (hash over [fid, tcm, index]). Record
output commitments (in-circuit record serialization + BHP commit) are a
follow-up tracked in ROADMAP.md.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..console import network as N
from ..console.request import compute_function_id
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField
from . import poseidon_gadget

R = P.R


def _plaintext_bit_stream(gadget, type_name: str, marker: bool):
    """[("c", const_bit) | ("g", CBool)] stream of a literal Plaintext's
    bits (types.py:167 layout: [0,0] + variant u8 + size u16 + payload),
    optionally with the to_fields trailing true marker."""
    from ..console.types import VARIANTS, INT_WIDTHS, int_to_bits_le
    from .types import CBool, CStruct

    if isinstance(gadget, CStruct):
        # Plaintext::Struct layout (console/types.py:175): [0,1] + len(8)
        # + per member: ident size(8) + ident bits + value-bits len(16) +
        # the member's FULL plaintext bit stream
        stream = [("c", False), ("c", True)]
        stream += [("c", x) for x in int_to_bits_le(len(gadget.members), 8)]
        for ident, tname, g in gadget.members:
            stream += [("c", x) for x in int_to_bits_le(ident.size_in_bits(), 8)]
            stream += [("c", x) for x in ident.to_bits_le()]
            sub = _plaintext_bit_stream(g, tname, marker=False)
            stream += [("c", x) for x in int_to_bits_le(len(sub), 16)]
            stream += sub
        if marker:
            stream.append(("c", True))
        return stream

    if type_name == "boolean":
        payload = [gadget] if isinstance(gadget, CBool) else list(gadget.bits)
        size = 1
    elif type_name == "field":
        payload = gadget.to_bits_le(253)
        size = 253
    elif type_name in INT_WIDTHS:
        payload = list(gadget.bits)
        size = INT_WIDTHS[type_name]
    elif type_name in ("address", "group"):
        # console bit layout: the x-coordinate's 253 canonical bits
        from .types import CAddress, CGroup
        grp = gadget.group if isinstance(gadget, CAddress) else gadget
        payload = grp.x.to_bits_le(253, canonical=True)
        size = 253
    elif type_name == "scalar":
        payload = list(gadget.bits)
        size = 251
    elif type_name == "string":
        from .types import CString
        assert isinstance(gadget, CString)
        payload = gadget.to_bits_le()
        size = len(payload)
    else:
        raise NotImplementedError(f"plaintext packing for {type_name}")

    header = [False, False]
    v = VARIANTS[type_name]
    header += [(v >> i) & 1 == 1 for i in range(8)]
    header += [(size >> i) & 1 == 1 for i in range(16)]
    stream = [("c", b) for b in header] + [("g", bt) for bt in payload]
    if marker:
        stream.append(("c", True))
    return stream


def plaintext_bits_gadget(builder: CircuitBuilder, gadget, type_name: str):
    """Plaintext::to_bits_le of a literal gadget as CBool list (constants
    materialized) — the preimage for hash.bhp/ped/keccak/sha3 gadgets."""
    from .types import CBool
    out = []
    for kind, item in _plaintext_bit_stream(gadget, type_name, marker=False):
        out.append(CBool.constant(builder, item) if kind == "c" else item)
    return out


def plaintext_fields_gadget(builder: CircuitBuilder, gadget, type_name: str):
    """Packed Plaintext::to_fields of a literal gadget, as CField LCs bound
    to the gadget's bits (252-bit chunks with the trailing marker)."""
    from .builder import LinearCombination

    stream = _plaintext_bit_stream(gadget, type_name, marker=True)
    fields = []
    for i in range(0, len(stream), 252):
        chunk = stream[i : i + 252]
        acc = LinearCombination(0)
        coeff = 1
        for kind, item in chunk:
            if kind == "c":
                if item:
                    acc = acc.add(LinearCombination(1), coeff)
            else:
                acc = acc.add(item.lc, coeff)
            coeff = coeff * 2 % R
        fields.append(CField(builder, acc))
    return fields


def future_bit_stream(builder, fut_gadget):
    """[("c", bool) | ("g", CBool)] stream of a future's bits
    (console future/to_bits.rs layout): the program id / function name /
    counts / length prefixes are constants; argument payload bits come
    from the bound gadgets. fut_gadget: a FutureGadget (circuit_exec)
    with .future (console Future) and .arg_gadgets
    [(type_name, gadget | None, console_arg)]."""
    from ..console.types import int_to_bits_le, bytes_to_bits_le

    fut = fut_gadget.future
    name, network = fut.program_id.rsplit(".", 1)
    pid_bits = bytes_to_bits_le(name.encode()) + bytes_to_bits_le(network.encode())
    stream = [("c", b) for b in int_to_bits_le(len(pid_bits), 16) + pid_bits]
    fn_bits = bytes_to_bits_le(fut.function_name.encode())
    stream += [("c", b) for b in int_to_bits_le(len(fn_bits), 16) + fn_bits]
    stream += [("c", b) for b in int_to_bits_le(len(fut_gadget.arg_gadgets), 8)]
    for tname, gadget, console_arg in fut_gadget.arg_gadgets:
        if tname == "future" and gadget is not None:
            # nested future from a child call: Argument::Future variant
            # with the CHILD FutureGadget's bound bit stream
            sub = future_bit_stream(builder, gadget)
            n = 1 + len(sub)
            stream += [("c", b) for b in int_to_bits_le(n, 16)]
            stream.append(("c", True))
            stream += sub
            continue
        if gadget is None:
            # console-only argument (nested future / record): constant bits
            from ..console.types import Future, future_from_value
            variant = (isinstance(console_arg, Future)
                       or getattr(console_arg, "kind", None) == "future")
            raw = (future_from_value(console_arg).to_bits_le() if variant
                   else console_arg.to_bits_le())
            bits = [variant] + raw
            stream += [("c", b) for b in int_to_bits_le(len(bits), 16)]
            stream += [("c", b) for b in bits]
        else:
            body = _plaintext_bit_stream(gadget, tname, marker=False)
            n = 1 + len(body)
            stream += [("c", b) for b in int_to_bits_le(n, 16)]
            stream.append(("c", False))  # Argument::Plaintext variant
            stream += body
    return stream


def future_fields_gadget(builder, fut_gadget):
    """Future::to_fields in-circuit: bit stream + terminus marker packed
    into 252-bit CField chunks (future/to_fields.rs:23)."""
    from .builder import LinearCombination

    stream = future_bit_stream(builder, fut_gadget) + [("c", True)]
    fields = []
    for i in range(0, len(stream), 252):
        chunk = stream[i : i + 252]
        acc = LinearCombination(0)
        coeff = 1
        for kind, item in chunk:
            if kind == "c":
                if item:
                    acc = acc.add(LinearCombination(1), coeff)
            else:
                acc = acc.add(item.lc, coeff)
            coeff = coeff * 2 % R
        fields.append(CField(builder, acc))
    return fields


def from_outputs_gadget(builder: CircuitBuilder, request, output_types,
                        output_field_gadgets, num_inputs: int,
                        tvk_gadget: CField, tcm_gadget: CField,
                        output_registers=None):
    """output_field_gadgets: per output, the list of CField gadgets of its
    plaintext fields (None for futures; a RecordGadget for records).
    output_registers: per output, the destination register locator (record
    outputs derive their encryption randomizer from it,
    response/from_outputs.rs:118-120). Returns the list of public
    output-ID CFields — a (commitment, checksum) pair for records —
    asserted equal to the in-circuit recomputation."""
    fid_const = compute_function_id(request.network_id, request.program_id,
                                    request.function_name)
    fid = CField.constant(builder, fid_const)
    out_ids = []
    for index, ((vis, _name), gadgets) in enumerate(
            zip(output_types, output_field_gadgets)):
        idx_const = CField.constant(builder, num_inputs + index)
        if vis in ("constant", "public"):
            preimage = [fid] + list(gadgets) + [tcm_gadget, idx_const]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        elif vis == "private":
            ovk = poseidon_gadget.hash_psd(
                builder, 4, [fid, tvk_gadget, idx_const])[0]
            n = len(gadgets)
            randomizers = poseidon_gadget.hash_psd(
                builder, 8,
                [CField.constant(builder, N.ENCRYPTION_DOMAIN), ovk],
                num_outputs=n)
            ct = [g + r for g, r in zip(gadgets, randomizers)]
            h = poseidon_gadget.hash_psd(builder, 8, ct)[0]
        elif vis == "future":
            # from_outputs.rs:151: hash (fid || future fields || tcm || idx);
            # the future's fields are recomposed in-circuit from the
            # argument gadgets (length prefixes/identifiers are constants)
            fut_fields = future_fields_gadget(builder, gadgets)
            preimage = [fid] + fut_fields + [tcm_gadget, idx_const]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        elif vis == "record":
            # from_outputs.rs:99-127 record arm: commitment, randomizer
            # from (tvk, output register locator), in-circuit encryption,
            # BHP1024 checksum; commitment + checksum become the two
            # public verifier inputs (transition/output/mod.rs:150)
            from .record_gadget import RecordGadget, encrypt_record_gadget
            from .request_gadget import hash_to_scalar_gadget
            from .bhp_gadget import bhp_hash_gadget
            rg = gadgets
            assert isinstance(rg, RecordGadget), \
                "record output requires a RecordGadget"
            commitment = rg.to_commitment(request.program_id, _name)
            locator = (output_registers or [None] * len(output_types))[index]
            assert locator is not None, "record output requires its register"
            # from_outputs.rs:118: randomizer := HashToScalar(tvk || index)
            # is ALWAYS derived here; encrypt (record/encrypt.rs:22)
            # asserts nonce == G^randomizer unconditionally
            randomizer = hash_to_scalar_gadget(
                builder, 2, [tvk_gadget, CField.constant(builder, locator)])
            ct_bits = encrypt_record_gadget(builder, rg, randomizer)
            checksum = bhp_hash_gadget(builder, 1024, "AleoBHP1024", ct_bits)
            # OutputID::record (response/mod.rs:55): inject the public
            # ids and assert (public, 1, computed) — the computed LC
            # rides in the C matrix
            pub_c = CField.new(builder, PUBLIC, builder.value_of(commitment.lc))
            pub_c.assert_eq(commitment)
            pub_k = CField.new(builder, PUBLIC, builder.value_of(checksum.lc))
            pub_k.assert_eq(checksum)
            out_ids.append((pub_c, pub_k))
            continue
        elif vis == "external_record":
            # from_outputs.rs ExternalRecord arm: output id =
            # psd8([fid] + record fields + [tvk, index]) — tvk-keyed, the
            # record rides privately to the destination program
            from .record_gadget import RecordGadget
            rg = gadgets
            assert isinstance(rg, RecordGadget), \
                "external_record output requires a RecordGadget"
            preimage = [fid] + rg.to_fields() + [tvk_gadget, idx_const]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
        else:
            raise NotImplementedError(f"in-circuit output kind {vis}")
        # OutputID inject+assert (response/mod.rs:70): (public, 1, computed)
        pub = CField.new(builder, PUBLIC, builder.value_of(h.lc))
        pub.assert_eq(h)
        out_ids.append(pub)
    return out_ids
