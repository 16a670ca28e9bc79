"""In-circuit Request verification — circuit/program/src/request/verify.rs
mirror, composed exactly as the reference stack does
(synthesizer/process/src/stack/execute.rs:226-241):

  * tpk injected as a PUBLIC group (execute.rs:229), checked against
    `(pk_sig * challenge) + (G * response)` (request/to_tpk.rs:19).
  * Request injected with tcm PUBLIC, scm PUBLIC, input IDs PUBLIC
    (request/mod.rs:150-221); signer/pk_sig/pr_sig as private groups
    with full subgroup enforcement.
  * is_root PUBLIC boolean + parent PUBLIC address (execute.rs:233-236);
    caller = ternary(is_root, signer, parent) (execute.rs:238).
  * tpk_checks: tcm == H2(tvk), scm == H2(signer.x, root_tvk),
    tpk == to_tpk() (verify.rs:68-80).
  * signature_checks: challenge' = HashToScalar_psd8([tpk.x, pk_sig.x,
    pr_sig.x, signer.x, tvk, tcm, fid, is_root] ++ input message),
    signer == compute_key.to_address() with
    sk_prf = HashToScalar_psd4([pk_sig.x, pr_sig.x])
    (verify.rs:83-104, account/src/compute_key/from.rs:19).

The resulting public-input layout matches the shipped verifier keys'
(verify_execution.rs:186-206): [1, tpk_x, tpk_y, tcm, scm, input_ids...,
is_root, parent_x, parent_y, output_ids...].
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from ..console.request import Request, compute_function_id
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField, CBool, CGroup
from . import poseidon_gadget

R = P.R
S = P.S
SCALAR_BITS = 251


@dataclass
class RequestCtx:
    """Gadget handles the executor binds into the function body."""
    tcm: CField
    tvk: CField
    signer: CGroup
    caller: CGroup
    is_root: CBool


def g_scalar_multiply_gadget(builder, scalar_bits):
    """Constant-base scalar mul over the account bases (mainnet GENERATOR_G):
    sum of bit-conditioned constant points via complete adds + ternaries."""
    bases = N.generator_g()
    acc = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    for i, bit in enumerate(scalar_bits[:SCALAR_BITS]):
        base = CGroup.constant(builder, ed.to_affine(bases[i]))
        added = acc + base
        nx = added.x.ternary(bit, acc.x)
        ny = added.y.ternary(bit, acc.y)
        acc = CGroup(builder, nx, ny)
    return acc


def var_scalar_multiply_gadget(builder, point: CGroup, scalar_bits):
    """Variable-base double-and-add."""
    return point.mul_bits(list(scalar_bits[:SCALAR_BITS]))


def scalar_to_bits_gadget(builder, value: int):
    """Inject a scalar as SCALAR_BITS private bits + return (bits, field LC)."""
    bits = [CBool.new(builder, PRIVATE, (value >> i) & 1) for i in range(SCALAR_BITS)]
    acc = LinearCombination(0)
    coeff = 1
    for b in bits:
        acc = acc.add(b.lc, coeff)
        coeff = coeff * 2 % R
    return bits, CField(builder, acc)


def hash_to_scalar_bits_gadget(builder, rate, inputs):
    """hash_psd{rate} -> field -> low 250 bits (from_field_lossy)."""
    out = poseidon_gadget.hash_psd(builder, rate, inputs)[0]
    bits = out.to_bits_le(253)
    return bits[:250]


def signature_verify_gadget(builder: CircuitBuilder, sig, address: CGroup,
                            msg_fields) -> "CBool":
    """circuit/account/src/signature/verify.rs: g_r recompute, challenge
    re-derivation over [g_r.x, pk_sig.x, pr_sig.x, addr.x, message...],
    and address == pk_sig + pr_sig + G^sk_prf. Returns a Boolean gadget
    (the `sign.verify` opcode yields a value, it does not assert)."""
    chal_bits, chal_field = scalar_to_bits_gadget(builder, sig.challenge % S)
    resp_bits, _ = scalar_to_bits_gadget(builder, sig.response % S)
    pk_sig = CGroup.new(builder, PRIVATE, sig.compute_key.pk_sig)
    pr_sig = CGroup.new(builder, PRIVATE, sig.compute_key.pr_sig)
    g_r = (g_scalar_multiply_gadget(builder, resp_bits)
           + var_scalar_multiply_gadget(builder, pk_sig, chal_bits))
    preimage = [g_r.x, pk_sig.x, pr_sig.x, address.x] + list(msg_fields)
    cand_bits = hash_to_scalar_bits_gadget(builder, 8, preimage)
    acc = LinearCombination(0)
    coeff = 1
    for b in cand_bits:
        acc = acc.add(b.lc, coeff)
        coeff = coeff * 2 % R
    eq_chal = chal_field.is_equal(CField(builder, acc))
    sk_prf_bits = hash_to_scalar_bits_gadget(builder, 4, [pk_sig.x, pr_sig.x])
    cand_addr = pk_sig + pr_sig + g_scalar_multiply_gadget(builder, sk_prf_bits)
    return eq_chal & address.is_equal(cand_addr)


def verify_request_gadget(builder: CircuitBuilder, request: Request, input_types,
                          input_gadgets, is_root: bool = True,
                          parent: tuple | None = None,
                          root_tvk: int | None = None,
                          return_tvk: bool = False):
    """input_gadgets: per input, the list of CField gadgets of its fields
    (already injected; bound to the function body registers by the caller).

    `parent` is the caller's address point (program address when root);
    `root_tvk` defaults to the request's own tvk (execute.rs:214-224).
    Returns a RequestCtx (or the legacy (tcm, tvk)/(tcm) shapes when
    return_tvk is passed by older callers)."""
    fid_const = compute_function_id(request.network_id, request.program_id,
                                    request.function_name)
    fid = CField.constant(builder, fid_const)

    # --- tpk as Mode::Public (execute.rs:229), value = to_tpk() ---
    chal_int = request.signature.challenge % S
    resp_int = request.signature.response % S
    pk_sig_pt = request.signature.compute_key.pk_sig
    tpk_val = ed.add(ed.mul(pk_sig_pt, chal_int), N.g_scalar_multiply(resp_int))
    tpk = CGroup.new(builder, PUBLIC, tpk_val)

    # --- Request inject (request/mod.rs:150): tcm, scm public; then
    #     input IDs public in input order ---
    tcm = CField.new(builder, PUBLIC, request.tcm)
    scm = CField.new(builder, PUBLIC, request.scm)
    iid_pubs = []
    for iid in request.input_ids:
        if iid.kind == "record":
            # request/mod.rs Inject record arm: commitment + gamma
            # Mode::Private, serial number + tag Mode::Public — the
            # transition's verifier inputs are exactly (sn, tag)
            # (transition/input/mod.rs:104 verifier_inputs)
            commitment_c, gamma_pt, sn_c, tag_c = iid.fields
            iid_pubs.append((
                CField.new(builder, PRIVATE, commitment_c),
                CGroup.new(builder, PRIVATE, gamma_pt),
                CField.new(builder, PUBLIC, sn_c),
                CField.new(builder, PUBLIC, tag_c),
            ))
        else:
            iid_pubs.append(CField.new(builder, PUBLIC, iid.fields[0]))
    signer = CGroup.new(builder, PRIVATE, request.signer)
    pk_sig = CGroup.new(builder, PRIVATE, pk_sig_pt)
    pr_sig = CGroup.new(builder, PRIVATE, request.signature.compute_key.pr_sig)
    resp_bits, _ = scalar_to_bits_gadget(builder, resp_int)
    chal_bits, chal_field = scalar_to_bits_gadget(builder, chal_int)
    tvk = CField.new(builder, PRIVATE, request.tvk)

    # --- is_root / parent as Mode::Public; caller ternary ---
    is_root_b = CBool.new(builder, PUBLIC, 1 if is_root else 0)
    parent_pt = parent if parent is not None else N.program_address(request.program_id)
    parent_g = CGroup.new(builder, PUBLIC, parent_pt)
    caller = signer.ternary(is_root_b, parent_g)
    is_root_f = CField.constant(builder, 1).ternary(
        is_root_b, CField.constant(builder, 0))

    # --- input ID checks + message (verify.rs:110 check_input_ids) ---
    input_hashes = []
    checks = []
    sk_tag_g = None
    for index, ((vis, _name), gadgets, iid_pub) in enumerate(
            zip(input_types, input_gadgets, iid_pubs)):
        if vis in ("public", "constant"):
            preimage = [fid] + list(gadgets) + [tcm, CField.constant(builder, index)]
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
            checks.append(iid_pub.is_equal(h))
            input_hashes.append(iid_pub)
        elif vis == "private":
            # ivk = H4([fid, tvk, index]); ct_i = f_i + H8-stream; hash ct
            ivk = poseidon_gadget.hash_psd(
                builder, 4, [fid, tvk, CField.constant(builder, index)])[0]
            n = len(gadgets)
            randomizers = poseidon_gadget.hash_psd(
                builder, 8,
                [CField.constant(builder, N.ENCRYPTION_DOMAIN), ivk], num_outputs=n)
            ct = [g + r for g, r in zip(gadgets, randomizers)]
            h = poseidon_gadget.hash_psd(builder, 8, ct)[0]
            checks.append(iid_pub.is_equal(h))
            input_hashes.append(iid_pub)
        elif vis == "record":
            # verify.rs:214-266 record arm
            from .record_gadget import (RecordGadget,
                                        serial_number_from_gamma_gadget,
                                        record_tag_gadget)
            commitment_g, gamma_g, sn_pub, tag_pub = iid_pub
            record_g = gadgets          # a RecordGadget (not field list)
            assert isinstance(record_g, RecordGadget), \
                "record input requires a RecordGadget"
            if sk_tag_g is None:
                sk_tag_g = CField.new(builder, PRIVATE, request.sk_tag)
            cand_commitment = record_g.to_commitment(request.program_id, _name)
            cand_sn = serial_number_from_gamma_gadget(
                builder, gamma_g, cand_commitment)
            cand_tag = record_tag_gadget(builder, sk_tag_g, cand_commitment)
            # H = HashToGroup_psd2([SN domain, commitment]);
            # h_r = gamma*challenge + H*response  (== r*H)
            from .elligator_gadget import hash_to_group_gadget
            h_pt = hash_to_group_gadget(
                builder, 2, [CField.constant(builder, N.SERIAL_NUMBER_DOMAIN),
                             cand_commitment])
            h_r = (var_scalar_multiply_gadget(builder, gamma_g, chal_bits)
                   + var_scalar_multiply_gadget(builder, h_pt, resp_bits))
            input_hashes += [h_pt.x, h_r.x, gamma_g.x, cand_tag]
            checks.append(sn_pub.is_equal(cand_sn))
            checks.append(commitment_g.is_equal(cand_commitment))
            checks.append(tag_pub.is_equal(cand_tag))
            checks.append(record_g.owner.group.is_equal(signer))
        elif vis == "external_record":
            # verify.rs:268 ExternalRecord arm: the input id is a tvk-keyed
            # hash over the record's packed fields — psd8([fid] + fields +
            # [tvk, index]); the record itself stays private.
            from .record_gadget import RecordGadget
            rg = gadgets
            assert isinstance(rg, RecordGadget), \
                "external_record input requires a RecordGadget"
            preimage = ([fid] + rg.to_fields()
                        + [tvk, CField.constant(builder, index)])
            h = poseidon_gadget.hash_psd(builder, 8, preimage)[0]
            checks.append(iid_pub.is_equal(h))
            input_hashes.append(iid_pub)
        else:
            raise NotImplementedError(f"in-circuit input kind {vis}")

    # --- tpk / commitment checks (verify.rs:68-80) ---
    tcm_check = poseidon_gadget.hash_psd(builder, 2, [tvk])[0]
    rtvk = request.tvk if root_tvk is None else root_tvk
    root_tvk_g = CField.new(builder, PRIVATE, rtvk)
    scm_check = poseidon_gadget.hash_psd(builder, 2, [signer.x, root_tvk_g])[0]
    g_resp = g_scalar_multiply_gadget(builder, resp_bits)
    pk_chal = var_scalar_multiply_gadget(builder, pk_sig, chal_bits)
    tpk_check = pk_chal + g_resp
    checks.append(tpk.is_equal(tpk_check))
    checks.append(tcm.is_equal(tcm_check))
    checks.append(scm.is_equal(scm_check))

    # --- signature checks (verify.rs:83-104) ---
    msg = [tpk.x, pk_sig.x, pr_sig.x, signer.x, tvk, tcm, fid,
           is_root_f] + input_hashes
    cand_bits = hash_to_scalar_bits_gadget(builder, 8, msg)
    acc = LinearCombination(0)
    coeff = 1
    for b in cand_bits:
        acc = acc.add(b.lc, coeff)
        coeff = coeff * 2 % R
    checks.append(chal_field.is_equal(CField(builder, acc)))
    # candidate address: sk_prf = HashToScalar_psd4([pk_sig.x, pr_sig.x]);
    # address = pk_sig + pr_sig + G*sk_prf (compute_key/{from,to_address}.rs)
    sk_prf_bits = hash_to_scalar_bits_gadget(
        builder, 4, [pk_sig.x, pr_sig.x])
    pk_prf = g_scalar_multiply_gadget(builder, sk_prf_bits)
    cand_addr = pk_sig + pr_sig + pk_prf
    checks.append(signer.is_equal(cand_addr))

    ok = checks[0]
    for c in checks[1:]:
        ok = ok & c
    builder.assert_eq(ok.lc, LinearCombination(1))

    ctx = RequestCtx(tcm=tcm, tvk=tvk, signer=signer, caller=caller,
                     is_root=is_root_b)
    if return_tvk:
        return tcm, tvk
    return ctx
