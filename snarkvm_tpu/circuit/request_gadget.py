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
from .types import CField, CBool, CGroup, CScalar
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


def g_scalar_multiply_gadget(builder, scalar):
    """A::g_scalar_multiply (circuit/network/src/v0.rs:145): fold over
    the precomputed GENERATOR_G bases,
    `output = ternary(bit, output + base, output)`. `scalar` is a
    CScalar (bits derived lazily, range-checked once) or a raw
    little-endian CBool list."""
    bases = N.generator_g()
    bits = scalar.to_bits_le() if isinstance(scalar, CScalar) \
        else list(scalar)[:SCALAR_BITS]
    output = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    for base_pt, bit in zip(bases, bits):
        base = CGroup.constant(builder, ed.to_affine(base_pt))
        output = (output + base).ternary(bit, output)
    return output


def var_scalar_multiply_gadget(builder, point: CGroup, scalar):
    """Variable-base mul (group/src/mul.rs:167): MSB-first
    double-and-add over the scalar's big-endian bits."""
    if isinstance(scalar, CScalar):
        return point.mul_scalar(scalar)
    return point.mul_bits(list(scalar)[:SCALAR_BITS])


def hash_to_scalar_gadget(builder, rate, inputs) -> CScalar:
    """A::hash_to_scalar_psd{rate}
    (circuit/algorithms/src/poseidon/hash_to_scalar.rs:25): hash to a
    field, project onto the scalar field by 250-bit truncation."""
    out = poseidon_gadget.hash_psd(builder, rate, inputs)[0]
    return CScalar.from_field_lossy(builder, out)


def hash_to_scalar_bits_gadget(builder, rate, inputs):
    """Legacy bit-list view of hash_to_scalar_gadget."""
    return hash_to_scalar_gadget(builder, rate, inputs).to_bits_le()[:250]


def signature_verify_gadget(builder: CircuitBuilder, sig, address: CGroup,
                            msg_fields) -> "CBool":
    """circuit/account/src/signature/verify.rs:20: g_nonce recompute,
    challenge re-derivation over [g_nonce.x, pk_sig.x, pr_sig.x, addr.x,
    message...], and address == pk_sig + pr_sig + G^sk_prf. Returns a
    Boolean gadget (the `sign.verify` opcode yields a value, it does not
    assert)."""
    challenge = CScalar.new(builder, PRIVATE, sig.challenge % S)
    response = CScalar.new(builder, PRIVATE, sig.response % S)
    pk_sig = CGroup.new(builder, PRIVATE, sig.compute_key.pk_sig)
    pr_sig = CGroup.new(builder, PRIVATE, sig.compute_key.pr_sig)
    # g_nonce := (response * G) + (challenge * pk_sig)  (verify.rs:27)
    g_nonce = (g_scalar_multiply_gadget(builder, response)
               + pk_sig.mul_scalar(challenge))
    preimage = [g_nonce.x, pk_sig.x, pr_sig.x, address.x] + list(msg_fields)
    cand_challenge = hash_to_scalar_gadget(builder, 8, preimage)
    # candidate address (compute_key/{from,to_address}.rs)
    sk_prf = hash_to_scalar_gadget(builder, 4, [pk_sig.x, pr_sig.x])
    cand_addr = pk_sig + pr_sig + g_scalar_multiply_gadget(builder, sk_prf)
    return challenge.is_equal(cand_challenge) & address.is_equal(cand_addr)


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
    # signature scalars as field-backed gadgets (request/mod.rs:150
    # inject order: challenge, response); bits derive lazily at first use
    challenge = CScalar.new(builder, PRIVATE, chal_int)
    response = CScalar.new(builder, PRIVATE, resp_int)
    # sk_tag and tvk ride in every Request injection (request/mod.rs:224)
    sk_tag_g = CField.new(builder, PRIVATE, request.sk_tag)
    tvk = CField.new(builder, PRIVATE, request.tvk)

    # --- is_root / parent as Mode::Public; caller ternary ---
    is_root_b = CBool.new(builder, PUBLIC, 1 if is_root else 0)
    parent_pt = parent if parent is not None else N.program_address(request.program_id)
    parent_g = CGroup.new(builder, PUBLIC, parent_pt)
    caller = signer.ternary(is_root_b, parent_g)
    is_root_f = CField.constant(builder, 1).ternary(
        is_root_b, CField.constant(builder, 0))

    # --- input ID checks + message (verify.rs:110 check_input_ids):
    # the per-input booleans fold into `input_checks` as they are
    # produced (map+fold with a constant-true start, verify.rs:297) ---
    input_hashes = []
    input_checks = CBool.constant(builder, True)
    class _Checks:
        def append(self, c):
            nonlocal input_checks
            input_checks = input_checks & c
    checks = _Checks()
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
            h_r = (var_scalar_multiply_gadget(builder, gamma_g, challenge)
                   + var_scalar_multiply_gadget(builder, h_pt, response))
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
    # to_tpk (request/to_tpk.rs:28): (challenge * pk_sig) + (response * G)
    pk_chal = pk_sig.mul_scalar(challenge)
    g_resp = g_scalar_multiply_gadget(builder, response)
    tpk_check = pk_chal + g_resp
    # tpk_checks combine exactly as verify.rs:75-80 (computed.is_equal(
    # injected) for tcm/scm; injected tpk vs computed to_tpk)
    tpk_checks = (tpk.is_equal(tpk_check)
                  & tcm_check.is_equal(tcm)
                  & scm_check.is_equal(scm))

    # --- signature checks (verify.rs:83-104) ---
    msg = [tpk.x, pk_sig.x, pr_sig.x, signer.x, tvk, tcm, fid,
           is_root_f] + input_hashes
    cand_challenge = hash_to_scalar_gadget(builder, 8, msg)
    # candidate address: sk_prf = HashToScalar_psd4([pk_sig.x, pr_sig.x]);
    # address = pk_sig + pr_sig + G*sk_prf (compute_key/{from,to_address}.rs)
    sk_prf = hash_to_scalar_gadget(builder, 4, [pk_sig.x, pr_sig.x])
    pk_prf = g_scalar_multiply_gadget(builder, sk_prf)
    cand_addr = pk_sig + pr_sig + pk_prf
    signature_checks = (challenge.is_equal(cand_challenge)
                        & signer.is_equal(cand_addr))

    # signature_checks & input_checks & tpk_checks (verify.rs:105)
    ok = signature_checks & input_checks & tpk_checks
    builder.assert_eq(ok.lc, LinearCombination(1))

    ctx = RequestCtx(tcm=tcm, tvk=tvk, signer=signer, caller=caller,
                     is_root=is_root_b)
    if return_tvk:
        return tcm, tvk
    return ctx
