"""Byte-parity tests against REAL Aleo mainnet artifacts checked into the
reference's parameters/src/mainnet/resources/ (genesis block, credits.aleo
verifying keys, SRS shards). These are the strongest serialization goldens
available without network access: every byte was produced by the reference
implementation on mainnet.
"""
import os

import pytest

RES = "/root/reference/parameters/src/mainnet/resources"

pytestmark = pytest.mark.skipif(not os.path.isdir(RES), reason="reference artifacts not present")


def _genesis_bytes():
    with open(f"{RES}/block.genesis", "rb") as f:
        return f.read()


def test_genesis_block_roundtrip_byte_exact():
    from snarkvm_tpu.formats import block_io
    data = _genesis_bytes()
    blk = block_io.read_block(data)
    assert block_io.write_block(blk) == data
    assert len(blk.transactions) == 4
    assert all(ct.variant == 1 for ct in blk.transactions)  # AcceptedExecute
    assert blk.header.metadata.network == 0                  # MainnetV0
    assert blk.header.metadata.height == 0
    assert blk.previous_hash == 0


def test_genesis_proofs_parse():
    from snarkvm_tpu.formats import block_io
    blk = block_io.read_block(_genesis_bytes())
    for ct in blk.transactions:
        ex = ct.transaction.execution
        assert ex.proof is not None and ex.proof.batch_sizes == [1]
        assert ex.proof.is_hiding()
        assert ct.transaction.fee.proof is not None
        t = ex.transitions[0]
        assert t.program_id == "credits.aleo"
        assert t.function_name == "transfer_public_to_private"


CREDITS_VERIFIERS = [
    "bond_public", "bond_validator", "claim_unbond_public", "fee_private",
    "fee_public", "join", "set_validator_state", "split", "transfer_private",
    "transfer_private_to_public", "transfer_public", "transfer_public_as_signer",
    "transfer_public_to_private", "unbond_public", "inclusion",
]


def test_verifier_keys_roundtrip_and_on_curve():
    from snarkvm_tpu.formats import varuna_io
    from snarkvm_tpu.params import bls12_377 as P
    found = 0
    for name in CREDITS_VERIFIERS:
        path = f"{RES}/{name}.verifier"
        if not os.path.exists(path):
            continue
        found += 1
        with open(path, "rb") as f:
            data = f.read()
        vk, num_vars = varuna_io.read_verifying_key(data)
        assert varuna_io.write_verifying_key(vk, num_vars) == data
        assert len(vk.circuit_commitments) == 12
        for c in vk.circuit_commitments:
            if c is None:
                continue
            x, y = c
            assert (y * y - (x * x * x + 1)) % P.Q == 0
    assert found >= 10


def test_real_srs_shards_parse():
    """powers-of-beta-15.usrs: u32 length prefix + 2^15 uncompressed G1."""
    from snarkvm_tpu.formats import canonical
    from snarkvm_tpu.params import bls12_377 as P
    with open(f"{RES}/powers-of-beta-15.usrs", "rb") as f:
        data = f.read()
    n = int.from_bytes(data[:4], "little")
    # file = 4-byte or 8-byte count prefix + n * 96
    if 4 + n * 96 == len(data):
        off = 4
    else:
        n = int.from_bytes(data[:8], "little")
        assert 8 + n * 96 == len(data)
        off = 8
    assert n == 1 << 15
    g = canonical.read_g1_uncompressed(data[off:off + 96])
    assert g == (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)
    # spot-check a few on-curve
    for i in (1, 2, 1000, n - 1):
        x, y = canonical.read_g1_uncompressed(data[off + 96 * i: off + 96 * (i + 1)])
        assert (y * y - (x * x * x + 1)) % P.Q == 0


def test_real_beta_h_and_neg_powers_parse():
    from snarkvm_tpu.formats import canonical
    with open(f"{RES}/beta-h.usrs", "rb") as f:
        bh = f.read()
    assert len(bh) == 192
    pt = canonical.read_g2_uncompressed(bh)
    assert pt is not None
    with open(f"{RES}/neg-powers-of-beta.usrs", "rb") as f:
        data = f.read()
    n = int.from_bytes(data[:8], "little")
    assert 8 + n * 200 == len(data)


def test_g1_compressed_roundtrip():
    from snarkvm_tpu.formats import canonical
    from snarkvm_tpu.params import bls12_377 as P
    from snarkvm_tpu.curves import sw_fast as g1f
    base = g1f.from_affine((P.G1_GENERATOR_X, P.G1_GENERATOR_Y))
    cur = base
    for _ in range(10):
        pt = g1f.to_affine(cur)
        enc = canonical.write_g1_compressed(pt)
        assert len(enc) == 48
        assert canonical.read_g1_compressed(enc) == pt
        cur = g1f.jac_add(cur, base)
    inf = canonical.write_g1_compressed(None)
    assert canonical.read_g1_compressed(inf) is None


def test_instruction_text_roundtrip():
    from snarkvm_tpu.formats.io import Reader, Writer
    from snarkvm_tpu.formats import program_io
    samples = [
        "add r0 r1 into r2;",
        "sub.w r3 5u64 into r4;",
        "assert.eq r0 true;",
        "ternary r0 r1 r2 into r3;",
        "hash.psd2 r0 into r1 as field;",
        "hash.bhp256 r0 into r1 as group;",
        "commit.bhp512 r0 r1 into r2 as field;",
        "cast r0 r1 into r2 as credits;",
        "cast r0 into r1 as group.x;",
        "call transfer r0 r1 into r2 r3;",
        "call credits.aleo/transfer_private r0 into r1;",
        "async transfer_public r0 r1 into r2;",
        "is.eq r0.owner self.caller into r1;",
        "hash_many.psd4 r0 2u16 into r1 as field;",
        "sign.verify r0 r1 r2 into r3;",
        "not r0 into r1;",
    ]
    for text in samples:
        w = Writer()
        program_io.write_instruction(w, text)
        back = program_io.read_instruction(Reader(w.getvalue()))
        assert back.text == text, (back.text, text)


def test_command_text_roundtrip():
    from snarkvm_tpu.formats.io import Reader, Writer
    from snarkvm_tpu.formats import program_io
    samples = [
        "get account[r0] into r1;",
        "get.or_use account[r0] 0u64 into r1;",
        "set r2 into account[r0];",
        "contains account[r0] into r1;",
        "remove account[r0];",
        "rand.chacha r0 into r1 as u64;",
        "branch.eq r0 true to end;",
        "position end;",
        "await r0;",
        "add r0 r1 into r2;",
        "get credits.aleo/account[r0] into r1;",
    ]
    for text in samples:
        w = Writer()
        program_io.write_command(w, text)
        back = program_io.read_command(Reader(w.getvalue()))
        assert back.text == text, (back.text, text)


def test_genesis_semantic_parity_all_roots_and_ids():
    """Recompute every transition ID, transaction ID, Merkle root (txs/
    finalize/ratifications/header), committee ID, block hash, and verify the
    real beacon Schnorr signature — all against mainnet genesis bytes."""
    from snarkvm_tpu.formats import block_io, parity
    blk = block_io.read_block(_genesis_bytes())
    res = parity.check_block(blk)
    failures = [k for k, v in res.items() if not v]
    assert not failures, failures
    assert len(res) >= 18


def test_real_mainnet_varuna_proofs_verify():
    """THE transcript-parity acceptance test: all 8 ZK Varuna proofs inside
    the mainnet genesis block (4 transfer_public_to_private executions + 4
    fee_public fees) verify with OUR verifier against the shipped verifying
    keys and the real universal SRS. A tampered input must be rejected."""
    from snarkvm_tpu.formats import block_io, parity
    from snarkvm_tpu.params import mainnet_artifacts as MA
    from snarkvm_tpu.snark import varuna
    from snarkvm_tpu.console import network as N

    blk = block_io.read_block(_genesis_bytes())
    srs = MA.verifier_srs()
    vk_fee, _ = MA.credits_verifying_key("fee_public")
    vk_t2p, _ = MA.credits_verifying_key("transfer_public_to_private")

    for ct in blk.transactions:
        tx = ct.transaction
        assert parity.verify_single_transition_proof(
            srs, vk_t2p, tx.execution.transitions[0], tx.execution.proof)
        assert parity.verify_single_transition_proof(
            srs, vk_fee, tx.fee.transition, tx.fee.proof)

    # negative control
    fee = blk.transactions[0].transaction.fee
    bad = parity.transition_verifier_inputs(fee.transition)
    bad[3] = (bad[3] + 1) % N.R
    assert not varuna.verify_batch(srs, [(vk_fee, [bad])], fee.proof,
                                   varuna.VarunaHidingMode)


def test_prove_under_real_mainnet_srs():
    """Our prover commits/opens against the REAL (trapdoor-free) mainnet SRS
    shards — low powers, shifted windows, sparse gamma map — and our
    protocol-exact verifier accepts, in both ZK and non-hiding modes."""
    import random
    from snarkvm_tpu.params import mainnet_artifacts as MA
    from snarkvm_tpu.curves import pairing
    from snarkvm_tpu.fields.scalar import Fq
    from snarkvm_tpu.console import account
    from snarkvm_tpu.console.request import Request
    from snarkvm_tpu.console.types import Plaintext
    from snarkvm_tpu.synthesizer.program import parse_program
    from snarkvm_tpu.synthesizer.process import Stack
    from snarkvm_tpu.synthesizer import execute as E
    from snarkvm_tpu.snark import varuna

    srs = MA.MainnetSRS()
    g0 = srs.powers_of_beta_g[0:1][0]
    g1p = srs.powers_of_beta_g[1:2][0]
    assert (pairing.pairing((Fq(g1p[0]), Fq(g1p[1])), srs.h)
            == pairing.pairing((Fq(g0[0]), Fq(g0[1])), srs.beta_h))

    rng = random.Random(8080)
    program = """
program math.aleo;

function combine:
    input r0 as field.public;
    input r1 as field.private;
    mul r0 r1 into r2;
    add r2 r1 into r3;
    output r3 as field.private;
"""
    stack = Stack(parse_program(program))
    sk = account.PrivateKey.new(rng)
    for mode in (varuna.VarunaHidingMode, varuna.VarunaNonHidingMode):
        trace = E.Trace()
        req = Request.sign(sk, "math.aleo", "combine",
                           [Plaintext.literal("field", 3), Plaintext.literal("field", 5)],
                           [("public", "field"), ("private", "field")], rng)
        trace.insert(E.execute_function(
            stack, req, [("public", "field"), ("private", "field")]))
        proof, vks = trace.prove_execution(srs, rng, mode=mode)
        assert E.verify_execution(srs, proof, vks)
