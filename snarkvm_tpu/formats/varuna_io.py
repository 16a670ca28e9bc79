"""Varuna SNARK object wire formats (CanonicalSerialize, compressed).

Mirrors:
  Proof                 algorithms/src/snark/varuna/data_structures/proof.rs:304-380
  CircuitVerifyingKey   .../circuit_verifying_key.rs:36 (derived serialize)
  Certificate           .../certificate.rs:28 (pc_proof only)
  synthesizer wrappers  synthesizer/snark/src/{proof,verifying_key,certificate}/bytes.rs
                        (a 1-byte version prefix around the inner object)

All SNARK objects use compressed points (ToBytes = serialize_compressed).
Vec<T> serializes as u64 length + elements; *_without_len variants carry
no length (count recovered from batch sizes). Option<T> = bool byte + value.
Fr = 32-byte LE canonical.
"""
from __future__ import annotations

from .io import Reader, Writer
from . import canonical as C
from ..snark import varuna


# ---------------------------------------------------------------------------
# Proof
# ---------------------------------------------------------------------------

def read_proof(r: Reader) -> varuna.Proof:
    """Varuna Proof (no version byte — raw CanonicalDeserialize)."""
    n_circuits = r.u64()
    batch_sizes = [r.u64() for _ in range(n_circuits)]
    total = sum(batch_sizes)

    witness_commitments = [C.read_g1_compressed(r.read(48)) for _ in range(total)]
    mask_poly = C.read_g1_compressed(r.read(48)) if r.boolean() else None
    h_0 = C.read_g1_compressed(r.read(48))
    g_1 = C.read_g1_compressed(r.read(48))
    h_1 = C.read_g1_compressed(r.read(48))
    g_a = [C.read_g1_compressed(r.read(48)) for _ in range(n_circuits)]
    g_b = [C.read_g1_compressed(r.read(48)) for _ in range(n_circuits)]
    g_c = [C.read_g1_compressed(r.read(48)) for _ in range(n_circuits)]
    h_2 = C.read_g1_compressed(r.read(48))

    g_1_eval = r.field()
    g_a_evals = [r.field() for _ in range(n_circuits)]
    g_b_evals = [r.field() for _ in range(n_circuits)]
    g_c_evals = [r.field() for _ in range(n_circuits)]

    third_sums = []
    for bs in batch_sizes:
        third_sums.append([varuna.MatrixSums(r.field(), r.field(), r.field())
                           for _ in range(bs)])
    fourth_sums = [varuna.MatrixSums(r.field(), r.field(), r.field())
                   for _ in range(n_circuits)]

    pc_proof = read_batch_lc_proof(r)

    return varuna.Proof(
        batch_sizes=batch_sizes,
        witness_commitments=witness_commitments,
        mask_poly=mask_poly, h_0=h_0, g_1=g_1, h_1=h_1,
        g_a_commitments=g_a, g_b_commitments=g_b, g_c_commitments=g_c, h_2=h_2,
        g_1_eval=g_1_eval, g_a_evals=g_a_evals, g_b_evals=g_b_evals,
        g_c_evals=g_c_evals,
        third_sums=third_sums, fourth_sums=fourth_sums, pc_proof=pc_proof,
    )


def write_proof(w: Writer, proof: varuna.Proof) -> None:
    w.u64(len(proof.batch_sizes))
    for bs in proof.batch_sizes:
        w.u64(bs)
    for c in proof.witness_commitments:
        w.write(C.write_g1_compressed(c))
    w.boolean(proof.mask_poly is not None)
    if proof.mask_poly is not None:
        w.write(C.write_g1_compressed(proof.mask_poly))
    for c in (proof.h_0, proof.g_1, proof.h_1):
        w.write(C.write_g1_compressed(c))
    for group in (proof.g_a_commitments, proof.g_b_commitments, proof.g_c_commitments):
        for c in group:
            w.write(C.write_g1_compressed(c))
    w.write(C.write_g1_compressed(proof.h_2))

    w.field(proof.g_1_eval)
    for group in (proof.g_a_evals, proof.g_b_evals, proof.g_c_evals):
        for e in group:
            w.field(e)

    for sums in proof.third_sums:
        for s in sums:
            w.field(s.sum_a)
            w.field(s.sum_b)
            w.field(s.sum_c)
    for s in proof.fourth_sums:
        w.field(s.sum_a)
        w.field(s.sum_b)
        w.field(s.sum_c)

    write_batch_lc_proof(w, proof.pc_proof)


def read_batch_lc_proof(r: Reader):
    """BatchLCProof { proof: BatchProof(Vec<KZGProof>) } — sonic data_structures.rs:661."""
    n = r.u64()
    out = []
    for _ in range(n):
        wpt = C.read_g1_compressed(r.read(48))
        random_v = r.field() if r.boolean() else None
        out.append((wpt, random_v))
    return out


def write_batch_lc_proof(w: Writer, pc_proof) -> None:
    w.u64(len(pc_proof))
    for wpt, random_v in pc_proof:
        w.write(C.write_g1_compressed(wpt))
        w.boolean(random_v is not None)
        if random_v is not None:
            w.field(random_v)


def read_wrapped_proof(data: bytes) -> varuna.Proof:
    """synthesizer/snark Proof: 1-byte version + Varuna proof."""
    r = Reader(data)
    r.version(1, "proof")
    return read_proof(r)


def write_wrapped_proof(proof: varuna.Proof) -> bytes:
    w = Writer()
    w.u8(1)
    write_proof(w, proof)
    return w.getvalue()


# ---------------------------------------------------------------------------
# CircuitVerifyingKey / synthesizer VerifyingKey
# ---------------------------------------------------------------------------

def read_circuit_vk(r: Reader) -> varuna.CircuitVerifyingKey:
    info = varuna.CircuitInfo(
        num_public_inputs=r.u64(),
        num_variables=r.u64(),
        num_constraints=r.u64(),
        num_non_zero_a=r.u64(),
        num_non_zero_b=r.u64(),
        num_non_zero_c=r.u64(),
    )
    n = r.u64()
    comms = [C.read_g1_compressed(r.read(48)) for _ in range(n)]
    cid = r.read(32).hex()
    return varuna.CircuitVerifyingKey(circuit_info=info, circuit_commitments=comms, id=cid)


def write_circuit_vk(w: Writer, vk: varuna.CircuitVerifyingKey) -> None:
    info = vk.circuit_info
    for v in (info.num_public_inputs, info.num_variables, info.num_constraints,
              info.num_non_zero_a, info.num_non_zero_b, info.num_non_zero_c):
        w.u64(v)
    w.u64(len(vk.circuit_commitments))
    for c in vk.circuit_commitments:
        w.write(C.write_g1_compressed(c))
    w.write(bytes.fromhex(vk.id))


def read_verifying_key(data: bytes):
    """synthesizer VerifyingKey: version + CircuitVerifyingKey + num_variables u64.

    Returns (CircuitVerifyingKey, num_variables).
    """
    r = Reader(data)
    r.version(1, "verifying key")
    vk = read_circuit_vk(r)
    # The shipped inclusion.verifier predates the num_variables field; treat
    # the trailing u64 as optional on read.
    num_variables = r.u64() if r.remaining() >= 8 else None
    if r.remaining():
        raise ValueError(f"{r.remaining()} trailing bytes after verifying key")
    return vk, num_variables


def write_verifying_key(vk: varuna.CircuitVerifyingKey, num_variables: int | None) -> bytes:
    w = Writer()
    w.u8(1)
    write_circuit_vk(w, vk)
    if num_variables is not None:
        w.u64(num_variables)
    return w.getvalue()


# ---------------------------------------------------------------------------
# Certificate
# ---------------------------------------------------------------------------

def read_certificate(r: Reader):
    """synthesizer Certificate: version + varuna Certificate {pc_proof}."""
    r.version(1, "certificate")
    return read_batch_lc_proof(r)


def write_certificate(w: Writer, pc_proof) -> None:
    w.u8(1)
    write_batch_lc_proof(w, pc_proof)
