"""In-circuit Record: bit encoding, commitment, serial number, tag, and
encryption — the gadget side of console/record.py, mirroring
circuit/program/src/data/record/{to_bits_le,to_commitment,
serial_number,tag,encrypt}.rs.

These feed the two protocol-circuit arms the reference requires:
  * Request::verify record inputs (request/verify.rs:214-266):
    commitment recomputation, serial number from gamma, tag, owner check;
  * Response::from_outputs record outputs (response/from_outputs.rs):
    nonce = G^randomizer, in-circuit encryption, commitment + checksum.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from ..console.types import (Identifier, Literal, Plaintext, int_to_bits_le,
                             bytes_to_bits_le, INT_WIDTHS)
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField, CBool, CGroup, CAddress, CInteger, CScalar
from . import poseidon_gadget
from .bhp_gadget import bhp_hash_gadget, bhp_hash_point_gadget

R = P.R
FIELD_BITS = 253


def const_bits(builder, value: int, width: int):
    return [CBool.constant(builder, (value >> i) & 1 == 1)
            for i in range(width)]


def literal_gadget_bits(builder, gadget, type_name: str):
    """Little-endian bit gadgets of a typed literal gadget — matches the
    console Literal.to_bits_le layout (console/types.py:77)."""
    if type_name in INT_WIDTHS:
        return list(gadget.bits)
    if type_name == "field":
        return gadget.to_bits_le(FIELD_BITS, canonical=True)
    if type_name == "boolean":
        return [gadget]
    if type_name == "scalar":
        return list(gadget.bits)
    if type_name in ("address", "group"):
        g = gadget.group if isinstance(gadget, CAddress) else gadget
        return g.x.to_bits_le(FIELD_BITS, canonical=True)
    if type_name == "string":
        return gadget.to_bits_le()
    raise NotImplementedError(f"record entry bits for {type_name}")


def plaintext_literal_bits(builder, gadget, lit: Literal):
    """Plaintext::Literal bit layout: [0,0] + variant(8) + size(16) + bits
    (console/types.py:167)."""
    bits = [CBool.constant(builder, False), CBool.constant(builder, False)]
    bits += const_bits(builder, lit.variant(), 8)
    bits += const_bits(builder, lit.size_in_bits(), 16)
    bits += literal_gadget_bits(builder, gadget, lit.type_name)
    return bits


class RecordGadget:
    """Circuit record (plaintext form): owner address gadget + literal
    entry gadgets + nonce group gadget, with the console record alongside
    for structural constants (identifiers, visibilities, lengths)."""

    def __init__(self, builder: CircuitBuilder, owner: CAddress,
                 data: list, nonce: CGroup, record):
        """data: [(Identifier, visibility, Literal, gadget)] in record
        order; record: the console Record (plaintext)."""
        self.b = builder
        self.owner = owner
        self.data = data
        self.nonce = nonce
        self.record = record

    @classmethod
    def inject(cls, builder: CircuitBuilder, record, mode=PRIVATE) -> "RecordGadget":
        """Inject a console plaintext record: owner address + each entry's
        literal + the nonce (record/mod.rs Inject: all Mode::Private)."""
        owner = CAddress.new(builder, mode, record.owner)
        data = []
        for ident, entry in record.data:
            pt = entry.value
            assert isinstance(pt, Plaintext) and pt.kind == "literal", \
                "record entry gadgets support literal entries"
            lit = pt.value
            t = lit.type_name
            if t == "field":
                g = CField.new(builder, mode, lit.value)
            elif t == "boolean":
                g = CBool.new(builder, mode, lit.value)
            elif t in INT_WIDTHS:
                g = CInteger.new(builder, mode, lit.value, INT_WIDTHS[t], t[0] == "i")
            elif t == "scalar":
                g = CScalar.new(builder, mode, lit.value)
            elif t in ("address", "group"):
                g = (CAddress if t == "address" else CGroup).new(builder, mode, lit.value)
            else:
                raise NotImplementedError(f"record entry type {t}")
            data.append((ident, entry.visibility, lit, g))
        nonce = CGroup.new(builder, mode, record.nonce)
        return cls(builder, owner, data, nonce, record)

    # -- bit encoding (record/to_bits.rs; console record.py:54) --
    def to_bits_le(self):
        b = self.b
        rec = self.record
        bits = [CBool.constant(b, rec.owner_visibility == "private")]
        bits += self.owner.group.x.to_bits_le(FIELD_BITS, canonical=True)
        data_bits = []
        TAG = {"constant": (False, False), "public": (False, True),
               "private": (True, False)}
        for ident, vis, lit, g in self.data:
            data_bits += [CBool.constant(b, v) for v in ident.to_bits_le()]
            data_bits += [CBool.constant(b, t) for t in TAG[vis]]
            data_bits += plaintext_literal_bits(b, g, lit)
        bits += const_bits(b, len(data_bits), 32)
        bits += data_bits
        bits += self.nonce.x.to_bits_le(FIELD_BITS, canonical=True)
        return bits

    def to_fields(self):
        """record/to_fields.rs in-circuit: bit stream + trailing marker
        packed into 252-bit CField chunks (the external-record id
        preimage, request/verify.rs ExternalRecord arm)."""
        from .builder import LinearCombination
        from ..params import bls12_377 as P
        bits = self.to_bits_le() + [CBool.constant(self.b, True)]
        fields = []
        for i in range(0, len(bits), 252):
            acc = LinearCombination(0)
            coeff = 1
            for bt in bits[i : i + 252]:
                acc = acc.add(bt.lc, coeff)
                coeff = coeff * 2 % P.R
            fields.append(CField(self.b, acc))
        return fields

    def to_commitment(self, program_id: str, record_name: str) -> CField:
        """BHP1024(program_id bits || record name bits || record bits)
        (record/to_commitment.rs). ProgramID bits carry NO separator dot
        (id/to_bits.rs:32: name ident bits ++ network ident bits)."""
        b = self.b
        pname, pnet = program_id.rsplit(".", 1)
        pid = [CBool.constant(b, v)
               for v in bytes_to_bits_le(pname.encode())
               + bytes_to_bits_le(pnet.encode())]
        name = [CBool.constant(b, v) for v in bytes_to_bits_le(record_name.encode())]
        return bhp_hash_gadget(b, 1024, "AleoBHP1024", pid + name + self.to_bits_le())


def serial_number_from_gamma_gadget(builder, gamma: CGroup,
                                    commitment: CField) -> CField:
    """record/serial_number.rs: clear gamma's cofactor, derive the
    commit randomizer via HashToScalar_psd2, BHP512-commit over
    (SN domain || commitment) bits."""
    from .request_gadget import hash_to_scalar_bits_gadget
    from .inclusion_gadget import bhp_commit_gadget
    # mul_by_cofactor: two doublings (group/helpers/mul_by_cofactor.rs)
    cleared = gamma.double().double()
    sn_nonce_bits = hash_to_scalar_bits_gadget(
        builder, 2, [CField.constant(builder, N.SERIAL_NUMBER_DOMAIN),
                     cleared.x])
    bits = const_bits(builder, N.SERIAL_NUMBER_DOMAIN, FIELD_BITS)
    bits += commitment.to_bits_le(FIELD_BITS, canonical=True)
    return bhp_commit_gadget(builder, 512, "AleoBHP512", bits, sn_nonce_bits)


def record_tag_gadget(builder, sk_tag: CField, commitment: CField) -> CField:
    """record/tag.rs: Poseidon2([sk_tag, commitment])."""
    return poseidon_gadget.hash_psd(builder, 2, [sk_tag, commitment])[0]


def encrypt_record_gadget(builder, record: RecordGadget, randomizer):
    """record/encrypt.rs in-circuit: assert nonce == G^randomizer
    (encrypt.rs:22, x-coordinate binding), rvk = (owner · randomizer).x,
    randomizer stream via HashMany_psd8, private fields masked — returns
    the CIPHERTEXT record bit gadgets (for the output checksum) without
    materializing a ciphertext record object. `randomizer` is a CScalar
    (or a legacy bit list)."""
    from .request_gadget import (var_scalar_multiply_gadget,
                                 g_scalar_multiply_gadget)
    from .response_gadget import plaintext_fields_gadget

    b = builder
    rec = record.record
    # Ensure the randomizer corresponds to the record nonce (encrypt.rs:22):
    # Group -> LinearCombination is the x-coordinate (group/src/lib.rs:231)
    nonce_check = g_scalar_multiply_gadget(b, randomizer)
    b.assert_eq(record.nonce.x.lc, nonce_check.x.lc)
    rvk = var_scalar_multiply_gadget(b, record.owner.group, randomizer).x
    n_rand = rec.num_randomizers()
    randomizers = poseidon_gadget.hash_psd(
        b, 8, [CField.constant(b, N.ENCRYPTION_DOMAIN), rvk],
        num_outputs=max(1, n_rand))[:n_rand]
    index = 0
    # ciphertext record layout (record/to_bits.rs:54): owner flag+field,
    # u32 data-bit length, per entry (ident bits + 2-bit tag +
    # ciphertext field bits), nonce
    bits = [CBool.constant(b, rec.owner_visibility == "private")]
    if rec.owner_visibility == "private":
        enc_owner = record.owner.group.x + randomizers[index]
        index += 1
        bits += enc_owner.to_bits_le(FIELD_BITS, canonical=True)
    else:
        bits += record.owner.group.x.to_bits_le(FIELD_BITS, canonical=True)
    TAG = {"constant": (False, False), "public": (False, True),
           "private": (True, False)}
    data_bits = []
    for ident, vis, lit, g in record.data:
        data_bits += [CBool.constant(b, v) for v in ident.to_bits_le()]
        data_bits += [CBool.constant(b, t) for t in TAG[vis]]
        if vis == "private":
            fields = plaintext_fields_gadget(b, g, lit.type_name)
            enc = [f + randomizers[index + i] for i, f in enumerate(fields)]
            index += len(fields)
            for f in enc:
                data_bits += f.to_bits_le(FIELD_BITS, canonical=True)
        else:
            data_bits += plaintext_literal_bits(b, g, lit)
    bits += const_bits(b, len(data_bits), 32)
    bits += data_bits
    bits += record.nonce.x.to_bits_le(FIELD_BITS, canonical=True)
    return bits
