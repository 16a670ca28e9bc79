"""In-circuit record commitment — the R1CS mirror of
Record::to_commitment (console/program/src/data/record/to_commitment.rs):
BHP1024(program_id bits || record_name bits || record bits), where the
record bit serialization (record/to_bits.rs) covers the owner, every data
entry (identifier + visibility + plaintext bits) and the nonce.

Structural headers (lengths, identifiers, visibilities) are compile-time
constants of the record TYPE; the owner, entry values and nonce are
witness gadgets, so the commitment binds exactly the private data."""
from __future__ import annotations

from ..console import network as N
from ..console.types import bytes_to_bits_le
from .builder import CircuitBuilder
from .types import CBool, CField
from .bhp_gadget import bhp_hash_gadget
from .response_gadget import _plaintext_bit_stream

FIELD_BITS = 253
_VIS_IDX = {"constant": 0, "public": 1, "private": 2}


def _const_bits(builder, bits):
    return [CBool.constant(builder, b) for b in bits]


def _u8(v):
    return [(v >> i) & 1 == 1 for i in range(8)]


def _u16(v):
    return [(v >> i) & 1 == 1 for i in range(16)]


def record_bits_gadget(builder: CircuitBuilder, owner_x: CField,
                       entries, nonce_x: CField):
    """record/to_bits.rs for a plaintext record with a private owner.
    entries: [(name: str, visibility: str, type_name: str, gadget)]."""
    bits = [CBool.constant(builder, True)]          # owner visibility bit
    bits += owner_x.to_bits_le(FIELD_BITS)
    bits += _const_bits(builder, _u8(len(entries)))
    for name, visibility, type_name, gadget in entries:
        name_bits = bytes_to_bits_le(name.encode())
        bits += _const_bits(builder, _u8(len(name_bits)))
        bits += _const_bits(builder, name_bits)
        bits += _const_bits(builder, _u8(_VIS_IDX[visibility]))
        stream = _plaintext_bit_stream(gadget, type_name, marker=False)
        bits += _const_bits(builder, _u16(len(stream)))
        for kind, item in stream:
            bits.append(CBool.constant(builder, item) if kind == "c" else item)
    bits += nonce_x.to_bits_le(FIELD_BITS)
    return bits


def record_commitment_gadget(builder: CircuitBuilder, program_id: str,
                             record_name: str, owner_x: CField,
                             entries, nonce_x: CField) -> CField:
    """Record::to_commitment: BHP1024 over program id + record name +
    record bits. Returns the commitment field gadget."""
    preimage = _const_bits(builder, bytes_to_bits_le(program_id.encode()))
    preimage += _const_bits(builder, bytes_to_bits_le(record_name.encode()))
    preimage += record_bits_gadget(builder, owner_x, entries, nonce_x)
    return bhp_hash_gadget(builder, 1024, "AleoBHP1024", preimage)
