"""Records: owned data with ECIES-style encryption (console/program/src/data/record/).

Record<Plaintext|Ciphertext> with owner + entries + _nonce:
  * encrypt: record_view_key = (owner_address * randomizer).x,
    randomizers = hash_many_psd8([ENCRYPTION_DOMAIN, rvk], n),
    private entries = fields + randomizers elementwise (encrypt.rs:20);
  * decrypt: rvk = (nonce * view_key).x, subtract randomizers (decrypt.rs:20);
  * commitment = hash_bhp1024(program_id || record_name || record bits)
    (to_commitment.rs:20);
  * serial number via gamma = hash_to_group_psd2([SN_DOMAIN, commitment])
    * sk_sig, sn = commit_bhp512(...) (serial_number.rs:20);
  * tag = hash_psd2([sk_tag, commitment]).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..curves import edwards as ed
from . import network as N
from .types import (
    Plaintext, Identifier, Literal, int_to_bits_le, bytes_to_bits_le, bits_to_int_le,
    FIELD_BITS,
)

R = P.R
S = P.S


@dataclass
class Entry:
    """constant | public | private visibility around a Plaintext (or field
    ciphertext list when encrypted)."""
    visibility: str
    value: object   # Plaintext (plaintext records) | list[int] fields (ciphertext)

    def num_randomizers(self) -> int:
        if self.visibility != "private":
            return 0
        if isinstance(self.value, Plaintext):
            return len(self.value.to_fields())
        return len(self.value)


@dataclass
class Record:
    owner: object                 # (x, y) address point (plaintext) or field int (encrypted private owner)
    owner_visibility: str         # "public" | "private"
    data: list                    # [(Identifier, Entry)]
    nonce: tuple                  # group point
    is_ciphertext: bool = False

    # -- bit encoding (record/to_bits.rs:20): owner (flag + field) ||
    #    u32 data-bit length || per entry (identifier bits + 2-bit
    #    visibility tag + plaintext/ciphertext bits) || nonce --
    def to_bits_le(self):
        bits = []
        bits.append(self.owner_visibility == "private")
        if self.is_ciphertext and self.owner_visibility == "private":
            bits += int_to_bits_le(self.owner % R, FIELD_BITS)
        else:
            bits += int_to_bits_le(self.owner[0], FIELD_BITS)
        TAG = {"constant": [False, False], "public": [False, True],
               "private": [True, False]}
        data_bits = []
        for ident, entry in self.data:
            data_bits += ident.to_bits_le()
            data_bits += TAG[entry.visibility]
            if isinstance(entry.value, Plaintext):
                data_bits += entry.value.to_bits_le()
            else:
                for f in entry.value:
                    data_bits += int_to_bits_le(f, FIELD_BITS)
        bits += int_to_bits_le(len(data_bits), 32)
        bits += data_bits
        bits += int_to_bits_le(self.nonce[0], FIELD_BITS)
        return bits

    def num_randomizers(self) -> int:
        n = 1 if self.owner_visibility == "private" else 0
        return n + sum(e.num_randomizers() for _, e in self.data)

    def to_fields(self):
        """record/to_fields.rs: bits + trailing `true` marker packed into
        252-bit field chunks — the external-record input/output id
        preimage (request sign external_record arm)."""
        from .types import FIELD_DATA_BITS, bits_to_int_le
        bits = self.to_bits_le() + [True]
        return [bits_to_int_le(bits[i : i + FIELD_DATA_BITS])
                for i in range(0, len(bits), FIELD_DATA_BITS)]

    # -- encryption --
    def encrypt(self, randomizer: int) -> "Record":
        assert not self.is_ciphertext
        assert self.nonce == N.g_scalar_multiply(randomizer), "randomizer/nonce mismatch"
        rvk = ed.mul(self.owner, randomizer % S)[0]
        return self.encrypt_symmetric_unchecked(rvk)

    def encrypt_symmetric_unchecked(self, record_view_key: int) -> "Record":
        randomizers = N.hash_many_psd(8, [N.ENCRYPTION_DOMAIN, record_view_key],
                                      max(1, self.num_randomizers()))[: self.num_randomizers()]
        index = 0
        if self.owner_visibility == "private":
            enc_owner = (self.owner[0] + randomizers[index]) % R
            index += 1
        else:
            enc_owner = self.owner
        enc_data = []
        for ident, entry in self.data:
            if entry.visibility == "private":
                fields = entry.value.to_fields()
                k = len(fields)
                enc = [(f + r) % R for f, r in zip(fields, randomizers[index : index + k])]
                index += k
                enc_data.append((ident, Entry("private", enc)))
            else:
                enc_data.append((ident, entry))
        return Record(enc_owner, self.owner_visibility, enc_data, self.nonce, is_ciphertext=True)

    def decrypt(self, view_key: int) -> "Record":
        assert self.is_ciphertext
        rvk = ed.mul(self.nonce, view_key % S)[0]
        rec = self.decrypt_symmetric_unchecked(rvk)
        return rec

    def decrypt_symmetric_unchecked(self, record_view_key: int) -> "Record":
        randomizers = N.hash_many_psd(8, [N.ENCRYPTION_DOMAIN, record_view_key],
                                      max(1, self.num_randomizers()))[: self.num_randomizers()]
        index = 0
        if self.owner_visibility == "private":
            x = (self.owner - randomizers[index]) % R
            from .types import _group_from_x
            owner = _group_from_x(x)
            index += 1
        else:
            owner = self.owner
        dec_data = []
        for ident, entry in self.data:
            if entry.visibility == "private":
                fields = [(f - r) % R for f, r in
                          zip(entry.value, randomizers[index : index + len(entry.value)])]
                index += len(entry.value)
                pt = plaintext_from_fields(fields)
                dec_data.append((ident, Entry("private", pt)))
            else:
                dec_data.append((ident, entry))
        return Record(owner, self.owner_visibility, dec_data, self.nonce, is_ciphertext=False)

    # -- commitments / serial numbers / tags --
    def to_commitment(self, program_id: str, record_name: str) -> int:
        """BHP1024(program_id bits || record name bits || record bits).
        ProgramID::to_bits_le = name ident bits ++ network ident bits —
        NO separator dot (console/program/src/id/to_bits.rs:32; each
        Identifier contributes exactly its ascii bytes' LE bits)."""
        name, network = program_id.rsplit(".", 1)
        pid_bits = (bytes_to_bits_le(name.encode())
                    + bytes_to_bits_le(network.encode()))
        name_bits = bytes_to_bits_le(record_name.encode())
        return N.hash_bhp(1024, pid_bits + name_bits + self.to_bits_le())


def serial_number(sk_sig: int, commitment: int) -> int:
    h = N.hash_to_group_psd(2, [N.SERIAL_NUMBER_DOMAIN, commitment])
    gamma = ed.mul(h, sk_sig % S)
    return serial_number_from_gamma(gamma, commitment)


def serial_number_from_gamma(gamma, commitment: int) -> int:
    cleared = ed.mul(gamma, ed.COFACTOR)
    sn_nonce = N.hash_to_scalar_psd(2, [N.SERIAL_NUMBER_DOMAIN, cleared[0]])
    bits = int_to_bits_le(N.SERIAL_NUMBER_DOMAIN, FIELD_BITS) + int_to_bits_le(commitment, FIELD_BITS)
    return N.commit_bhp(512, bits, sn_nonce)


def record_tag(sk_tag: int, commitment: int) -> int:
    return N.hash_psd(2, [sk_tag, commitment])


def plaintext_from_fields(fields) -> Plaintext:
    """Inverse of Plaintext.to_fields: unpack 252-bit chunks, strip the
    trailing 1 marker, parse bits (from_fields.rs/from_bits.rs)."""
    bits = []
    for f in fields:
        bits += [(f >> i) & 1 == 1 for i in range(252)]
    while bits and not bits[-1]:
        bits.pop()
    assert bits and bits[-1], "missing end marker"
    bits.pop()
    pt, _ = _plaintext_from_bits(bits, 0)
    return pt


def _plaintext_from_bits(bits, pos):
    v0, v1 = bits[pos], bits[pos + 1]
    pos += 2
    if not v0 and not v1:       # literal
        variant = bits_to_int_le(bits[pos : pos + 8]); pos += 8
        size = bits_to_int_le(bits[pos : pos + 16]); pos += 16
        payload = bits[pos : pos + size]; pos += size
        from .types import VARIANTS
        type_name = {v: k for k, v in VARIANTS.items()}[variant]
        return Plaintext("literal", Literal.from_bits_le(type_name, payload)), pos
    if not v0 and v1:           # struct
        count = bits_to_int_le(bits[pos : pos + 8]); pos += 8
        members = []
        for _ in range(count):
            id_size = bits_to_int_le(bits[pos : pos + 8]); pos += 8
            id_bits = bits[pos : pos + id_size]; pos += id_size
            name = bytes(bits_to_int_le(id_bits[i : i + 8]) for i in range(0, id_size, 8)).decode()
            vsize = bits_to_int_le(bits[pos : pos + 16]); pos += 16
            sub, _ = _plaintext_from_bits(bits[pos : pos + vsize], 0)
            pos += vsize
            members.append((name, sub))
        return Plaintext.struct(members), pos
    # array
    count = bits_to_int_le(bits[pos : pos + 32]); pos += 32
    elems = []
    for _ in range(count):
        esize = bits_to_int_le(bits[pos : pos + 16]); pos += 16
        sub, _ = _plaintext_from_bits(bits[pos : pos + esize], 0)
        pos += esize
        elems.append(sub)
    return Plaintext.array(elems), pos


def record_from_str(s: str) -> Record:
    """Parse the plaintext-record text form
    `{ owner: aleo1...private, name: value.visibility, ...,
       _nonce: 0group.public }`
    (console/program/src/data/record/parse_plaintext.rs). Entry values
    are plaintext literals with a trailing `.constant/.public/.private`
    visibility suffix; `_nonce` is a group literal (always public)."""
    from .types import literal_from_str, Identifier, _group_from_x
    s = s.strip()
    if not (s.startswith("{") and s.endswith("}")):
        raise ValueError("record text must be { ... }")
    body = s[1:-1]
    # split on top-level commas (no nested structs inside record entries
    # in the plaintext form used by the corpus; nested braces handled)
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    owner = None
    owner_vis = "private"
    nonce = None
    data = []
    for part in parts:
        name, _, val = part.partition(":")
        name = name.strip()
        val = val.strip()
        if name == "_nonce":
            lit_s, _, vis = val.rpartition(".")
            lit = literal_from_str(lit_s)
            assert lit.type_name == "group", "nonce must be a group"
            nonce = lit.value
            continue
        lit_s, _, vis = val.rpartition(".")
        if vis not in ("constant", "public", "private"):
            raise ValueError(f"entry {name}: missing visibility suffix")
        lit = literal_from_str(lit_s)
        if name == "owner":
            assert lit.type_name == "address"
            owner = lit.value
            owner_vis = vis
            continue
        data.append((Identifier(name),
                     Entry(vis, Plaintext("literal", lit))))
    if owner is None or nonce is None:
        raise ValueError("record text requires owner and _nonce")
    return Record(owner, owner_vis, data, nonce)
