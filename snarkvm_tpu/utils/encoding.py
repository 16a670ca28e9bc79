"""Address/key string encodings: base58 (keys) and bech32m (addresses/IDs),
plus the sha256 byte-digest utility (algorithms/src/crypto_hash/sha256.rs:18)."""
from __future__ import annotations

import hashlib as _hashlib

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def sha256(data: bytes) -> bytes:
    return _hashlib.sha256(data).digest()


def sha256d(data: bytes) -> bytes:
    """Double sha256 (solution IDs, parameter checksums)."""
    return _hashlib.sha256(_hashlib.sha256(data).digest()).digest()


def base58_encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = _B58[r] + out
    for b in data:
        if b == 0:
            out = _B58[0] + out
        else:
            break
    return out


def base58_decode(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 58 + _B58.index(ch)
    out = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = 0
    for ch in s:
        if ch == _B58[0]:
            pad += 1
        else:
            break
    return b"\x00" * pad + out


_B32 = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_BECH32M_CONST = 0x2BC830A3


def _polymod(values):
    gen = [0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3]
    chk = 1
    for v in values:
        top = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= gen[i] if ((top >> i) & 1) else 0
    return chk


def _hrp_expand(hrp):
    return [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]


def _to_base32(data: bytes):
    acc = bits = 0
    out = []
    for b in data:
        acc = (acc << 8) | b
        bits += 8
        while bits >= 5:
            bits -= 5
            out.append((acc >> bits) & 31)
    if bits:
        out.append((acc << (5 - bits)) & 31)
    return out


def _from_base32(data):
    acc = bits = 0
    out = bytearray()
    for v in data:
        acc = (acc << 5) | v
        bits += 5
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def bech32m_encode(hrp: str, data: bytes) -> str:
    d = _to_base32(data)
    values = _hrp_expand(hrp) + d
    checksum = _polymod(values + [0] * 6) ^ _BECH32M_CONST
    chk = [(checksum >> 5 * (5 - i)) & 31 for i in range(6)]
    return hrp + "1" + "".join(_B32[x] for x in d + chk)


def bech32m_decode(s: str):
    pos = s.rfind("1")
    hrp, rest = s[:pos], s[pos + 1 :]
    data = [_B32.index(c) for c in rest]
    if _polymod(_hrp_expand(hrp) + data) != _BECH32M_CONST:
        raise ValueError("bad bech32m checksum")
    return hrp, _from_base32(data[:-6])


def address_to_string(x: int) -> str:
    """aleo1... bech32m of the 32-byte LE Edwards x-coordinate."""
    return bech32m_encode("aleo", int(x).to_bytes(32, "little"))


def address_from_string(s: str) -> int:
    _, data = bech32m_decode(s)
    return int.from_bytes(data, "little")
