"""Reader/Writer primitives for snarkVM's ToBytes/FromBytes wire layer.

Mirrors utilities/src/bytes.rs semantics: all integers little-endian,
bool as one byte, bitcoin-style variable-length integers
(console/network/environment/src/helpers/variable_length.rs:24-53),
console Field = 32-byte LE canonical integer, console Group/Address =
32-byte LE x-coordinate of the twisted-Edwards point.
"""
from __future__ import annotations

import struct


class Reader:
    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes, off: int = 0):
        self.buf = buf
        self.off = off

    def remaining(self) -> int:
        return len(self.buf) - self.off

    def read(self, n: int) -> bytes:
        if self.off + n > len(self.buf):
            raise EOFError(f"read {n} at {self.off} past end {len(self.buf)}")
        v = self.buf[self.off:self.off + n]
        self.off += n
        return v

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.read(8))[0]

    def u128(self) -> int:
        return int.from_bytes(self.read(16), "little")

    def i64(self) -> int:
        return struct.unpack("<q", self.read(8))[0]

    def boolean(self) -> bool:
        v = self.u8()
        if v > 1:
            raise ValueError(f"invalid bool byte {v}")
        return v == 1

    def varint(self) -> int:
        flag = self.u8()
        if flag <= 252:
            return flag
        if flag == 0xFD:
            return self.u16()
        if flag == 0xFE:
            return self.u32()
        return self.u64()

    def field(self) -> int:
        """Console Field element: 32-byte LE canonical integer."""
        return int.from_bytes(self.read(32), "little")

    def scalar(self) -> int:
        return int.from_bytes(self.read(32), "little")

    def group(self) -> int:
        """Console Group/Address: 32-byte LE Edwards x-coordinate."""
        return int.from_bytes(self.read(32), "little")

    def fq(self) -> int:
        """BLS12-377 base field element: 48-byte LE."""
        return int.from_bytes(self.read(48), "little")

    def ident(self) -> str:
        """Identifier: u8 length + UTF-8 bytes."""
        n = self.u8()
        return self.read(n).decode("utf-8")

    def version(self, expected: int, what: str) -> None:
        v = self.u8()
        if v != expected:
            raise ValueError(f"invalid {what} version {v} (expected {expected})")


class Writer:
    __slots__ = ("parts",)

    def __init__(self):
        self.parts: list[bytes] = []

    def getvalue(self) -> bytes:
        return b"".join(self.parts)

    def write(self, b: bytes) -> None:
        self.parts.append(bytes(b))

    def u8(self, v: int) -> None:
        self.parts.append(bytes([v & 0xFF]))

    def u16(self, v: int) -> None:
        self.parts.append(struct.pack("<H", v))

    def u32(self, v: int) -> None:
        self.parts.append(struct.pack("<I", v))

    def u64(self, v: int) -> None:
        self.parts.append(struct.pack("<Q", v))

    def u128(self, v: int) -> None:
        self.parts.append(int(v).to_bytes(16, "little"))

    def i64(self, v: int) -> None:
        self.parts.append(struct.pack("<q", v))

    def boolean(self, v: bool) -> None:
        self.u8(1 if v else 0)

    def varint(self, v: int) -> None:
        if v <= 252:
            self.u8(v)
        elif v <= 0xFFFF:
            self.u8(0xFD)
            self.u16(v)
        elif v <= 0xFFFFFFFF:
            self.u8(0xFE)
            self.u32(v)
        else:
            self.u8(0xFF)
            self.u64(v)

    def field(self, v: int) -> None:
        self.parts.append(int(v).to_bytes(32, "little"))

    scalar = field
    group = field

    def fq(self, v: int) -> None:
        self.parts.append(int(v).to_bytes(48, "little"))

    def ident(self, s: str) -> None:
        b = s.encode("utf-8")
        self.u8(len(b))
        self.write(b)
