"""Circuit Keccak/SHA3 (circuit/algorithms/src/keccak/ mirror).

keccak-f[1600] over CBool lanes: theta/rho/pi are free (XOR = linear LCs
+ rotations are wire permutations), chi costs one AND constraint per bit
(1600 per round, 24 rounds), iota XORs constants. Input padding follows
the console implementation (hashes/keccak.py): 0x06 domain for SHA3,
0x01 for Keccak, final 0x80 bit.

Also the Pedersen hash/commit gadgets (circuit/algorithms/src/pedersen):
bit-conditioned constant-base adds, same ladder pattern as BHP commit.
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from .builder import CircuitBuilder, LinearCombination, PRIVATE
from .types import CField, CBool, CGroup

R = P.R

_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]


def _xor(builder, a: CBool, b: CBool) -> CBool:
    """XOR with a FRESH output witness: (2a)(b) == a + b - out. Keeps every
    lane bit a single-term LC — the naive lc-composing xor makes LCs grow
    multiplicatively across rounds (quadratic trace blowup)."""
    out = CBool.new(builder, PRIVATE, bool(a.value) != bool(b.value))
    two_a = LinearCombination(0).add(a.lc, 2)
    rhs = LinearCombination(0).add(a.lc, 1).add(b.lc, 1).add(out.lc, R - 1)
    builder.enforce(two_a, b.lc, rhs)
    return out


def _xor_many(builder, bits):
    acc = bits[0]
    for b in bits[1:]:
        acc = _xor(builder, acc, b)
    return acc


def _chi_bit(builder, a: CBool, b: CBool, c: CBool) -> CBool:
    """a ^ (~b & c) with one AND + one collapsed XOR."""
    t = (~b) & c
    return _xor(builder, a, t)


def _keccak_f(builder, lanes):
    """lanes: 5x5 grid of 64-bit CBool lists (LSB first). In place rounds."""
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [[_xor_many(builder, [lanes[x][y][z] for y in range(5)])
              for z in range(64)] for x in range(5)]
        d = [[_xor(builder, c[(x - 1) % 5][z], c[(x + 1) % 5][(z - 1) % 64])
              for z in range(64)] for x in range(5)]
        for x in range(5):
            for y in range(5):
                lanes[x][y] = [_xor(builder, lanes[x][y][z], d[x][z])
                               for z in range(64)]
        # rho + pi
        b = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                rot = _ROTATIONS[x][y]
                b[y][(2 * x + 3 * y) % 5] = [
                    lanes[x][y][(z - rot) % 64] for z in range(64)]
        # chi: a ^ (~b & c) — AND + collapsed XOR per bit
        for x in range(5):
            for y in range(5):
                lanes[x][y] = [
                    _chi_bit(builder, b[x][y][z], b[(x + 1) % 5][y][z],
                             b[(x + 2) % 5][y][z])
                    for z in range(64)]
        # iota
        lanes[0][0] = [
            ~lanes[0][0][z] if (rc >> z) & 1 else lanes[0][0][z]
            for z in range(64)]
    return lanes


def keccak_hash_gadget(builder: CircuitBuilder, kind: str, variant: int,
                       input_bits):
    """kind: "keccak" | "sha3"; variant: 256/384/512. input_bits: CBools
    (LE bit order as in console hash_bits). Returns digest CBool list."""
    rate = 1600 - 2 * variant
    # pad to a byte boundary with constant False (console hashes bytes)
    bits = list(input_bits)
    while len(bits) % 8:
        bits.append(CBool.constant(builder, False))
    # multi-rate padding: domain bits ++ zeros ++ final 1
    # LSB-first suffix bits: SHA3 0x06 -> [0,1,1]; Keccak 0x01 -> [1]
    domain = [False, True, True] if kind == "sha3" else [True]
    padded = bits + [CBool.constant(builder, b) for b in domain]
    while (len(padded) + 1) % rate:
        padded.append(CBool.constant(builder, False))
    padded.append(CBool.constant(builder, True))

    lanes = [[[CBool.constant(builder, False) for _ in range(64)]
              for _ in range(5)] for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i, bit in enumerate(block):
            lane = i // 64
            x, y = lane % 5, lane // 5
            z = i % 64
            cur = lanes[x][y][z]
            # first block: state is constant zero -> absorb directly
            if not cur.lc.terms and not bool(cur.value):
                lanes[x][y][z] = bit
            else:
                lanes[x][y][z] = _xor(builder, cur, bit)
        lanes = _keccak_f(builder, lanes)
    out = []
    for i in range(variant):
        lane = i // 64
        x, y = lane % 5, lane // 5
        out.append(lanes[x][y][i % 64])
    return out


# ---------------------------------------------------------------------------
# Pedersen
# ---------------------------------------------------------------------------

def pedersen_hash_gadget(builder: CircuitBuilder, num_bits: int, bits) -> CField:
    """PED64/128 hash: sum of bit-conditioned doubling powers of the
    domain generator (circuit/algorithms/src/pedersen/hash.rs)."""
    ped = N._pedersen(num_bits)
    assert len(bits) <= num_bits, "pedersen input exceeds capacity"
    acc = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    for bit, base_ext in zip(bits, ped.base_window):
        base = CGroup.constant(builder, ed.to_affine(base_ext))
        added = acc + base
        acc = CGroup(builder, added.x.ternary(bit, acc.x),
                     added.y.ternary(bit, acc.y))
    return acc.x


def pedersen_commit_gadget(builder: CircuitBuilder, num_bits: int, bits,
                           randomizer_bits) -> CField:
    ped = N._pedersen(num_bits)
    acc = CGroup.constant(builder, ed.IDENTITY_AFFINE)
    for bit, base_ext in zip(bits, ped.base_window):
        base = CGroup.constant(builder, ed.to_affine(base_ext))
        added = acc + base
        acc = CGroup(builder, added.x.ternary(bit, acc.x),
                     added.y.ternary(bit, acc.y))
    for bit, base_ext in zip(randomizer_bits, ped.random_base):
        base = CGroup.constant(builder, ed.to_affine(base_ext))
        added = acc + base
        acc = CGroup(builder, added.x.ternary(bit, acc.x),
                     added.y.ternary(bit, acc.y))
    return acc.x
