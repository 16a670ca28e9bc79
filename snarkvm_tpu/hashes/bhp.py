"""BHP (Bowe–Hopwood–Pedersen) hash/commitment over Edwards-BLS12.

Host implementation mirroring console/algorithms/src/bhp/ exactly:
  * bases derived per window via Blake2Xs hash-to-curve
    ("Aleo.BHP.{W}.{S}.{domain}.{index}"), powers advance by 16× (4 dblings);
  * 3-bit chunk lookup: (1 + b0 + 2*b1) * base, negated if b2
    (hasher/hash_uncompressed.rs);
  * outer hash prepends [domain bits (188, reversed), input length as 64-bit
    LE bits], chains the digest x-coordinate for long inputs
    (bhp/hash_uncompressed.rs);
  * commit adds a randomizer against doubling powers of a random base.

Variants (bhp/mod.rs:15-18): BHP256 = (3,57), BHP512 = (6,43),
BHP768 = (15,23), BHP1024 = (8,54).
"""
from __future__ import annotations

import functools

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..curves.hash_to_curve import hash_to_curve_edwards

CHUNK = 3
VARIANTS = {256: (3, 57), 512: (6, 43), 768: (15, 23), 1024: (8, 54)}
FIELD_DATA_BITS = 252          # Field::size_in_data_bits (253 - 1)
SCALAR_BITS = 251              # Scalar::size_in_bits


def bytes_to_bits_le(b: bytes):
    return [(byte >> i) & 1 == 1 for byte in b for i in range(8)]


def u64_bits_le(v: int):
    return [(v >> i) & 1 == 1 for i in range(64)]


class BHP:
    def __init__(self, num_windows: int, window_size: int, domain: str):
        self.num_windows = num_windows
        self.window_size = window_size
        max_domain_bits = FIELD_DATA_BITS - 64
        assert len(domain) * 8 <= max_domain_bits
        dbits = bytes_to_bits_le(domain.encode())
        dbits += [False] * (max_domain_bits - len(dbits))
        dbits.reverse()
        self.domain_bits = dbits
        # bases[w][i]: generator_w * 16^i (extended points)
        self.bases = []
        for index in range(num_windows):
            g, _, _ = hash_to_curve_edwards(
                f"Aleo.BHP.{num_windows}.{window_size}.{domain}.{index}"
            )
            base = ed.to_extended(g)
            powers = []
            for _ in range(window_size):
                powers.append(base)
                for _ in range(4):
                    base = ed.ext_double(base)
            self.bases.append(powers)
        rg, _, _ = hash_to_curve_edwards(
            f"Aleo.BHP.{num_windows}.{window_size}.{domain}.Randomizer"
        )
        rbase = ed.to_extended(rg)
        self.random_base = []
        for _ in range(SCALAR_BITS):
            self.random_base.append(rbase)
            rbase = ed.ext_double(rbase)

    @property
    def max_bits(self):
        return self.num_windows * self.window_size * CHUNK

    @property
    def min_bits(self):
        return self.window_size * CHUNK

    def _hasher(self, bits):
        """BHPHasher::hash_uncompressed — returns extended point."""
        assert self.min_bits < len(bits) <= self.max_bits, (
            f"BHP input must be in ({self.min_bits}, {self.max_bits}], got {len(bits)}"
        )
        if len(bits) % CHUNK:
            bits = list(bits) + [False] * (CHUNK - len(bits) % CHUNK)
        acc = ed.IDENTITY_EXT
        per_window = self.window_size * CHUNK
        for w, wstart in enumerate(range(0, len(bits), per_window)):
            wbits = bits[wstart : wstart + per_window]
            for i in range(0, len(wbits), CHUNK):
                c = wbits[i : i + CHUNK]
                base = self.bases[w][i // CHUNK]
                mult = 1 + (1 if c[0] else 0) + (2 if len(c) > 1 and c[1] else 0)
                pt = base
                if mult >= 2:
                    pt = ed.ext_add(pt, base)
                if mult >= 3:
                    pt = ed.ext_add(pt, base)
                if mult == 4:
                    pt = ed.ext_add(pt, base)
                if len(c) > 2 and c[2]:
                    pt = ed.ext_neg(pt)
                acc = ed.ext_add(acc, pt)
        return acc

    def hash_uncompressed(self, bits):
        """BHP::hash_uncompressed — returns affine point."""
        num_hasher_bits = self.max_bits
        num_data_bits = FIELD_DATA_BITS
        max_input_per_iter = num_hasher_bits - num_data_bits
        digest = None
        bits = list(bits)
        chunks = [bits[i : i + max_input_per_iter] for i in range(0, max(len(bits), 1), max_input_per_iter)]
        for i, input_bits in enumerate(chunks):
            if i == 0:
                preimage = list(self.domain_bits) + u64_bits_le(len(bits)) + input_bits
            else:
                x = ed.to_affine(digest)[0]
                xbits = [(x >> j) & 1 == 1 for j in range(253)]
                preimage = xbits[:num_data_bits] + input_bits
            digest = self._hasher(preimage)
        return ed.to_affine(digest)

    def hash(self, bits) -> int:
        """BHP::hash — x-coordinate of the uncompressed hash."""
        return self.hash_uncompressed(bits)[0]

    def commit_uncompressed(self, bits, randomizer: int):
        """hash + sum_i r_i * 2^i * random_base (bhp/commit_uncompressed.rs)."""
        acc = ed.to_extended(self.hash_uncompressed(bits))
        for i in range(SCALAR_BITS):
            if (randomizer >> i) & 1:
                acc = ed.ext_add(acc, self.random_base[i])
        return ed.to_affine(acc)

    def commit(self, bits, randomizer: int) -> int:
        return self.commit_uncompressed(bits, randomizer)[0]


@functools.lru_cache(maxsize=None)
def bhp(variant: int, domain: str) -> BHP:
    w, s = VARIANTS[variant]
    return BHP(w, s, domain)
