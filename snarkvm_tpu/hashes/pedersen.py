"""Pedersen hash/commitment over Edwards-BLS12 (console/algorithms/src/pedersen/).

bases: doubling powers of Blake2Xs hash-to-curve generators
("Aleo.Pedersen.Base.{domain}" / "Aleo.Pedersen.RandomBase.{domain}").
hash = sum of base powers at set input bits (≤ NUM_BITS);
commit = hash + sum of random-base powers at set randomizer bits.
Variants: Pedersen64, Pedersen128.
"""
from __future__ import annotations

import functools

from ..curves import edwards as ed
from ..curves.hash_to_curve import hash_to_curve_edwards

SCALAR_BITS = 251


class Pedersen:
    def __init__(self, num_bits: int, domain: str):
        self.num_bits = num_bits
        g, _, _ = hash_to_curve_edwards(f"Aleo.Pedersen.Base.{domain}")
        base = ed.to_extended(g)
        self.base_window = []
        for _ in range(num_bits):
            self.base_window.append(base)
            base = ed.ext_double(base)
        rg, _, _ = hash_to_curve_edwards(f"Aleo.Pedersen.RandomBase.{domain}")
        rbase = ed.to_extended(rg)
        self.random_base = []
        for _ in range(SCALAR_BITS):
            self.random_base.append(rbase)
            rbase = ed.ext_double(rbase)

    def hash_uncompressed(self, bits):
        bits = list(bits)
        assert len(bits) <= self.num_bits, f"Pedersen input exceeds {self.num_bits} bits"
        acc = ed.IDENTITY_EXT
        for bit, base in zip(bits, self.base_window):
            if bit:
                acc = ed.ext_add(acc, base)
        return ed.to_affine(acc)

    def hash(self, bits) -> int:
        return self.hash_uncompressed(bits)[0]

    def commit_uncompressed(self, bits, randomizer: int):
        acc = ed.to_extended(self.hash_uncompressed(bits))
        for i in range(SCALAR_BITS):
            if (randomizer >> i) & 1:
                acc = ed.ext_add(acc, self.random_base[i])
        return ed.to_affine(acc)

    def commit(self, bits, randomizer: int) -> int:
        return self.commit_uncompressed(bits, randomizer)[0]


@functools.lru_cache(maxsize=None)
def pedersen(num_bits: int, domain: str) -> Pedersen:
    return Pedersen(num_bits, domain)
