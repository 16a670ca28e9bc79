"""Fiat–Shamir: PoseidonSponge over Fq (rate 2) with nonnative Fr I/O.

Exact behavioral mirror of algorithms/src/crypto_hash/poseidon.rs +
traits/algebraic_sponge.rs:
  * absorb_bytes: bits MSB-first packed into 376-bit (capacity) Fq chunks
  * absorb_native: Fq duplex absorb
  * absorb_nonnative: Fr -> limbs (find_parameters(377,253,Weight)) ->
    pairwise compression -> native absorb
  * squeeze_nonnative: Fq squeezes -> BE bits (skip top 8) -> 252-bit Fr
  * squeeze_short: 168-bit Fr challenges
"""
from __future__ import annotations

import functools

from ..params import bls12_377 as P
from ..hashes.poseidon import PoseidonSponge, parameters

FQ_BITS = 377
FR_BITS = 253
FQ_CAPACITY = FQ_BITS - 1        # 376
FQ_REPR_BITS = 384               # 6x64 limbs
FQ_SHAVE = FQ_REPR_BITS - FQ_BITS  # 7


@functools.lru_cache(maxsize=None)
def find_parameters_weight(base_bits: int = FQ_BITS, target_bits: int = FR_BITS):
    """Port of traits/algebraic_sponge.rs find_parameters (Weight branch)."""
    surfeit = 10
    max_limb_size = (base_bits - 1 - surfeit - 1) // 2 - 1
    if max_limb_size > target_bits:
        max_limb_size = target_bits
    best = None
    for limb_size in range(1, max_limb_size + 1):
        num_limbs = (target_bits + limb_size - 1) // limb_size
        group_size = (base_bits - 1 - surfeit - 1 - 1 - limb_size + limb_size - 1) // limb_size
        num_groups = (2 * num_limbs - 1 + group_size - 1) // group_size
        cost = 6 * num_limbs * num_limbs
        cost += target_bits * 3 + target_bits
        cost += target_bits * 3 + target_bits + num_limbs
        cost += num_limbs * num_limbs + 2 * (2 * num_limbs - 1)
        cost += num_limbs + num_groups + 6 * num_groups + (num_groups - 1) * (2 * limb_size + surfeit) * 4 + 2
        if best is None or cost < best[0]:
            best = (cost, num_limbs, limb_size)
    return best[1], best[2]  # (num_limbs, bits_per_limb)


class FiatShamir:
    """The sponge FS<N> = PoseidonSponge<Fq, 2, 1> (console/network/src/lib.rs:65)."""

    def __init__(self):
        self.sponge = PoseidonSponge(parameters("fq", 2))

    # -- native (Fq) --
    def absorb_native_field_elements(self, elems):
        self.sponge.absorb_native([e % P.Q for e in elems])

    def squeeze_native_field_elements(self, num: int):
        return self.sponge.squeeze_native(num)

    # -- bytes --
    def absorb_bytes(self, data: bytes):
        bits = []
        for byte in data:
            for k in range(7, -1, -1):
                bits.append((byte >> k) & 1)
        elems = []
        for i in range(0, len(bits), FQ_CAPACITY):
            chunk = bits[i : i + FQ_CAPACITY]
            v = 0
            for b in chunk:
                v = (v << 1) | b
            elems.append(v)  # < 2^376 < q, from_bigint always valid
        self.absorb_native_field_elements(elems)

    # -- nonnative (Fr) --
    def absorb_nonnative_field_elements(self, elems):
        num_limbs, bits_per_limb = find_parameters_weight()
        src_limbs = []
        for e in elems:
            e %= P.R
            limbs = []
            cur = e
            for _ in range(num_limbs):
                limbs.append(cur & ((1 << bits_per_limb) - 1))
                cur >>= bits_per_limb
            limbs.reverse()  # highest limb first
            src_limbs.extend(limbs)
        # compress_elements with all coefficients = 1: overhead(2) = 2
        adjustment_bits = bits_per_limb + 2
        dest = []
        i = 0
        while i < len(src_limbs):
            if i + 1 < len(src_limbs) and 2 * adjustment_bits <= FQ_CAPACITY:
                dest.append((src_limbs[i] << adjustment_bits) + src_limbs[i + 1])
                i += 2
            else:
                dest.append(src_limbs[i])
                i += 1
        self.absorb_native_field_elements(dest)

    def _get_bits(self, num_bits: int):
        bits_per_element = FQ_BITS - 1  # 376
        num_elements = (num_bits + bits_per_element - 1) // bits_per_element
        elems = self.squeeze_native_field_elements(num_elements)
        bits = []
        for e in elems:
            # 384-bit BE bits, skip REPR_SHAVE_BITS + 1 = 8 top bits
            ebits = [(e >> k) & 1 for k in range(FQ_REPR_BITS - 1, -1, -1)]
            bits.extend(ebits[FQ_SHAVE + 1 :])
        return bits[:num_bits]

    def _get_fe(self, num: int, short: bool):
        nbits = 168 if short else FR_BITS - 1  # 252
        bits = self._get_bits(nbits * num)
        out = []
        for i in range(num):
            chunk = bits[i * nbits : (i + 1) * nbits]
            v = 0
            for b in chunk:
                v = (v << 1) | b
            out.append(v % P.R)
        return out

    def squeeze_nonnative_field_elements(self, num: int):
        return self._get_fe(num, False)

    def squeeze_short_nonnative_field_elements(self, num: int):
        return self._get_fe(num, True)

    def squeeze_short_nonnative_field_element(self):
        return self._get_fe(1, True)[0]
