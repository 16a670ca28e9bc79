"""Keccak/SHA3 + Pedersen circuit gadgets vs the console implementations."""
import random

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CBool
from snarkvm_tpu.circuit.keccak_gadget import (keccak_hash_gadget,
                                               pedersen_hash_gadget,
                                               pedersen_commit_gadget)
from snarkvm_tpu.hashes import keccak as kk
from snarkvm_tpu.console import network as N

rng = random.Random(0x3A)


class TestKeccakGadget:
    @pytest.mark.parametrize("kind", ["sha3", "keccak"])
    def test_256_matches_console(self, kind):
        b = CircuitBuilder()
        bits_v = [rng.randrange(2) == 1 for _ in range(256)]
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        out = keccak_hash_gadget(b, kind, 256, bits)
        want = kk.hash_bits(kind, 256, list(bits_v))
        assert [bt.value for bt in out] == list(want)
        assert b.is_satisfied()

    def test_multi_block_absorb(self):
        # > rate bits forces a second permutation
        b = CircuitBuilder()
        n = 1600 - 2 * 256 + 128
        bits_v = [rng.randrange(2) == 1 for _ in range(n)]
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        out = keccak_hash_gadget(b, "sha3", 256, bits)
        want = kk.hash_bits("sha3", 256, list(bits_v))
        assert [bt.value for bt in out] == list(want)
        assert b.is_satisfied()

    def test_sha3_512(self):
        b = CircuitBuilder()
        bits_v = [rng.randrange(2) == 1 for _ in range(64)]
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        out = keccak_hash_gadget(b, "sha3", 512, bits)
        want = kk.hash_bits("sha3", 512, list(bits_v))
        assert [bt.value for bt in out] == list(want)


class TestPedersenGadget:
    @pytest.mark.parametrize("width", [64, 128])
    def test_hash(self, width):
        b = CircuitBuilder()
        bits_v = [rng.randrange(2) == 1 for _ in range(width - 4)]
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        h = pedersen_hash_gadget(b, width, bits)
        assert b.value_of(h.lc) == N.hash_ped(width, list(bits_v))
        assert b.is_satisfied()

    def test_commit(self):
        b = CircuitBuilder()
        bits_v = [rng.randrange(2) == 1 for _ in range(48)]
        bits = [CBool.new(b, PRIVATE, v) for v in bits_v]
        r = rng.randrange(P.S)
        rbits = [CBool.new(b, PRIVATE, (r >> i) & 1 == 1) for i in range(251)]
        c = pedersen_commit_gadget(b, 64, bits, rbits)
        assert b.value_of(c.lc) == N.commit_ped(64, list(bits_v), r)
        assert b.is_satisfied()
