"""BHP / Pedersen / Keccak / Blake2Xs correctness."""
import hashlib
import json
import random

import pytest

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.utils.blake2xs import blake2s, blake2xs
from snarkvm_tpu.curves import edwards
from snarkvm_tpu.curves.hash_to_curve import hash_to_curve_edwards, hash_to_curve_g1
from snarkvm_tpu.hashes import keccak as kk
from snarkvm_tpu.hashes.bhp import bhp, bytes_to_bits_le
from snarkvm_tpu.hashes.pedersen import pedersen

rng = random.Random(7)


def test_blake2xs_kat():
    kat = json.load(open("/root/reference/console/algorithms/src/blake2xs/resources/blake2-kat.json"))
    cases = [c for c in kat if c["hash"] == "blake2xs" and c["key"] == ""][:64]
    for c in cases:
        assert blake2xs(bytes.fromhex(c["in"]), len(c["out"]) // 2).hex() == c["out"]


def test_hash_to_curve_generators():
    g, _, k = hash_to_curve_edwards("Aleo Edwards BLS12")
    assert k == 4 and g == (P.EDWARDS_GENERATOR_X, P.EDWARDS_GENERATOR_Y)
    g1, _, k1 = hash_to_curve_g1("Aleo BLS12-377 G1")
    assert k1 == 0 and (g1[0].v, g1[1].v) == (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)


@pytest.mark.parametrize("variant", [256, 384, 512])
def test_sha3_vs_hashlib(variant):
    for data in [b"", b"abc", bytes(rng.randrange(256) for _ in range(137))]:
        assert kk.sha3(data, variant) == hashlib.new(f"sha3_{variant}", data).digest()


def test_keccak256_known_vectors():
    # well-known legacy-Keccak vectors (pre-FIPS padding)
    assert kk.keccak(b"", 256).hex() == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert kk.keccak(b"abc", 256).hex() == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_bhp256_basic():
    h = bhp(256, "AleoBHP256")
    bits = bytes_to_bits_le(b"hello world test input!!")  # 192 bits
    out = h.hash(bits)
    assert 0 < out < P.R
    # determinism + point validity
    pt = h.hash_uncompressed(bits)
    assert edwards.is_on_curve(pt)
    assert h.hash(bits) == out
    # different input -> different hash
    bits2 = list(bits)
    bits2[0] = not bits2[0]
    assert h.hash(bits2) != out


def test_bhp_commit_hiding():
    h = bhp(256, "AleoBHP256")
    bits = bytes_to_bits_le(b"hello world test input!!")
    c1 = h.commit(bits, 12345)
    c2 = h.commit(bits, 54321)
    assert c1 != c2
    assert h.commit(bits, 12345) == c1


def test_pedersen64():
    ped = pedersen(64, "AleoPedersen64")
    bits = bytes_to_bits_le(b"12345678")
    out = ped.hash(bits)
    assert 0 < out < P.R
    assert ped.commit(bits, 777) != out
