"""Console Network: the chain's constant cosmos (console/network/src/lib.rs:72).

MainnetV0-equivalent hash/commit dispatchers over host scalar math:
BHP/Pedersen/Poseidon families, Elligator2, account bases, and the
consensus constants. All generators derive from Blake2Xs hash-to-curve
with the exact mainnet domain strings (mainnet_v0.rs:37-69).
"""
from __future__ import annotations

import functools

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..curves.hash_to_curve import hash_to_curve_edwards
from ..hashes import poseidon, bhp as bhp_mod, pedersen as ped_mod, keccak as keccak_mod
from ..fields.scalar import Fr

R = P.R            # console Field modulus (Fr of BLS12-377)
SCALAR_MOD = P.S   # console Scalar modulus
FIELD_BITS = 253
FIELD_DATA_BITS = 252
SCALAR_BITS = 251
SCALAR_DATA_BITS = 250

# Montgomery form of Edwards-BLS12 (for Elligator2), from
# curves/src/edwards_bls12/parameters.rs doc comments.
MONTGOMERY_A = 3990301581132929505568273333084066329187552697088022219156688740916631500114
MONTGOMERY_B = 4454160168295440918680551605697480202188346638066041608778544715000777738925

# --- consensus constants (console/network/src/lib.rs:88-200) ---
ID = 0
NAME = "Aleo Mainnet (v0)"
EDITION = 0
BLOCK_TIME = 10
NUM_BLOCKS_PER_EPOCH = 360
MAX_SOLUTIONS = 4
STARTING_SUPPLY = 1_500_000_000_000_000
MAX_DEPLOYMENT_CONSTRAINTS = 1 << 20
MAX_DEPLOYMENT_VARIABLES = 1 << 20
TRANSACTION_SPEND_LIMIT = 100_000_000
MAX_DATA_ENTRIES = 32
MAX_DATA_SIZE_IN_FIELDS = (128 * 1024 * 8) // FIELD_DATA_BITS  # cf. lib.rs
MAX_FUNCTIONS = 31
MAX_INPUTS = 16
MAX_OUTPUTS = 16
MAX_WRITES = 16


def domain_separator(domain: str) -> int:
    return int.from_bytes(domain.encode(), "little") % R


# --- lazily-built cryptographic bases ---

@functools.lru_cache(maxsize=None)
def _new_bases(message: str):
    """new_bases (mainnet_v0.rs:90): doubling powers of a hash-to-curve point."""
    g, _, _ = hash_to_curve_edwards(message)
    base = ed.to_extended(g)
    out = []
    for _ in range(SCALAR_BITS):
        out.append(base)
        base = ed.ext_double(base)
    return out


def generator_g():
    return _new_bases("AleoAccountEncryptionAndSignatureScheme0")


ENCRYPTION_DOMAIN = domain_separator("AleoSymmetricEncryption0")
GRAPH_KEY_DOMAIN = domain_separator("AleoGraphKey0")
SERIAL_NUMBER_DOMAIN = domain_separator("AleoSerialNumber0")


def g_scalar_multiply(scalar: int):
    """Sum of bases at scalar bits -> affine point (mainnet_v0.rs:218)."""
    acc = ed.IDENTITY_EXT
    s = scalar % SCALAR_MOD
    for i, base in enumerate(generator_g()):
        if (s >> i) & 1:
            acc = ed.ext_add(acc, base)
    return ed.to_affine(acc)


# --- BHP / Pedersen ---

@functools.lru_cache(maxsize=None)
def _bhp(variant: int):
    return bhp_mod.bhp(variant, f"AleoBHP{variant}")


@functools.lru_cache(maxsize=None)
def _pedersen(bits: int):
    return ped_mod.pedersen(bits, f"AleoPedersen{bits}")


def hash_bhp(variant: int, bits) -> int:
    return _bhp(variant).hash(bits)


def commit_bhp(variant: int, bits, randomizer: int) -> int:
    return _bhp(variant).commit(bits, randomizer)


def commit_bhp_to_group(variant: int, bits, randomizer: int):
    return _bhp(variant).commit_uncompressed(bits, randomizer)


def hash_ped(bits_width: int, bits) -> int:
    return _pedersen(bits_width).hash(bits)


def commit_ped(bits_width: int, bits, randomizer: int) -> int:
    return _pedersen(bits_width).commit(bits, randomizer)


def commit_ped_to_group(bits_width: int, bits, randomizer: int):
    return _pedersen(bits_width).commit_uncompressed(bits, randomizer)


# --- Poseidon family (domains "AleoPoseidon{2,4,8}") ---

def hash_psd(rate: int, inputs) -> int:
    return poseidon.hash_with_domain("fr", rate, f"AleoPoseidon{rate}", inputs)


def hash_many_psd(rate: int, inputs, num_outputs: int):
    return poseidon.hash_many_with_domain("fr", rate, f"AleoPoseidon{rate}", inputs, num_outputs)


def from_field_lossy_scalar(field: int) -> int:
    """Scalar::from_field_lossy — truncate to 250 bits (from_field_lossy.rs:31)."""
    return (field % R) & ((1 << SCALAR_DATA_BITS) - 1)


def hash_to_scalar_psd(rate: int, inputs) -> int:
    return from_field_lossy_scalar(hash_psd(rate, inputs))


def program_address(program_id: str):
    """ProgramID::to_address (console/program/src/id/to_address.rs:20):
    HashToGroup_psd4([name_field, network_field])."""
    from .types import Identifier
    name, _, network = program_id.partition(".")
    return hash_to_group_psd(4, [Identifier(name).to_field(),
                                 Identifier(network).to_field()])


def hash_to_group_psd(rate: int, inputs):
    """hash_many(2) -> Elligator2 each -> sum (poseidon/hash_to_group.rs)."""
    assert inputs, "input to hash to group cannot be empty"
    h0, h1 = hash_many_psd(rate, inputs, 2)
    p0, _ = elligator2_encode(h0)
    p1, _ = elligator2_encode(h1)
    return ed.add(p0, p1)


# --- Keccak / SHA3 ---

def hash_keccak(variant: int, bits):
    return keccak_mod.hash_bits("keccak", variant, bits)


def hash_sha3(variant: int, bits):
    return keccak_mod.hash_bits("sha3", variant, bits)


# --- Elligator2 (console/algorithms/src/elligator2/encode.rs) ---

def _legendre(x: int) -> int:
    if x % R == 0:
        return 0
    return 1 if pow(x, (R - 1) >> 1, R) == 1 else -1


def even_square_root(x: int) -> int:
    s = Fr(x).sqrt()
    if s is None:
        raise ValueError("not a square")
    return (R - s.v) if (s.v & 1) else s.v


def elligator2_encode(input_field: int):
    """Returns (affine Edwards point, sign_high)."""
    r_in = input_field % R
    assert r_in != 0, "Elligator2 input must be nonzero"
    sign_high = r_in > (R - r_in) % R
    b_inv = pow(MONTGOMERY_B, -1, R)
    a = MONTGOMERY_A * b_inv % R
    b = b_inv * b_inv % R
    u_coeff = P.EDWARDS_D
    ur2 = u_coeff * r_in % R * r_in % R
    assert (a * a % R * ur2 - b * (1 + ur2) % R * (1 + ur2)) % R != 0
    v = (-a) * pow(1 + ur2, -1, R) % R
    assert v != 0
    e = _legendre((v * v % R * v + a * v % R * v + b * v) % R)
    assert e != 0
    if e == 1:
        x = v
    else:
        x = (-v - a) % R
    assert x != 0
    rhs = (x * x % R * x + a * x % R * x + b * x) % R
    value = even_square_root(rhs)
    y = (R - value) % R if e == 1 else value
    assert y != 0 and y * y % R == rhs
    u = x * MONTGOMERY_B % R
    vv = y * MONTGOMERY_B % R
    # Montgomery -> Edwards: (x, y) = (u/v, (u-1)/(u+1))
    ex = u * pow(vv, -1, R) % R
    ey = (u - 1) * pow(u + 1, -1, R) % R
    pt = (ex, ey)
    assert ed.is_on_curve(pt), "Elligator2 point off curve"
    g = ed.mul(pt, ed.COFACTOR)
    assert g != ed.IDENTITY_AFFINE
    return g, sign_high
