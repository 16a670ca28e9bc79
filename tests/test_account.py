"""Account scheme vs the reference's checked-in golden keypair
(console/account/src/lib.rs:57-59) — exercises Poseidon, hash-to-scalar,
Blake2Xs bases, Edwards arithmetic, base58 and bech32m end to end."""
import random

from snarkvm_tpu.console import account, network as N
from snarkvm_tpu.utils.encoding import base58_decode, base58_encode, bech32m_encode, bech32m_decode

ALEO_PRIVATE_KEY = "APrivateKey1zkp8cC4jgHEBnbtu3xxs1Ndja2EMizcvTRDq5Nikdkukg1p"
ALEO_VIEW_KEY = "AViewKey1n1n3ZbnVEtXVe3La2xWkUvY3EY7XaCG6RZJJ3tbvrrrD"
ALEO_ADDRESS = "aleo1wvgwnqvy46qq0zemj0k6sfp3zv0mp77rw97khvwuhac05yuwscxqmfyhwf"

PK_PREFIX = bytes([127, 134, 189, 116, 210, 221, 210, 137, 145, 18, 253])
VK_PREFIX = bytes([14, 138, 223, 204, 247, 224, 122])


def private_key_from_str(s):
    data = base58_decode(s)
    assert len(data) == 43 and data[:11] == PK_PREFIX
    seed = int.from_bytes(data[11:43], "little")
    return account.PrivateKey.from_seed(seed)


def test_golden_keypair():
    sk = private_key_from_str(ALEO_PRIVATE_KEY)
    # view key
    vk = sk.to_view_key()
    vk_bytes = VK_PREFIX + vk.to_bytes(32, "little")
    assert base58_encode(vk_bytes) == ALEO_VIEW_KEY
    # address: bech32m("aleo", x-coordinate LE)
    addr = sk.to_address()
    addr_str = bech32m_encode("aleo", addr[0].to_bytes(32, "little"))
    assert addr_str == ALEO_ADDRESS
    # round trip
    hrp, data = bech32m_decode(addr_str)
    assert hrp == "aleo" and int.from_bytes(data, "little") == addr[0]


def test_sign_verify():
    rng = random.Random(42)
    sk = account.PrivateKey.new(rng)
    addr = sk.to_address()
    msg = [123, 456, 789]
    sig = account.Signature.sign(sk, msg, rng)
    assert sig.verify(addr, msg)
    assert not sig.verify(addr, [123, 456, 790])
    other = account.PrivateKey.new(rng).to_address()
    assert not sig.verify(other, msg)
