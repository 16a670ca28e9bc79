"""Network instantiations (MainnetV0/TestnetV0/CanaryV0): IDs, names, and
the network-ID-dependent derivations (function IDs, request signatures)."""
import random

from snarkvm_tpu.console import network as N
from snarkvm_tpu.console import networks
from snarkvm_tpu.console.networks import (
    MAINNET_V0, TESTNET_V0, CANARY_V0, set_network, use_network,
)
from snarkvm_tpu.console.request import compute_function_id, Request
from snarkvm_tpu.console.account import PrivateKey
from snarkvm_tpu.console.types import Plaintext


def test_ids_and_names():
    assert (MAINNET_V0.id, TESTNET_V0.id, CANARY_V0.id) == (0, 1, 2)
    assert MAINNET_V0.name == "Aleo Mainnet (v0)"
    assert TESTNET_V0.name == "Aleo Testnet (v0)"
    assert CANARY_V0.name == "Aleo Canary (v0)"


def test_set_network_rebinds_constants():
    assert N.ID == 0
    try:
        set_network("testnet")
        assert N.ID == 1 and "Testnet" in N.NAME
        set_network(2)
        assert N.ID == 2 and "Canary" in N.NAME
    finally:
        set_network(MAINNET_V0)
    assert N.ID == 0


def test_function_ids_are_network_separated():
    fid_main = compute_function_id(0, "credits.aleo", "transfer_public")
    fid_test = compute_function_id(1, "credits.aleo", "transfer_public")
    assert fid_main != fid_test


def test_requests_signed_on_testnet_fail_on_mainnet():
    rng = random.Random(5)
    sk = PrivateKey.new(rng)
    inputs = [Plaintext.literal("field", 3)]
    types = [("private", "field")]
    with use_network(TESTNET_V0):
        req = Request.sign(sk, "p.aleo", "f", inputs, types, rng)
        assert req.network_id == 1
        assert req.verify(types)
    # back on mainnet the embedded network id no longer matches
    assert N.ID == 0
    assert not req.verify(types)
