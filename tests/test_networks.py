"""TestnetV0 / CanaryV0 network instantiations, validated against their
SHIPPED artifacts (reference: console/network/src/{testnet_v0,canary_v0}.rs,
parameters/src/{testnet,canary}/resources/).

The three networks share every cryptographic parameter and the one
universal SRS (testnet_v0.rs delegates varuna_universal_prover/verifier
to MainnetV0); they differ in ID, genesis constants, and artifacts.
These tests consume the reference-produced testnet/canary genesis
blocks — real cross-implementation byte vectors.
"""
import os

import pytest

from snarkvm_tpu.console import networks

pytestmark = pytest.mark.skipif(
    not os.path.isdir(networks.RESOURCE_ROOT),
    reason="reference parameter resources not present")

NETS = ["testnet", "canary"]


def _genesis(net):
    path = os.path.join(networks.RESOURCE_ROOT, net, "resources", "block.genesis")
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("net", NETS)
def test_genesis_roundtrip_byte_exact(net):
    from snarkvm_tpu.formats import block_io
    data = _genesis(net)
    with networks.use_network(net):
        blk = block_io.read_block(data)
        assert block_io.write_block(blk) == data
        assert blk.header.metadata.network == networks.current().id
        assert blk.header.metadata.height == 0
        assert blk.header.metadata.timestamp == networks.current().genesis_timestamp


@pytest.mark.parametrize("net", NETS)
def test_genesis_semantic_parity(net):
    """Every transition/transaction ID, Merkle root, committee ID, block
    hash, and the beacon signature recompute from our primitives."""
    from snarkvm_tpu.formats import block_io, parity
    with networks.use_network(net):
        blk = block_io.read_block(_genesis(net))
        res = parity.check_block(blk)
        failures = [k for k, v in res.items() if not v]
        assert not failures, failures
        assert len(res) >= 18


@pytest.mark.parametrize("net", NETS)
def test_shipped_proofs_verify(net):
    """All 8 shipped Varuna proofs per network (4 transfer_public_to_private
    executions + 4 fee_public fees) verify under OUR verifier with the
    per-network shipped verifying keys and the shared universal SRS."""
    from snarkvm_tpu.formats import block_io, parity
    from snarkvm_tpu.params import mainnet_artifacts as MA
    rd = os.path.join(networks.RESOURCE_ROOT, net, "resources")
    srs = MA.verifier_srs()  # the ONE universal SRS, shared across networks
    with networks.use_network(net):
        blk = block_io.read_block(_genesis(net))
        vk_t2p, _ = MA.credits_verifying_key("transfer_public_to_private", rd)
        vk_fee, _ = MA.credits_verifying_key("fee_public", rd)
        n = 0
        for ct in blk.transactions:
            tx = ct.transaction
            assert parity.verify_single_transition_proof(
                srs, vk_t2p, tx.execution.transitions[0], tx.execution.proof)
            assert parity.verify_single_transition_proof(
                srs, vk_fee, tx.fee.transition, tx.fee.proof)
            n += 2
        assert n == 8


@pytest.mark.parametrize("net", NETS)
def test_network_verifier_keys_roundtrip(net):
    from snarkvm_tpu.formats import varuna_io
    rd = os.path.join(networks.RESOURCE_ROOT, net, "resources")
    found = 0
    for name in os.listdir(rd):
        if not name.endswith(".verifier"):
            continue
        found += 1
        with open(os.path.join(rd, name), "rb") as f:
            data = f.read()
        vk, num_vars = varuna_io.read_verifying_key(data)
        assert varuna_io.write_verifying_key(vk, num_vars) == data
    assert found >= 10


def test_genesis_ledger_uses_network_constants():
    """Ledger genesis metadata follows the active network spec."""
    from snarkvm_tpu.ledger import test_helpers as TH
    with networks.use_network("testnet"):
        led, _keys = TH.sample_genesis_ledger()
        md = led.latest_block.header.metadata
        assert md.network == 1
        assert md.timestamp == networks.TESTNET_V0.genesis_timestamp
