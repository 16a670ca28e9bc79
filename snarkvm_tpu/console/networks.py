"""The three network instantiations — MainnetV0 / TestnetV0 / CanaryV0
(reference: console/network/src/{mainnet_v0,testnet_v0,canary_v0}.rs).

The reference networks share every cryptographic parameter (identical
hash-to-curve domain strings, Poseidon parameters, BHP/Pedersen bases,
and the ONE universal SRS — testnet_v0.rs/canary_v0.rs delegate
`varuna_universal_prover/verifier` straight to MainnetV0); they differ
in the network ID (0/1/2), display name, genesis consensus constants,
narwhal batch limits, and which distribution artifacts (genesis block,
circuit keys, restrictions list) they load. The TPU build therefore
models a network as a small spec and swaps the active one in
`console.network`.

Validated against shipped artifacts (tests/test_networks.py): the
testnet and canary `block.genesis` files round-trip byte-exact, pass
all semantic parity checks (transition/transaction IDs, Merkle roots,
block hash, beacon signature), and all 8 shipped Varuna proofs per
network verify under our verifier with the per-network verifying keys.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

from . import network as N


@dataclass(frozen=True)
class NetworkSpec:
    id: int                       # console/network/src/*_v0.rs `const ID`
    name: str                     # `const NAME`
    resource_dir: str             # parameters/src/<dir>/resources
    edition: int = 0              # `const EDITION`
    # genesis consensus constants (mainnet_v0.rs:138-162 and analogs;
    # the non-test cfg values — all three networks share the targets)
    genesis_timestamp: int = 1725462000         # mainnet 2024-09-04 11:00 UTC
    genesis_coinbase_target: int = (1 << 29) - 1
    genesis_proof_target: int = 1 << 27
    max_certificates: int = 16    # narwhal BatchHeader::MAX_CERTIFICATES


MAINNET_V0 = NetworkSpec(0, "Aleo Mainnet (v0)", "mainnet")
TESTNET_V0 = NetworkSpec(1, "Aleo Testnet (v0)", "testnet",
                         genesis_timestamp=1715776496,  # 2024-05-15 12:34:56
                         max_certificates=100)
CANARY_V0 = NetworkSpec(2, "Aleo Canary (v0)", "canary",
                        genesis_timestamp=1715776496,
                        max_certificates=100)

_BY_ID = {s.id: s for s in (MAINNET_V0, TESTNET_V0, CANARY_V0)}
_BY_NAME = {"mainnet": MAINNET_V0, "testnet": TESTNET_V0, "canary": CANARY_V0}

_current = MAINNET_V0

# Root of the reference parameter distribution (the shipped artifacts).
# Overridable for deployments that vendor the resources elsewhere.
RESOURCE_ROOT = os.environ.get(
    "SNARKVM_TPU_RESOURCE_ROOT", "/root/reference/parameters/src")


def resources(spec: NetworkSpec | None = None) -> str:
    """Absolute path to the active network's shipped resources
    (genesis block, credits verifying keys, restrictions list)."""
    spec = spec or _current
    return os.path.join(RESOURCE_ROOT, spec.resource_dir, "resources")


def current() -> NetworkSpec:
    return _current


def set_network(spec: NetworkSpec | str | int) -> NetworkSpec:
    """Activate a network: rebinds the ID/NAME constants that feed
    function IDs, request signing, and `network.id` operands. The
    cryptographic bases are shared across networks (see module doc), so
    nothing else changes."""
    global _current
    if isinstance(spec, str):
        spec = _BY_NAME[spec]
    elif isinstance(spec, int):
        spec = _BY_ID[spec]
    _current = spec
    N.ID = spec.id
    N.NAME = spec.name
    return spec


class use_network:
    """Context manager: `with use_network(TESTNET_V0): ...`."""

    def __init__(self, spec):
        self.spec = spec

    def __enter__(self):
        self.prev = current()
        return set_network(self.spec)

    def __exit__(self, *exc):
        set_network(self.prev)
        return False
