"""The three network instantiations — MainnetV0 / TestnetV0 / CanaryV0
(reference: console/network/src/{mainnet_v0,testnet_v0,canary_v0}.rs).

The reference networks share every cryptographic parameter (identical
hash-to-curve domain strings, Poseidon parameters, BHP/Pedersen bases —
verified by diffing the three files); they differ ONLY in the network ID
(0/1/2), the display name, and which distribution artifacts (genesis
block, circuit keys) they load. The TPU build therefore models a network
as a small spec and swaps the active one in `console.network`.
"""
from __future__ import annotations

from dataclasses import dataclass

from . import network as N


@dataclass(frozen=True)
class NetworkSpec:
    id: int                 # console/network/src/*_v0.rs `const ID`
    name: str               # `const NAME`
    resource_dir: str       # parameters/src/<dir>/resources


MAINNET_V0 = NetworkSpec(0, "Aleo Mainnet (v0)", "mainnet")
TESTNET_V0 = NetworkSpec(1, "Aleo Testnet (v0)", "testnet")
CANARY_V0 = NetworkSpec(2, "Aleo Canary (v0)", "canary")

_BY_ID = {s.id: s for s in (MAINNET_V0, TESTNET_V0, CANARY_V0)}
_BY_NAME = {"mainnet": MAINNET_V0, "testnet": TESTNET_V0, "canary": CANARY_V0}

_current = MAINNET_V0


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
