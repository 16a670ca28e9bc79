"""Shared test fixtures (ledger/test-helpers crate analog,
test-helpers/src/lib.rs:50-265): deterministic sample objects for
consumers' test suites — a funded ledger, transitions, executions,
deployments, fee transactions, and solutions. Production code never
imports this module."""
from __future__ import annotations

import random

from ..console import account
from ..utils.encoding import bech32m_encode

SAMPLE_SEED = 130


def sample_rng(seed: int = SAMPLE_SEED) -> random.Random:
    return random.Random(seed)


def addr_str(key) -> str:
    return bech32m_encode("aleo", key.to_address()[0].to_bytes(32, "little"))


def sample_keys(n: int = 4, rng=None):
    rng = rng or sample_rng()
    return [account.PrivateKey.new(rng) for _ in range(n)]


def sample_genesis_ledger(rng=None, balance: int = 1_000_000_000):
    """A 4-validator ledger with the first validator funded."""
    from .ledger import Ledger
    rng = rng or sample_rng()
    keys = sample_keys(4, rng)
    led = Ledger(keys, rng, public_balances={addr_str(keys[0]): balance}, srs=None)
    led._keys = keys
    return led, keys


def sample_execution_transaction(led=None, keys=None, amount: int = 100,
                                 with_fee: bool = True):
    """An unproven transfer_public PendingTransaction on `led`."""
    if led is None:
        led, keys = sample_genesis_ledger()
    rng = led.rng
    dest = addr_str(account.PrivateKey.new(rng))
    return led.vm.execute(
        keys[0], "credits.aleo", "transfer_public",
        [dest, f"{amount}u64"],
        [("public", "address"), ("public", "u64")],
        priority_fee=0 if with_fee else None)


def sample_transition(led=None, keys=None):
    return sample_execution_transaction(led, keys).transaction.transitions[0]


def sample_rejected_execution(led=None, keys=None):
    """A PendingTransaction whose body halts in finalize (overspend) but
    whose fee clears — speculation rejects it (fee-only confirmed tx)."""
    if led is None:
        led, keys = sample_genesis_ledger()
    rng = led.rng
    dest = addr_str(account.PrivateKey.new(rng))
    return led.vm.execute(
        keys[0], "credits.aleo", "transfer_public",
        [dest, "999999999999u64"],
        [("public", "address"), ("public", "u64")], priority_fee=0)


SAMPLE_PROGRAM = """program sample_{name}.aleo;

function double_it:
    input r0 as u32.private;
    add r0 r0 into r1;
    output r1 as u32.private;
"""


def sample_deployment_transaction(led=None, keys=None, name: str = "one"):
    if led is None:
        led, keys = sample_genesis_ledger()
    return led.vm.deploy_transaction(
        keys[0], SAMPLE_PROGRAM.format(name=name), priority_fee=0)


def sample_solution(led=None, counter: int = 1):
    """A valid puzzle solution for the ledger's current epoch."""
    from .puzzle import Puzzle, SimpleSynthesisPuzzle
    if led is None:
        led, _ = sample_genesis_ledger()
    puzzle = Puzzle(synthesis=SimpleSynthesisPuzzle())
    epoch_hash = led.latest_epoch_hash()
    addr_x = led.validator_addresses[0][0]
    return puzzle.prove(epoch_hash, addr_x, counter), puzzle
