"""Block / Header / Transactions structures + Merkle roots (ledger/block/src/).

Structural mirror with the reference's tree depths (console/program
state_path/configuration/mod.rs:30-67): TRANSACTIONS_DEPTH=20,
TRANSACTION_DEPTH=5, TRANSITION_DEPTH=5, HEADER_DEPTH=3. Trees are
BHP-hashed (N::merkle_tree_bhp: BHP1024 leaves / BHP512 paths).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..console.merkle import MerkleTree, BHPHasher
from ..console.types import int_to_bits_le, bits_to_int_le
from ..console import network as N
from . import target as T

HEADER_DEPTH = 3
TRANSACTIONS_DEPTH = 20
TRANSACTION_DEPTH = 5
TRANSITION_DEPTH = 5

_BHP = BHPHasher(1024, 512)


def _u8_field_leaf(index: int, value: int):
    return int_to_bits_le(index, 8) + int_to_bits_le(value, 253)


# ---------------------------------------------------------------------------
# Reference-exact state-path leaf structs (console/program/src/state_path/)
# ---------------------------------------------------------------------------

TRANSITION_LEAF_VERSION = 1   # transition_leaf/mod.rs TRANSITION_LEAF_VERSION

# Input variants: transition/input/mod.rs:45 (Constant..ExternalRecord);
# Output variants: transition/output/mod.rs:47 (adds Future=5). Input and
# output leaves share the variant space; the leaf INDEX disambiguates
# (outputs start at len(inputs) — transition/merkle.rs:53).
LEAF_VARIANT = {"constant": 0, "public": 1, "private": 2, "record": 3,
                "external_record": 4, "future": 5}


def transition_leaf_bits(index: int, variant: int, leaf_id: int):
    """TransitionLeaf{version,index,variant,id}.to_bits_le()."""
    return (int_to_bits_le(TRANSITION_LEAF_VERSION, 8)
            + int_to_bits_le(index, 8) + int_to_bits_le(variant, 8)
            + int_to_bits_le(leaf_id % N.R, 253))


def transaction_leaf_bits(variant: int, index: int, leaf_id: int):
    """TransactionLeaf{variant,index,id}.to_bits_le()."""
    return (int_to_bits_le(variant, 8) + int_to_bits_le(index, 16)
            + int_to_bits_le(leaf_id % N.R, 253))


@dataclass
class Metadata:
    """header/metadata/mod.rs."""
    network: int = 0
    round: int = 1
    height: int = 1
    cumulative_weight: int = 0
    cumulative_proof_target: int = 0
    coinbase_target: int = T.GENESIS_COINBASE_TARGET
    proof_target: int = T.GENESIS_PROOF_TARGET
    last_coinbase_target: int = T.GENESIS_COINBASE_TARGET
    last_coinbase_timestamp: int = 0
    timestamp: int = 0

    def to_bits_le(self):
        bits = []
        bits += int_to_bits_le(self.network, 16)
        bits += int_to_bits_le(self.round, 64)
        bits += int_to_bits_le(self.height, 32)
        bits += int_to_bits_le(self.cumulative_weight, 128)
        bits += int_to_bits_le(self.cumulative_proof_target, 128)
        bits += int_to_bits_le(self.coinbase_target, 64)
        bits += int_to_bits_le(self.proof_target, 64)
        bits += int_to_bits_le(self.last_coinbase_target, 64)
        bits += int_to_bits_le(self.last_coinbase_timestamp % (1 << 64), 64)
        bits += int_to_bits_le(self.timestamp % (1 << 64), 64)
        return bits

    def to_hash(self) -> int:
        return N.hash_bhp(1024, self.to_bits_le())

    def is_valid(self) -> bool:
        return self.round > 0 and self.height > 0 and self.timestamp > 0


@dataclass
class Header:
    previous_state_root: int
    transactions_root: int
    finalize_root: int
    ratifications_root: int
    solutions_root: int
    subdag_root: int
    metadata: Metadata

    def to_tree(self) -> MerkleTree:
        leaves = [
            _u8_field_leaf(0, self.previous_state_root),
            _u8_field_leaf(1, self.transactions_root),
            _u8_field_leaf(2, self.finalize_root),
            _u8_field_leaf(3, self.ratifications_root),
            _u8_field_leaf(4, self.solutions_root),
            _u8_field_leaf(5, self.subdag_root),
            _u8_field_leaf(6, 0),
            _u8_field_leaf(7, self.metadata.to_hash()),
        ]
        return MerkleTree(HEADER_DEPTH, _BHP, leaves)

    def to_root(self) -> int:
        return self.to_tree().root


@dataclass
class Transition:
    """block/src/transition/mod.rs:51 — structural subset."""
    program_id: str
    function_name: str
    inputs: list                 # input records: (tag, payload field)
    outputs: list
    tpk: tuple | None = None     # transition public key (group)
    tcm: int = 0                 # transition commitment
    scm: int = 0                 # signer commitment
    # console-side argument values (Plaintext/Literal or None per slot),
    # kept for restrictions checks (restrictions/mod.rs is_argument_restricted)
    input_values: list | None = None
    output_values: list | None = None

    def to_bits(self):
        from ..console.types import bytes_to_bits_le
        bits = bytes_to_bits_le(f"{self.program_id}/{self.function_name}".encode())
        for kind, val in list(self.inputs) + list(self.outputs):
            bits += int_to_bits_le(val % N.R, 253)
        bits += int_to_bits_le(self.tcm, 253)
        return bits

    def leaves(self):
        """TransitionLeaf bit-vectors for every input then output
        (transition/merkle.rs:67 function_tree; outputs indexed after
        inputs)."""
        out = []
        for i, (kind, val) in enumerate(list(self.inputs) + list(self.outputs)):
            out.append(transition_leaf_bits(i, LEAF_VARIANT[kind], val))
        return out or [transition_leaf_bits(0, 0, 0)]

    def to_root(self) -> int:
        """The transition FUNCTION root: Merkle tree over the
        TransitionLeaf structs (transition/merkle.rs:20 to_root)."""
        return MerkleTree(TRANSITION_DEPTH, _BHP, self.leaves()).root

    def id(self) -> int:
        """Transition id = BHP512(function_root || tcm)
        (transition/mod.rs:106 Transition::id via N::hash_bhp512 over
        to_bits_le![root, tcm] — the tcm binding the inclusion circuit
        re-derives in-circuit, state_path/verify.rs:63)."""
        root = self.to_root()
        return N.hash_bhp(512, int_to_bits_le(root, 253)
                          + int_to_bits_le(self.tcm % N.R, 253))


@dataclass
class Transaction:
    """Deploy | Execute | Fee (block/src/transaction/mod.rs:38)."""
    kind: str                    # "deploy" | "execute" | "fee"
    transitions: list
    payload: object = None       # Deployment / Execution extra data
    fee_amount: int | None = None  # base fee paid by the fee transition
    # proof-carrying lifecycle (transaction/execution: one batched Varuna
    # proof over the body transitions; fee/mod.rs: the fee's own proof)
    proof: object = None
    fee_proof: object = None
    global_state_root: int = 0

    def _split_fee(self):
        body, fee_ts = [], []
        for t in self.transitions:
            is_fee = (t.program_id == "credits.aleo"
                      and t.function_name.startswith("fee_"))
            (fee_ts if is_fee else body).append(t)
        return body, fee_ts

    def leaves(self):
        """TransactionLeaf bit-vectors (transaction/merkle.rs to_tree):
        deploys get variant-0 function-hash leaves + the fee last;
        executions get variant-1 transition leaves + the fee last;
        fee-only transactions a single variant-1 leaf."""
        body, fee_ts = self._split_fee()
        leaves = []
        if self.kind == "deploy" and self.payload is not None:
            from ..formats import program_io
            from ..formats.parity import deployment_function_leaf_id
            ast = program_io.program_from_text(self.payload.program_text)
            for i, fn in enumerate(ast.functions()):
                leaves.append(transaction_leaf_bits(
                    0, i, deployment_function_leaf_id(self.payload.program_id, fn)))
            for t in fee_ts:
                leaves.append(transaction_leaf_bits(1, len(leaves), t.id()))
        else:
            for i, t in enumerate(body + fee_ts):
                leaves.append(transaction_leaf_bits(1, i, t.id()))
        return leaves or [transaction_leaf_bits(1, 0, 0)]

    def id(self) -> int:
        return MerkleTree(TRANSACTION_DEPTH, _BHP, self.leaves()).root


@dataclass
class ConfirmedTransaction:
    """Accepted/Rejected x Deploy/Execute
    (block/src/transactions/confirmed/mod.rs:28). `transaction` is what
    the block actually carries: the full transaction when accepted, the
    FEE-ONLY transaction when rejected (the body is preserved in
    `rejected` for the rejected-ID commitment)."""
    variant: str          # accepted_deploy|accepted_execute|rejected_deploy|rejected_execute
    index: int            # position within the block's confirmed list
    transaction: "Transaction"
    rejected: "Transaction | None" = None     # original (unconfirmed) tx

    @property
    def is_accepted(self) -> bool:
        return self.variant.startswith("accepted")

    def to_unconfirmed_id(self) -> int:
        """confirmed/mod.rs to_unconfirmed_transaction_id: the original
        transaction's id for rejected entries, else the confirmed id."""
        return (self.rejected.id() if self.rejected is not None
                else self.transaction.id())


def fee_only_transaction(tx: "Transaction") -> "Transaction":
    """Rebuild a rejected transaction as its fee-only form
    (Transaction::from_fee, block/src/transaction/mod.rs): just the
    credits.aleo/fee_* transition survives into the block."""
    fee_ts = [t for t in tx.transitions
              if t.program_id == "credits.aleo"
              and t.function_name.startswith("fee_")]
    assert fee_ts, "rejected transaction has no fee transition"
    return Transaction("fee", fee_ts, fee_amount=tx.fee_amount,
                       fee_proof=tx.fee_proof,
                       global_state_root=tx.global_state_root)


def transactions_root(transactions) -> int:
    leaves = [int_to_bits_le(tx.id(), 253) for tx in transactions]
    if not leaves:
        leaves = [int_to_bits_le(0, 253)]
    return MerkleTree(TRANSACTIONS_DEPTH, _BHP, leaves).root


@dataclass
class Block:
    previous_hash: int
    header: Header
    transactions: list
    authority: object = None     # Beacon(signature) | Quorum(subdag)
    ratifications: list = field(default_factory=list)
    solutions: list = field(default_factory=list)
    aborted_transaction_ids: list = field(default_factory=list)
    aborted_solution_ids: list = field(default_factory=list)

    def hash(self) -> int:
        bits = int_to_bits_le(self.previous_hash, 253) + int_to_bits_le(self.header.to_root(), 253)
        return N.hash_bhp(1024, bits)

    def verify_structure(self) -> bool:
        if transactions_root(self.transactions) != self.header.transactions_root:
            return False
        if not self.header.metadata.is_valid():
            return False
        return True
