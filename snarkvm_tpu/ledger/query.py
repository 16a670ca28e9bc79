"""Query: state paths for record commitments from the live ledger
(ledger/src/get.rs get_state_path_for_commitment + ledger/query/).

A LedgerStatePath proves a transition output commitment against the
ledger's state root through the REAL block trees (block.py encodings,
reference-exact since round 5):

  commitment -> TransitionLeaf{version,index,variant=3,id} (leaf)
             -> transition tree   (depth 5) = transition FUNCTION root
  transition_id = BHP512(transition_root || tcm)
             -> TransactionLeaf{variant=1,index,id} (leaf)
             -> transaction tree  (depth 5) = transaction id
             -> transactions tree (field leaves, depth 20)
             -> header tree       (HeaderLeaf{index,id}, depth 3,
                                   transactions_root at index 1)
  block_hash == BHP1024(previous_hash bits || header_root bits)
  block_hash (leaf) -> block tree (field leaves, depth 32)
             -> global state root

This is the console-side inclusion witness (state_path/verify.rs
semantics); the in-circuit version is circuit/inclusion_gadget.py.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..console import network as N
from ..console.merkle import MerkleTree, BHPHasher
from ..console.types import int_to_bits_le
from .block import (Transition, _u8_field_leaf, HEADER_DEPTH,
                    TRANSACTIONS_DEPTH, TRANSACTION_DEPTH, TRANSITION_DEPTH)
from .ledger import BLOCK_TREE_DEPTH

_BHP = BHPHasher(1024, 512)
R = P.R


@dataclass
class PathLevel:
    leaf_bits: list
    index: int
    siblings: list
    root: int

    def verify(self) -> bool:
        h = _BHP.hash_leaf(self.leaf_bits)
        i = self.index
        for sib in self.siblings:
            h = (_BHP.hash_children(h, sib) if i % 2 == 0
                 else _BHP.hash_children(sib, h))
            i >>= 1
        return h == self.root


@dataclass
class LedgerStatePath:
    global_state_root: int
    commitment: int
    transition_level: PathLevel      # -> transition id
    transaction_level: PathLevel     # -> transaction id
    transactions_level: PathLevel    # -> transactions root
    header_level: PathLevel          # -> header root
    previous_block_hash: int
    block_hash: int
    block_level: PathLevel           # -> global state root
    # reference StatePath members binding the transition to its id
    # (console/program/src/state_path/mod.rs): the transition FUNCTION
    # root and tcm, with transition_id == BHP512(root || tcm)
    tcm: int = 0
    leaf_index: int = 0              # TransitionLeaf.index (inputs first)

    @property
    def transition_root(self) -> int:
        return self.transition_level.root

    @property
    def transaction_id(self) -> int:
        return self.transaction_level.root

    def verify(self, is_global: bool = True, local_state_root: int = 0) -> bool:
        """state_path/verify.rs semantics: struct leaves, variant checks,
        and the transition_id = BHP512(transition_root || tcm) binding."""
        from .block import transition_leaf_bits, transaction_leaf_bits
        # transition leaf: version/index/variant=3 (Record) struct with
        # the commitment as its id (verify.rs:58-60)
        if self.transition_level.leaf_bits != transition_leaf_bits(
                self.leaf_index, 3, self.commitment):
            return False
        for lvl in (self.transition_level, self.transaction_level,
                    self.transactions_level, self.header_level):
            if not lvl.verify():
                return False
        # transaction leaf: variant=1 (Execution) struct whose id is
        # transition_id = BHP512(transition_root || tcm) (verify.rs:62-71)
        transition_id = N.hash_bhp(
            512, int_to_bits_le(self.transition_root, 253)
            + int_to_bits_le(self.tcm % R, 253))
        tx_leaf = self.transaction_level.leaf_bits
        # the leaf's variant must be 1 and its id the derived transition id;
        # its u16 index is the transition's position in the transaction
        if tx_leaf[:8] != int_to_bits_le(1, 8):
            return False
        if tx_leaf[24:] != int_to_bits_le(transition_id, 253):
            return False
        # transactions tree leaf: the transaction id as bare field bits
        if self.transactions_level.leaf_bits != int_to_bits_le(self.transaction_id, 253):
            return False
        # header leaf: HeaderLeaf{index=1, transactions_root} (verify.rs:79-82)
        if self.header_level.leaf_bits != _u8_field_leaf(1, self.transactions_level.root):
            return False
        if not is_global:
            return self.transaction_id == local_state_root
        if not self.block_level.verify():
            return False
        # block hash = BHP1024(previous_hash || header_root) (verify.rs:85-90)
        expect_hash = N.hash_bhp(
            1024, int_to_bits_le(self.previous_block_hash, 253)
            + int_to_bits_le(self.header_level.root, 253))
        if expect_hash != self.block_hash:
            return False
        if self.block_level.leaf_bits != int_to_bits_le(self.block_hash % R, 253):
            return False
        return self.block_level.root == self.global_state_root


class RESTQuery:
    """Query::REST (ledger/query/src/query.rs:63-133): fetch the latest
    state root and state paths from a node's REST API.

    Endpoints (query.rs):
      GET {url}/{network}/stateRoot/latest
      GET {url}/{network}/statePath/{commitment}
    """

    def __init__(self, url: str, network: str = "mainnet", timeout: float = 10.0):
        self.url = url.rstrip("/")
        self.network = network
        self.timeout = timeout

    def _get(self, path: str) -> str:
        import urllib.request
        with urllib.request.urlopen(f"{self.url}/{self.network}{path}",
                                    timeout=self.timeout) as resp:
            return resp.read().decode()

    def current_state_root(self) -> int:
        import json as _json
        body = _json.loads(self._get("/stateRoot/latest"))
        # nodes return a display string like "sr1..." or a field literal
        if isinstance(body, str) and body.endswith("field"):
            return int(body.removesuffix("field"))
        return int(body)

    def get_state_path_for_commitment(self, commitment: int) -> "LedgerStatePath":
        import json as _json
        body = _json.loads(self._get(f"/statePath/{commitment}field"))
        return state_path_from_json(body)


def state_path_from_json(data: dict) -> "LedgerStatePath":
    """Rebuild a LedgerStatePath from its JSON form (state_path_to_json)."""
    def lvl(d):
        return PathLevel(leaf_bits=[bool(b) for b in d["leaf_bits"]],
                         index=d["index"],
                         siblings=[int(s) for s in d["siblings"]],
                         root=int(d["root"]))
    return LedgerStatePath(
        global_state_root=int(data["global_state_root"]),
        commitment=int(data["commitment"]),
        transition_level=lvl(data["transition"]),
        transaction_level=lvl(data["transaction"]),
        transactions_level=lvl(data["transactions"]),
        header_level=lvl(data["header"]),
        previous_block_hash=int(data["previous_block_hash"]),
        block_hash=int(data["block_hash"]),
        block_level=lvl(data["block"]),
        tcm=int(data.get("tcm", 0)),
        leaf_index=int(data.get("leaf_index", 0)),
    )


def state_path_to_json(sp: "LedgerStatePath") -> dict:
    def lvl(p):
        return {"leaf_bits": [1 if b else 0 for b in p.leaf_bits],
                "index": p.index,
                "siblings": [str(s) for s in p.siblings],
                "root": str(p.root)}
    return {
        "global_state_root": str(sp.global_state_root),
        "commitment": str(sp.commitment),
        "transition": lvl(sp.transition_level),
        "transaction": lvl(sp.transaction_level),
        "transactions": lvl(sp.transactions_level),
        "header": lvl(sp.header_level),
        "previous_block_hash": str(sp.previous_block_hash),
        "block_hash": str(sp.block_hash),
        "block": lvl(sp.block_level),
        "tcm": str(sp.tcm),
        "leaf_index": sp.leaf_index,
    }


class AsyncRESTQuery(RESTQuery):
    """The `async` feature variant (ledger/query/src/query.rs:86-133):
    the same two endpoints awaited off the event loop. The reference uses
    reqwest's async client; here the blocking urllib call is pushed onto
    the default executor so provers can overlap state-path fetches with
    witness generation."""

    async def current_state_root_async(self) -> int:
        import asyncio
        return await asyncio.to_thread(self.current_state_root)

    async def get_state_path_for_commitment_async(self, commitment: int):
        import asyncio
        return await asyncio.to_thread(
            self.get_state_path_for_commitment, commitment)


class Query:
    """ledger/query.rs analog over a Ledger instance (Query::VM)."""

    def __init__(self, ledger):
        self.ledger = ledger

    def current_state_root(self) -> int:
        return self.ledger.latest_state_root

    def get_state_path_for_commitment(self, commitment: int) -> LedgerStatePath:
        led = self.ledger
        loc = led.commitments.get(commitment)
        if loc is None:
            raise KeyError(f"commitment {commitment} not found in the ledger")
        height, tx_index, tr_index = loc
        block = led.get_block(height)
        tx = block.transactions[tx_index]
        transition = tx.transitions[tr_index]

        def prove(depth, leaves_bits, index):
            tree = MerkleTree(depth, _BHP, leaves_bits)
            idx, sibs = tree.prove(index)
            return PathLevel(leaves_bits[index], idx, sibs, tree.root)

        # level 1: transition tree over TransitionLeaf structs
        # (transition/merkle.rs function_tree)
        leaf_index = len(transition.inputs) + [v for _, v in transition.outputs].index(commitment)
        lvl1 = prove(TRANSITION_DEPTH, transition.leaves(), leaf_index)

        # level 2: transaction tree over TransactionLeaf structs; locate
        # this transition's leaf by its id (transaction/merkle.rs to_leaf)
        tx_leaves = tx.leaves()
        from .block import transaction_leaf_bits
        want = transaction_leaf_bits(1, 0, transition.id())[24:]
        tr_leaf_index = next(i for i, lb in enumerate(tx_leaves)
                             if lb[24:] == want)
        lvl2 = prove(TRANSACTION_DEPTH, tx_leaves, tr_leaf_index)

        # level 3: transactions tree over transaction ids
        txids = [t.id() for t in block.transactions]
        lvl3 = prove(TRANSACTIONS_DEPTH,
                     [int_to_bits_le(v, 253) for v in txids], tx_index)

        # level 4: header tree (transactions root at leaf index 1)
        h = block.header
        header_leaves = [
            _u8_field_leaf(0, h.previous_state_root),
            _u8_field_leaf(1, h.transactions_root),
            _u8_field_leaf(2, h.finalize_root),
            _u8_field_leaf(3, h.ratifications_root),
            _u8_field_leaf(4, h.solutions_root),
            _u8_field_leaf(5, h.subdag_root),
            _u8_field_leaf(6, 0),
            _u8_field_leaf(7, h.metadata.to_hash()),
        ]
        lvl4 = prove(HEADER_DEPTH, header_leaves, 1)

        # level 5: block tree over block hashes up to the LATEST block
        hashes = [b.hash() % R for b in led.blocks]
        lvl5 = prove(BLOCK_TREE_DEPTH,
                     [int_to_bits_le(v, 253) for v in hashes], height)

        return LedgerStatePath(
            global_state_root=led.latest_state_root,
            commitment=commitment,
            transition_level=lvl1, transaction_level=lvl2,
            transactions_level=lvl3, header_level=lvl4,
            previous_block_hash=block.previous_hash,
            block_hash=block.hash(),
            block_level=lvl5,
            tcm=transition.tcm % R,
            leaf_index=leaf_index,
        )
