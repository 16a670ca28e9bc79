"""The Ledger: genesis -> block template -> validation -> advance.

Behavioral mirror of ledger/src/ (advance.rs construct_block_template,
check_next_block.rs, ledger/block/src/verify.rs core checks) over the
VM + FinalizeStore + Puzzle + Committee pieces:

  * genesis block (round 0, height 0, genesis targets, Genesis ratification
    seeding committee stakes + public balances into credits.aleo mappings);
  * prepare_advance_to_next_beacon_block: validate candidate solutions
    against the previous epoch hash/proof target (MAX_SOLUTIONS split,
    advance.rs:141), compute next targets (to_next_targets), coinbase and
    block/puzzle reward ratifications, dry-run speculate transactions;
  * check_next_block: previous-hash/height/round/timestamp linkage, exact
    target recomputation, solutions accumulator + ratification amounts,
    transactions root, dry-run speculation match;
  * advance_to_next_block: validate, re-speculate for real, commit, apply
    reward ratifications (staking to committee stakes, proving to
    credits.aleo account balances), update the block tree state root.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..console import network as N
from ..console.types import Plaintext, Literal, int_to_bits_le, literal_from_str
from ..console.merkle import MerkleTree, BHPHasher
from ..synthesizer import finalize as F
from ..synthesizer.vm import VM
from .block import Block, Header, Metadata, transactions_root
from .committee import Committee, MIN_VALIDATOR_STAKE
from .puzzle import Puzzle, Solution
from . import target as T
from . import rewards as RW

R = P.R
GENESIS_TIMESTAMP = 1725462000  # MainnetV0 (console/network/src/mainnet_v0.rs)
# TestnetV0/CanaryV0 swap these via console.networks (test_networks.py)
MAX_SOLUTIONS = 1 << T.MAX_SOLUTIONS_AS_POWER_OF_TWO
BLOCK_TREE_DEPTH = 32


@dataclass(frozen=True)
class Ratify:
    """ledger/block/src/ratify: Genesis / BlockReward / PuzzleReward."""
    kind: str      # "genesis" | "block_reward" | "puzzle_reward"
    amount: int = 0


def solutions_accumulator(solutions) -> int:
    """PuzzleSolutions::to_accumulator_point (solutions/mod.rs:69):
    hash_psd8 over solution ids as fields, zero-padded to MAX_SOLUTIONS."""
    if not solutions:
        return 0
    preimage = [s.partial.id for s in solutions]
    preimage += [0] * (MAX_SOLUTIONS - len(preimage))
    return N.hash_psd(8, preimage)


def ratifications_root(ratifies) -> int:
    """Merkle-style digest over the ratification list (BHP over the
    serialized kinds/amounts; structural analog of to_ratifications_root)."""
    bits = []
    for r in ratifies:
        kind_id = {"genesis": 0, "block_reward": 1, "puzzle_reward": 2}[r.kind]
        bits += int_to_bits_le(kind_id, 8) + int_to_bits_le(r.amount, 64)
    return N.hash_bhp(1024, bits) if bits else 0


class Ledger:
    def __init__(self, validator_keys, rng, public_balances=None,
                 store_path: str | None = None, _resume: bool = False,
                 srs="dev"):
        """validator_keys: >=3 console PrivateKeys forming the genesis
        committee (each bonded at MIN_VALIDATOR_STAKE). store_path: SQLite
        file for the persistent finalize + block stores. Use Ledger.load
        to resume from an existing store (SURVEY §5.4: the ledger IS the
        checkpoint).

        srs: the proof posture. DEFAULT 'dev' is PROOF-CARRYING (the
        reference has no proof-less mode, vm/verify.rs:70): a
        process-cached dev SRS is built lazily and check_next_block
        re-verifies every transaction's Varuna proofs
        (check_next_block.rs -> VM::check_transactions). Pass a real
        UniversalSRS/LoadedSRS for production parameters, or srs=None to
        EXPLICITLY opt out (unit-test/dev-only shortcut)."""
        if srs == "dev":
            from ..polycommit import kzg
            srs = kzg.dev_srs()
        self.vm = VM(rng, store_path=store_path, srs=srs)
        from .query import Query
        self.vm.query = Query(self)
        self.rng = rng
        self.puzzle = Puzzle()
        self.history = None   # History instance => per-block staking dumps
        self.block_store = None
        if store_path is not None:
            from .store_db import BlockStore
            self.block_store = BlockStore(store_path)
        members = {}
        self.validator_addresses = []
        for key in validator_keys:
            addr = key.to_address()
            members[addr[0]] = (MIN_VALIDATOR_STAKE, True, 0)
            self.validator_addresses.append(addr)
        self.committee = Committee.new_genesis(members)
        # stakers: validator self-bonds only at genesis (bonded map analog)
        self.stakers = {ax: (ax, stake) for ax, (stake, _, _) in members.items()}

        # Genesis ratification: seed public balances into credits.aleo
        # (skipped on resume: the persisted finalize store already holds
        # the post-block balances)
        if not _resume:
            for addr, amount in (public_balances or {}).items():
                self._credit_account(addr, amount)

        from ..console import networks as NETS
        spec = NETS.current()
        md = Metadata(
            network=spec.id, round=0, height=0,
            cumulative_weight=0, cumulative_proof_target=0,
            coinbase_target=spec.genesis_coinbase_target,
            proof_target=spec.genesis_proof_target,
            last_coinbase_target=spec.genesis_coinbase_target,
            last_coinbase_timestamp=spec.genesis_timestamp,
            timestamp=spec.genesis_timestamp,
        )
        ratifies = [Ratify("genesis")]
        header = Header(
            previous_state_root=0,
            transactions_root=transactions_root([]),
            finalize_root=0,
            ratifications_root=ratifications_root(ratifies),
            solutions_root=0, subdag_root=0, metadata=md,
        )
        genesis = Block(previous_hash=0, header=header, transactions=[],
                        aborted_transaction_ids=[])
        genesis.ratifications = ratifies
        genesis.solutions = []
        self.blocks = [genesis]
        if self.block_store is not None and not _resume \
                and self.block_store.max_height() is None:
            self.block_store.put_block(0, genesis)
            self.block_store.put_meta("committee", self._committee_digest())
        self._state_roots = [self._compute_state_root()]
        # record bookkeeping (check_next_block.rs:COMMITMENT/SERIAL checks)
        self.spent_serial_numbers = set()
        self.commitments = {}    # commitment -> (height, tx_index, transition_index)

    # ---- accessors (ledger/src/get.rs / latest.rs) ----
    @property
    def latest_block(self) -> Block:
        return self.blocks[-1]

    @property
    def latest_height(self) -> int:
        return self.latest_block.header.metadata.height

    @property
    def latest_round(self) -> int:
        return self.latest_block.header.metadata.round

    @property
    def latest_state_root(self) -> int:
        return self._state_roots[-1]

    def latest_epoch_hash(self) -> int:
        """Block hash at the epoch starting height (ledger/src/lib.rs:
        latest_epoch_hash -> height - height % NUM_BLOCKS_PER_EPOCH)."""
        h = self.latest_height
        return self.blocks[h - h % T.NUM_BLOCKS_PER_EPOCH].hash()

    @property
    def latest_proof_target(self) -> int:
        return self.latest_block.header.metadata.proof_target

    def get_block(self, height: int) -> Block:
        return self.blocks[height]

    # ---- block production ----
    def prepare_advance_to_next_beacon_block(self, candidate_transactions,
                                             candidate_solutions=(),
                                             timestamp=None) -> Block:
        """advance.rs:64 (beacon mode: no subdag)."""
        return self._construct_block_template(None, candidate_transactions,
                                              candidate_solutions, timestamp)

    def prepare_advance_to_next_quorum_block(self, subdag,
                                             candidate_transactions,
                                             candidate_solutions=()) -> Block:
        """advance.rs:32 — block from a committed Narwhal subdag: round =
        anchor round, timestamp = stake-weighted median of the previous
        round's certificates, subdag root in the header."""
        if not subdag.validate(self.committee):
            raise ValueError("invalid subdag for the current committee")
        block = self._construct_block_template(
            subdag, candidate_transactions, candidate_solutions,
            subdag.timestamp(self.committee))
        return block

    def _construct_block_template(self, subdag, candidate_transactions,
                                  candidate_solutions=(),
                                  timestamp=None) -> Block:
        """advance.rs:261 construct_block_template.
        candidate_transactions: list of PendingTransaction."""
        prev = self.latest_block
        pm = prev.header.metadata
        next_height = pm.height + 1
        next_round = subdag.anchor_round() if subdag is not None else pm.round + 1
        next_timestamp = timestamp if timestamp is not None else pm.timestamp + T.BLOCK_TIME

        # solutions: validate against the PREVIOUS epoch hash + proof target
        epoch_hash = self.latest_epoch_hash()
        valid, aborted_sols = [], []
        for sol in candidate_solutions:
            ok = (len(valid) < MAX_SOLUTIONS
                  and self.puzzle.check_solution(sol, epoch_hash, pm.proof_target))
            (valid if ok else aborted_sols).append(sol)
        combined = sum(s.target for s in valid)
        solutions_root = solutions_accumulator(valid)

        (next_coinbase_target, next_proof_target, next_cumulative_proof_target,
         next_cumulative_weight, next_last_coinbase_target,
         next_last_coinbase_timestamp) = T.to_next_targets(
            pm.cumulative_proof_target, combined, pm.coinbase_target,
            pm.cumulative_weight, pm.last_coinbase_target,
            pm.last_coinbase_timestamp, next_timestamp)

        coinbase_reward = T.coinbase_reward(
            next_height, T.STARTING_SUPPLY, T.ANCHOR_HEIGHT, T.BLOCK_TIME,
            combined, pm.cumulative_proof_target, pm.coinbase_target)
        block_reward = T.block_reward(T.STARTING_SUPPLY, T.BLOCK_TIME,
                                      coinbase_reward, 0)
        puzzle_reward = T.puzzle_reward(coinbase_reward)
        ratifies = [Ratify("block_reward", block_reward),
                    Ratify("puzzle_reward", puzzle_reward)]

        state = F.FinalizeGlobalState.new(
            next_round, next_height, next_cumulative_weight,
            next_cumulative_proof_target, prev.hash())
        accepted, rejected, aborted = self.vm.speculate(candidate_transactions, state)
        self.vm.abort_speculation()  # dry run — advance commits for real

        from ..console import networks as NETS
        md = Metadata(
            network=NETS.current().id, round=next_round, height=next_height,
            cumulative_weight=next_cumulative_weight,
            cumulative_proof_target=next_cumulative_proof_target,
            coinbase_target=next_coinbase_target,
            proof_target=next_proof_target,
            last_coinbase_target=next_last_coinbase_target,
            last_coinbase_timestamp=next_last_coinbase_timestamp,
            timestamp=next_timestamp,
        )
        # confirmed list in speculation order: accepted txs in full,
        # rejected txs as fee-only (fee charged; finalize.rs Rejected)
        from .block import ConfirmedTransaction, fee_only_transaction
        confirmed = []
        txs = []
        for i, p in enumerate(candidate_transactions):
            if i in accepted:
                tx = p.transaction
                variant = ("accepted_deploy" if tx.kind == "deploy"
                           else "accepted_execute")
                confirmed.append(ConfirmedTransaction(
                    variant, len(txs), tx))
                txs.append(tx)
            elif i in rejected:
                orig = p.transaction
                fee_tx = fee_only_transaction(orig)
                variant = ("rejected_deploy" if orig.kind == "deploy"
                           else "rejected_execute")
                confirmed.append(ConfirmedTransaction(
                    variant, len(txs), fee_tx, rejected=orig))
                txs.append(fee_tx)
        header = Header(
            previous_state_root=self.latest_state_root,
            transactions_root=transactions_root(txs),
            finalize_root=0,
            ratifications_root=ratifications_root(ratifies),
            solutions_root=solutions_root,
            subdag_root=subdag.to_subdag_root() if subdag is not None else 0,
            metadata=md,
        )
        block = Block(previous_hash=prev.hash(), header=header,
                      transactions=txs,
                      aborted_transaction_ids=[
                          candidate_transactions[i].transaction.id()
                          for i in aborted])
        block.confirmed = confirmed
        block.ratifications = ratifies
        block.solutions = list(valid)
        # over-limit / stale solutions are listed, not silently dropped
        # (Block.aborted_solution_ids, block/src/lib.rs:78-83)
        block.aborted_solution_ids = [s.partial.id for s in aborted_sols]
        block.subdag = subdag
        block._pending = list(candidate_transactions)
        return block

    # ---- validation (check_next_block.rs + block/verify.rs) ----
    def check_next_block(self, block: Block, pending=None) -> None:
        """Raises ValueError on the first failed check."""
        prev = self.latest_block
        pm = prev.header.metadata
        md = block.header.metadata
        if block.previous_hash != prev.hash():
            raise ValueError("previous block hash mismatch")
        if any(b.hash() == block.hash() for b in self.blocks):
            raise ValueError("block hash already exists")
        if md.height != pm.height + 1:
            raise ValueError("invalid next height")
        subdag = getattr(block, "subdag", None)
        if subdag is not None:
            if not subdag.validate(self.committee):
                raise ValueError("invalid subdag")
            if md.round != subdag.anchor_round() or md.round < pm.round + 1:
                raise ValueError("invalid quorum round")
            if block.header.subdag_root != subdag.to_subdag_root():
                raise ValueError("subdag root mismatch")
        elif md.round != pm.round + 1:
            raise ValueError("invalid next round")
        if md.network != pm.network:
            raise ValueError("network mismatch")
        if md.timestamp <= pm.timestamp:
            raise ValueError("timestamp must advance")
        if block.header.previous_state_root != self.latest_state_root:
            raise ValueError("previous state root mismatch")

        # solutions
        solutions = getattr(block, "solutions", [])
        if len(solutions) > MAX_SOLUTIONS:
            raise ValueError("too many solutions")
        epoch_hash = self.latest_epoch_hash()
        for sol in solutions:
            if not self.puzzle.check_solution(sol, epoch_hash, pm.proof_target):
                raise ValueError("invalid puzzle solution")
        if block.header.solutions_root != solutions_accumulator(solutions):
            raise ValueError("solutions root mismatch")
        combined = sum(s.target for s in solutions)

        # exact target recomputation
        expect = T.to_next_targets(
            pm.cumulative_proof_target, combined, pm.coinbase_target,
            pm.cumulative_weight, pm.last_coinbase_target,
            pm.last_coinbase_timestamp, md.timestamp)
        got = (md.coinbase_target, md.proof_target, md.cumulative_proof_target,
               md.cumulative_weight, md.last_coinbase_target,
               md.last_coinbase_timestamp)
        if got != expect:
            raise ValueError(f"target mismatch: {got} != {expect}")

        # reward ratifications
        coinbase_reward = T.coinbase_reward(
            md.height, T.STARTING_SUPPLY, T.ANCHOR_HEIGHT, T.BLOCK_TIME,
            combined, pm.cumulative_proof_target, pm.coinbase_target)
        expect_ratifies = [
            Ratify("block_reward", T.block_reward(T.STARTING_SUPPLY,
                                                  T.BLOCK_TIME,
                                                  coinbase_reward, 0)),
            Ratify("puzzle_reward", T.puzzle_reward(coinbase_reward)),
        ]
        ratifies = getattr(block, "ratifications", [])
        if ratifies != expect_ratifies:
            raise ValueError("ratifications mismatch")
        if block.header.ratifications_root != ratifications_root(ratifies):
            raise ValueError("ratifications root mismatch")

        # transactions
        if block.header.transactions_root != transactions_root(block.transactions):
            raise ValueError("transactions root mismatch")
        # execution/fee proof re-verification (check_next_block.rs →
        # VM::check_transactions: batched Varuna verify per transaction)
        if self.vm.srs is not None:
            for tx in block.transactions:
                # inclusion proofs are only sound against a state root THIS
                # ledger has produced (check_transaction_basic's
                # contains_state_root gate, ledger/src/check_transaction_basic.rs):
                # without it an attacker proves inclusion against a
                # fabricated one-block chain and spends a record that never
                # existed on-chain.
                has_record_inputs = any(
                    kind == "record" for t in tx.transitions
                    for kind, _ in t.inputs)
                if has_record_inputs and not self.contains_state_root(
                        getattr(tx, "global_state_root", None)):
                    raise ValueError("unknown global state root")
                self.vm._check_transaction_proofs(tx)
        # record double-spend / commitment uniqueness
        seen_sns = set()
        for tx in block.transactions:
            for t in tx.transitions:
                for kind, val in t.inputs:
                    if kind == "record":
                        if val in self.spent_serial_numbers or val in seen_sns:
                            raise ValueError("serial number already spent")
                        seen_sns.add(val)
                for kind, val in t.outputs:
                    if kind == "record" and val in self.commitments:
                        raise ValueError("commitment already exists")
        pending = pending if pending is not None else getattr(block, "_pending", None)
        if pending is not None:
            state = F.FinalizeGlobalState.new(
                md.round, md.height, md.cumulative_weight,
                md.cumulative_proof_target, prev.hash())
            accepted, rejected, _ = self.vm.speculate(pending, state)
            self.vm.abort_speculation()
            from .block import fee_only_transaction
            expect_ids = []
            for i, p in enumerate(pending):
                if i in accepted:
                    expect_ids.append(p.transaction.id())
                elif i in rejected:
                    expect_ids.append(fee_only_transaction(p.transaction).id())
            if expect_ids != [t.id() for t in block.transactions]:
                raise ValueError("speculation result mismatch")

    # ---- advance (advance.rs:96) ----
    def advance_to_next_block(self, block: Block, pending=None) -> None:
        self.check_next_block(block, pending)
        md = block.header.metadata
        pending = pending if pending is not None else getattr(block, "_pending", [])
        from .block import fee_only_transaction
        accepted_map = {p.transaction.id(): p for p in pending}
        for p in list(pending):
            try:
                accepted_map[fee_only_transaction(p.transaction).id()] = p
            except AssertionError:
                pass    # feeless tx: only its full id can match
        to_run = [accepted_map[t.id()] for t in block.transactions
                  if t.id() in accepted_map]
        if to_run:
            state = F.FinalizeGlobalState.new(
                md.round, md.height, md.cumulative_weight,
                md.cumulative_proof_target, block.previous_hash)
            self.vm.speculate(to_run, state)
            self.vm.finalize()

        self._apply_block_caches(block, replay=False)
        if self.block_store is not None:
            self.block_store.put_block(md.height, block)
        if self.history is not None:   # `history` feature analog
            self.history.store_block_mappings(md.height, self.vm.store)


    def _apply_block_caches(self, block: Block, replay: bool) -> None:
        """In-memory bookkeeping for an accepted block. replay=True skips
        finalize-store writes (they are already persisted) — used by
        Ledger.load when restoring from the block store."""
        md = block.header.metadata
        for r in getattr(block, "ratifications", []):
            if r.kind == "block_reward":
                self.stakers = RW.staking_rewards(self.stakers, self.committee,
                                                  r.amount)
                members = {ax: (self.stakers[ax][1], o, c)
                           for ax, (_, o, c) in self.committee.members.items()}
                self.committee = Committee(self.committee.starting_round, members)
            elif r.kind == "puzzle_reward" and not replay:
                targets = [(s.partial.address_x, s.target)
                           for s in getattr(block, "solutions", [])]
                for addr_x, amount in RW.proving_rewards(targets, r.amount).items():
                    self._credit_account_x(addr_x, amount)
        for ti, tx in enumerate(block.transactions):
            for tri, t in enumerate(tx.transitions):
                for kind, val in t.inputs:
                    if kind == "record":
                        self.spent_serial_numbers.add(val)
                for kind, val in t.outputs:
                    if kind == "record":
                        self.commitments[val] = (md.height, ti, tri)
        self.blocks.append(block)
        self.vm.block_height = md.height
        self.vm.blocks = self.blocks
        self.vm.previous_hash = block.hash()
        self._state_roots.append(self._compute_state_root())

    # ---- get / find / contains / iterators ----------------------------
    # (ledger/src/{get,find,contains,iterators}.rs accessor surface)

    def get_block_by_hash(self, block_hash: int) -> Block:
        for b in self.blocks:
            if b.hash() == block_hash:
                return b
        raise KeyError(f"block hash {block_hash} not found")

    def get_transaction(self, tx_id: int):
        for b in self.blocks:
            for tx in b.transactions:
                if tx.id() == tx_id:
                    return tx
        raise KeyError(f"transaction {tx_id} not found")

    def get_transition(self, transition_id: int):
        for b in self.blocks:
            for tx in b.transactions:
                for t in tx.transitions:
                    if t.id() == transition_id:
                        return t
        raise KeyError(f"transition {transition_id} not found")

    def get_program(self, program_id: str):
        return self.vm.process.get_stack(program_id).program

    def find_block_height_from_hash(self, block_hash: int) -> int:
        return self.get_block_by_hash(block_hash).header.metadata.height

    def find_block_height_from_state_root(self, state_root: int) -> int:
        for h, r in enumerate(self._state_roots):
            if r == state_root:
                return h
        raise KeyError(f"state root {state_root} not found")

    def find_transaction_id_from_transition_id(self, transition_id: int):
        for b in self.blocks:
            for tx in b.transactions:
                if any(t.id() == transition_id for t in tx.transitions):
                    return tx.id()
        raise KeyError(f"transition {transition_id} not found")

    def contains_block_height(self, height: int) -> bool:
        return 0 <= height < len(self.blocks)

    def contains_block_hash(self, block_hash: int) -> bool:
        return any(b.hash() == block_hash for b in self.blocks)

    def contains_state_root(self, state_root: int) -> bool:
        return state_root in self._state_roots

    def contains_transaction_id(self, tx_id: int) -> bool:
        return any(tx.id() == tx_id for b in self.blocks
                   for tx in b.transactions)

    def contains_serial_number(self, sn: int) -> bool:
        return sn in self.spent_serial_numbers

    def contains_commitment(self, commitment: int) -> bool:
        return commitment in self.commitments

    def contains_program_id(self, program_id: str) -> bool:
        return program_id in self.vm.process.stacks

    def transaction_ids(self):
        for b in self.blocks:
            for tx in b.transactions:
                yield tx.id()

    def serial_numbers(self):
        yield from self.spent_serial_numbers

    def commitments_iter(self):
        yield from self.commitments

    def program_ids(self):
        yield from self.vm.process.stacks

    @classmethod
    def load(cls, validator_keys, rng, store_path: str,
             public_balances=None, srs="dev") -> "Ledger":
        """Ledger::load (ledger/src/lib.rs:113): rebuild the in-memory
        caches from the persisted store + genesis. Finalize state comes
        straight from the SQLite store; blocks replay only their cache
        bookkeeping."""
        led = cls(validator_keys, rng, public_balances=public_balances,
                  store_path=store_path, _resume=True, srs=srs)
        want = led.block_store.get_meta("committee")
        if want is not None and want != led._committee_digest():
            raise ValueError("stored genesis committee does not match")
        stored = list(led.block_store.blocks())
        if stored:
            if stored[0].hash() != led.blocks[0].hash():
                raise ValueError("stored genesis block does not match")
            for block in stored[1:]:
                led._apply_block_caches(block, replay=True)
        return led

    def _committee_digest(self) -> bytes:
        import hashlib
        h = hashlib.sha256()
        for ax, (stake, is_open, c) in sorted(self.committee.members.items()):
            h.update(ax.to_bytes(32, "little"))
            h.update(stake.to_bytes(8, "little"))
        return h.digest()

    def scan(self, view_key: int):
        """Wallet scan (ledger/src/find.rs shape): decrypt every on-chain
        record ciphertext with the view key; returns the owned records as
        [(commitment, Record, height)]."""
        from ..console import network as N
        addr = N.g_scalar_multiply(view_key)
        found = []
        for block in self.blocks:
            h = block.header.metadata.height
            for tx in block.transactions:
                for t in tx.transitions:
                    for commitment, _checksum, enc in getattr(t, "output_records", []):
                        try:
                            dec = enc.decrypt(view_key)
                        except Exception:
                            continue
                        if dec.owner == addr:
                            found.append((commitment, dec, h))
        return found

    # ---- state root (BlockTree: BHP1024 Merkle over block hashes) ----
    def _compute_state_root(self) -> int:
        leaves = [int_to_bits_le(b.hash() % R, 253) for b in self.blocks]
        return MerkleTree(BLOCK_TREE_DEPTH, BHPHasher(1024), leaves).root

    # ---- credits.aleo account helpers ----
    def _credit_account(self, addr_str: str, amount: int):
        from ..synthesizer.finalize import _key_of
        acct = self.vm.store.mapping("credits.aleo", "account")
        key = _key_of(literal_from_str(addr_str))
        cur = acct.get_confirmed(key)
        bal = cur.value.value if cur is not None else 0
        acct.insert(key, Plaintext.literal("u64", min(bal + amount, RW.U64_MAX)))

    def _credit_account_x(self, addr_x: int, amount: int):
        from ..utils.encoding import bech32m_encode
        self._credit_account(
            bech32m_encode("aleo", addr_x.to_bytes(32, "little")), amount)

    def get_balance(self, addr_str: str):
        from ..synthesizer.finalize import _key_of
        acct = self.vm.store.mapping("credits.aleo", "account")
        v = acct.get_confirmed(_key_of(literal_from_str(addr_str)))
        return v.value.value if v is not None else None
