"""VM facade: Process (stacks) + FinalizeStore + speculate/finalize
(synthesizer/src/vm/mod.rs:78 behavioral mirror, host-side).

Deploys load programs into the process; execute builds transitions via
the Trace pipeline; speculate orders unconfirmed transactions, runs
their finalize futures atomically (rejecting halters), and finalize
commits — the atomic pipeline block production relies on
(vm/finalize.rs:35,157).
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..console.request import Request
from ..ledger.block import Transaction, Transition, Block, Header, Metadata, transactions_root
from ..ledger import target as T
from .program import parse_program, Program
from .process import Stack
from .interpreter import HaltError
from . import finalize as F
from . import execute as E


CREDITS_PATH = __file__.rsplit("/", 1)[0] + "/resources/credits.aleo"


class Process:
    """Map of stacks, one per program (process/src/lib.rs:78)."""

    def __init__(self):
        self.stacks = {}
        credits = parse_program(open(CREDITS_PATH).read())
        self.stacks[credits.id] = Stack(credits)

    def deploy(self, program_text: str) -> Program:
        prog = parse_program(program_text)
        if prog.id in self.stacks:
            raise HaltError(f"program {prog.id} already exists")
        self.stacks[prog.id] = Stack(prog, external=self.stacks)
        return prog

    def get_stack(self, program_id: str) -> Stack:
        if program_id not in self.stacks:
            raise HaltError(f"program {program_id} not found")
        return self.stacks[program_id]


def execution_id(transitions) -> int:
    """Execution::to_execution_id analog: digest over the transition ids
    (ledger/block/src/transaction/execution/mod.rs to_execution_id — the
    reference roots a Merkle tree; we BHP-hash the id chain)."""
    from ..console.types import int_to_bits_le
    from ..console import network as N
    from ..params import bls12_377 as P
    bits = []
    for t in transitions:
        bits += int_to_bits_le(t.id() % P.R, 253)
    return N.hash_bhp(1024, bits)


@dataclass
class PendingTransaction:
    transaction: Transaction
    futures: list      # [(program_id, finalize_name, args, transition_id)]
    outputs: list = field(default_factory=list)   # console output values


class VM:
    def __init__(self, rng=None, store_path: str | None = None, srs=None):
        """store_path: SQLite file for a persistent finalize store
        (ledger/store/src/helpers/rocksdb analog); default in-memory.

        srs: a kzg.UniversalSRS. When given, the VM is PROOF-CARRYING:
        execute() ends in Trace.prove_execution / prove_fee and
        check_transaction runs the batched Varuna verify against
        verifying keys the VM synthesizes (or takes from deployments)
        itself — the reference lifecycle (vm/execute.rs:27,
        vm/verify.rs:70, process/src/verify_execution.rs:22). With
        srs=None the VM runs in the proof-less dev mode."""
        self.process = Process()
        if store_path is not None:
            from ..ledger.store_db import DbNestedMap
            self.store = F.FinalizeStore(DbNestedMap(store_path))
        else:
            self.store = F.FinalizeStore()
        self.srs = srs
        # state-path source for record-input inclusion proofs
        # (ledger/query; set by Ledger to Query(self))
        self.query = None
        # (program, function) -> (pk, vk): Stack.proving_keys analog
        # (process/src/stack/mod.rs:186); also the verifier's trusted-vk
        # source — keys are synthesized from the program text, never
        # taken from a transaction
        self._key_cache = {}
        self.rng = rng or random.Random(0)
        self.block_height = 0
        self.blocks = []
        self.previous_hash = 0
        from .restrictions import Restrictions
        self.restrictions = Restrictions.load_mainnet()
        # on-chain record state (the block store's commitment/serial
        # indexes, A.3 TransitionOutputMap/TransitionInputMap analog)
        self.record_commitments = set()
        self.spent_serial_numbers = set()
        from collections import OrderedDict
        # LRU of transaction ids that already passed check_transaction
        # (vm/mod.rs:223 partially_verified_transactions)
        self._partially_verified = OrderedDict()
        self._PARTIAL_CACHE_SIZE = 1 << 15

    # ---- transaction construction ----
    def execute(self, private_key, program_id: str, function_name: str,
                inputs, input_types, priority_fee: int | None = None,
                _prove: bool = True) -> PendingTransaction:
        """Build an execute-transaction: sign request, run the function,
        collect transitions + finalize futures (vm/execute.rs shape; the
        Varuna proof attaches via Trace.prove_execution).

        priority_fee=None builds a feeless transaction (dev mode); any int
        (0 included) attaches a credits.aleo/fee_public transition paying
        execution_cost + priority_fee from the signer's public balance."""
        stack = self.process.get_stack(program_id)
        from .process import parse_plaintext_str
        from ..console.types import Plaintext, Literal
        from ..console.record import Record
        fn_decl = stack.program.functions[function_name]

        def parse_one(i, ftype):
            if not isinstance(i, str):
                return i
            if ftype.endswith(".record") or (i.lstrip().startswith("{")
                                             and "_nonce" in i):
                from ..console.record import record_from_str
                return record_from_str(i)
            return parse_plaintext_str(i)

        inputs = [parse_one(i, fi.value_type)
                  for i, fi in zip(inputs, fn_decl.inputs)]
        inputs = [Plaintext("literal", i) if isinstance(i, Literal) else i for i in inputs]
        # authorize: the root request + one CHILD request per external
        # function call in the call tree (process/src/authorize.rs:21);
        # record-ownership violations halt here, at signing
        auth = E.authorize(stack, private_key, function_name, inputs,
                           input_types, self.rng)
        # input records must exist on chain and be unspent (the reference
        # fails in Trace::prepare with "Commitment ... does not exist")
        for inp, fi in zip(inputs, fn_decl.inputs):
            if isinstance(inp, Record):
                rtype = fi.value_type.split(".")[0]
                com = inp.to_commitment(program_id, rtype)
                if com not in self.record_commitments:
                    raise HaltError(f"Commitment '{com}field' does not exist")
        req = auth.requests[0]
        signer = req.signer
        # wire transitions in POST-ORDER (children first), like the
        # reference's Execution (verify_execution.rs construct_call_graph)
        order = E.call_tree_order(self.process, auth)
        transitions = []
        root_outs, root_futs = [], []
        for i, parent_i in order:
            r, tps = auth.requests[i], auth.input_types[i]
            sub = self.process.get_stack(r.program_id)
            ppid = (auth.requests[parent_i].program_id
                    if parent_i is not None else None)
            t, outs_i, futs_i = self._console_transition(sub, r, tps, ppid)
            transitions.append(t)
            if parent_i is None:
                root_outs, root_futs = outs_i, futs_i
        tx = Transaction("execute", transitions)
        # only the ROOT transition's futures queue for finalize — child
        # futures run through the parent's `await` (finalize engine)
        root_tid = transitions[-1].id()
        futures = [(pid, fname, args, root_tid)
                   for pid, fname, args in root_futs]
        pending = PendingTransaction(tx, futures, outputs=list(root_outs))
        pending._proof_auths = [(stack, auth)]
        pending._fee_auths = []

        if priority_fee is not None:
            # attach a credits.aleo/fee_public transition covering the
            # execution cost (vm/execute.rs:execute_fee_raw shape)
            from . import cost as C
            if self.srs is not None and _prove:
                # the fee must sign the FINAL execution id AND cover the
                # FINAL cost — proving grafts in-circuit output IDs onto
                # the body transitions (changing ids and wire size) — so
                # it is built inside prove_transaction after the body
                # proof lands (vm/execute.rs fee-after-execution ordering)
                pending._deferred_fee = (private_key, None, priority_fee)
            else:
                base_fee, _ = C.execution_cost(self.process, tx.transitions)
                fee_pending = self._fee_public(private_key, base_fee,
                                               priority_fee,
                                               execution_id(tx.transitions))
                tx.transitions.append(fee_pending.transaction.transitions[0])
                tx.fee_amount = base_fee
                pending.futures.extend(fee_pending.futures)
                pending._fee_auths = list(getattr(fee_pending, "_proof_auths", []))
        if self.srs is not None and _prove:
            self.prove_transaction(pending)
        return pending

    def _console_transition(self, stack, req, types, parent_pid=None):
        """One wire transition from a signed request: console evaluation,
        output records, finalize futures. Children run with caller = the
        calling program's address (stack/call/mod.rs:49). Returns
        (transition, console outputs, futures)."""
        from ..console.record import Record
        from ..console import network as N
        fn = stack.program.functions[req.function_name]
        caller = (N.program_address(parent_pid) if parent_pid is not None
                  else req.signer)
        outs = stack.evaluate_function(req.function_name, list(req.inputs),
                                       signer=req.signer, caller=caller,
                                       tvk=req.tvk)
        futures, t_outputs, output_records = [], [], []
        for i, out in enumerate(outs):
            if getattr(out, "kind", None) == "future":
                pid, fname, args = out.value
                futures.append((pid, fname, args))
                t_outputs.append(("future", 0))
            elif isinstance(out, Record):
                # output record -> commitment + encrypted record + checksum
                # (response/mod.rs:139-169: randomizer = HashToScalar_psd2
                # ([tvk, output register locator]), checksum = BHP1024(ct))
                rtype = fn.outputs[i].value_type.split(".")[0]
                commitment = out.to_commitment(req.program_id, rtype)
                locator = int(fn.outputs[i].operand.split(".")[0][1:])
                randomizer = N.hash_to_scalar_psd(2, [req.tvk, locator])
                enc = out.encrypt(randomizer)
                checksum = N.hash_bhp(1024, enc.to_bits_le())
                output_records.append((commitment, checksum, enc))
                t_outputs.append(("record", commitment))
        t_inputs = []
        for iid in req.input_ids:
            if iid.kind == "record":
                t_inputs.append(("record", iid.fields[2]))   # serial number
            else:
                f0 = iid.fields[0]
                t_inputs.append((iid.kind,
                                 f0[0] if isinstance(f0, tuple) else f0))
        transition = Transition(
            program_id=req.program_id, function_name=req.function_name,
            inputs=t_inputs, outputs=t_outputs,
            tcm=req.tcm, scm=req.scm,
        )
        transition.output_records = output_records
        return transition, outs, futures

    def prove_transaction(self, pending: "PendingTransaction") -> None:
        """Trace::prove_execution + Trace::prove_fee (trace/mod.rs:151,179):
        replay each signed request through the FULL transition circuit
        (in-circuit Request::verify + body + Response::from_outputs),
        batch-prove, and graft the protocol-grade transition data (tpk +
        in-circuit input/output IDs) onto the wire transitions. The body
        and the fee get separate proofs, like the reference's
        Execution.proof / Fee.proof split."""
        tx = pending.transaction
        old_ids = {id(t): t.id() for t in tx.transitions}

        def _prove_jobs(jobs):
            # jobs: [(stack, Authorization)] — each authorization's call
            # tree replays through the recursive dual-execution driver
            if not jobs:
                return None
            trace = E.Trace()
            tts = []
            for stack, auth in jobs:
                tr = E.execute_authorization(stack, auth,
                                             verify_in_circuit=True)
                for tt in tr.traced:
                    trace.insert(tt)
                    tts.append(tt)
            if trace.inclusion_tasks:
                if self.query is None:
                    raise HaltError("record inputs require a ledger Query "
                                    "for inclusion proofs")
                trace.prepare(self.query)
                tx.global_state_root = self.query.current_state_root()
            proof, _ = trace.prove_execution(self.srs, self.rng,
                                             key_cache=self._key_cache)
            by_tcm = {t.transition.tcm: t.transition for t in tts}
            for t in tx.transitions:
                src = by_tcm.get(t.tcm)
                if src is not None:
                    t.tpk, t.inputs, t.outputs = src.tpk, src.inputs, src.outputs
                    t.input_tags = getattr(src, "input_tags", None)
                    if not getattr(t, "output_records", None):
                        t.output_records = getattr(src, "output_records", [])
            return proof

        tx.proof = _prove_jobs(getattr(pending, "_proof_auths", []))
        deferred = getattr(pending, "_deferred_fee", None)
        if deferred is not None:
            # body transition ids are final now — sign the fee over the
            # real execution id (verify_fee.rs binds
            # deployment_or_execution_id to the execution it pays for)
            pk_, base_fee, priority_fee = deferred
            if base_fee is None:
                from . import cost as C
                base_fee, _ = C.execution_cost(self.process, tx.transitions)
            fee_pending = self._fee_public(pk_, base_fee, priority_fee,
                                           execution_id(tx.transitions))
            fee_t = fee_pending.transaction.transitions[0]
            tx.transitions.append(fee_t)
            old_ids[id(fee_t)] = fee_t.id()
            tx.fee_amount = base_fee
            pending.futures.extend(fee_pending.futures)
            pending._fee_auths = list(getattr(fee_pending, "_proof_auths", []))
            pending._deferred_fee = None
        tx.fee_proof = _prove_jobs(getattr(pending, "_fee_auths", []))
        # transition ids changed (outputs now carry in-circuit IDs):
        # remap the finalize futures' transition-id column
        id_map = {old_ids[id(t)]: t.id() for t in tx.transitions}
        pending.futures = [(pid, fname, args, id_map.get(tid, tid))
                           for pid, fname, args, tid in pending.futures]

    def _function_vk(self, fkey):
        """Trusted verifying key for (program, function): cached from this
        VM's own synthesis or deployment certification — NEVER from a
        transaction (verify_execution.rs:22 uses the Stack's keys)."""
        if fkey in self._key_cache:
            return self._key_cache[fkey][1]
        if fkey == E.INCLUSION_KEY:
            # inclusion circuit keys need a (shape-fixed) state path; the
            # verifier synthesizes from any commitment its ledger knows
            if self.query is None:
                return None
            com = next(iter(self.record_commitments), None)
            if com is None:
                return None
            from ..circuit.inclusion_gadget import ledger_inclusion_assignment
            sp = self.query.get_state_path_for_commitment(com)
            # structure-only synthesis: index matrices don't depend on
            # witness satisfaction, so a placeholder gamma/sn is fine
            b = ledger_inclusion_assignment(sp, com, (0, 1), 0)
            from ..snark import varuna
            pk, vk = varuna.circuit_setup(self.srs, b.to_synthesizer())
            self._key_cache[fkey] = (pk, vk)
            return vk
        from . import deploy as D
        stack = self.process.get_stack(fkey[0])
        pk, vk = D.synthesize_protocol_keys(self.srs, stack, fkey[1], self.rng)
        self._key_cache[fkey] = (pk, vk)
        return vk

    @staticmethod
    def _split_fee(transitions):
        body, fee_ts = [], []
        for t in transitions:
            is_fee = (t.program_id == "credits.aleo"
                      and t.function_name.startswith("fee_"))
            (fee_ts if is_fee else body).append(t)
        return body, fee_ts

    def _check_transaction_proofs(self, tx) -> None:
        """Batched Varuna verification of a transaction's execution + fee
        proofs against reconstructed public inputs (vm/verify.rs:70 →
        process/src/verify_execution.rs:22 / verify_fee.rs:22). Raises
        ValueError on any failure."""
        from . import execute as E2
        body, fee_ts = self._split_fee(tx.transitions)
        if tx.kind == "execute" and body:
            if tx.proof is None:
                raise ValueError("execute transaction carries no proof")
            if not E2.verify_execution_transitions(
                    self.srs, body, self._function_vk, tx.proof,
                    global_state_root=tx.global_state_root,
                    process=self.process):
                raise ValueError("invalid execution proof")
        if fee_ts:
            if tx.fee_proof is None:
                raise ValueError("transaction carries no fee proof")
            if not E2.verify_execution_transitions(
                    self.srs, fee_ts, self._function_vk, tx.fee_proof,
                    global_state_root=tx.global_state_root):
                raise ValueError("invalid fee proof")
            self._check_fee_binding(tx)

    def _check_fee_binding(self, tx) -> None:
        """The fee transition's deployment_or_execution_id input must bind
        the body it pays for (verify_fee.rs: `fee.deployment_or_execution_id`
        comparison) — otherwise a fee could be detached from one transaction
        and reattached to another. The bound id rides the fee request's
        third PUBLIC input, whose input id is
        Psd8([function_id, fields(id), tcm, 2]) (request/sign: InputID
        for public inputs) — recomputable by any verifier from the wire
        transition. Raises ValueError on mismatch."""
        from ..console import network as N
        from ..console.request import compute_function_id
        from ..console.types import Plaintext, Literal
        body, fee_ts = self._split_fee(tx.transitions)
        if not fee_ts:
            return
        fee_t = fee_ts[0]
        if tx.kind == "execute":
            bind_id = execution_id(body)
        elif tx.kind == "deploy" and tx.payload is not None:
            bind_id = tx.payload.to_deployment_id()
        else:
            return
        fid = compute_function_id(N.ID, fee_t.program_id, fee_t.function_name)
        fields = Plaintext("literal", Literal("field", bind_id)).to_fields()
        expect = N.hash_psd(8, [fid] + fields + [fee_t.tcm, 2])
        if len(fee_t.inputs) < 3 or fee_t.inputs[2][1] != expect:
            raise ValueError("fee is not bound to this transaction's "
                             "deployment/execution id")

    def deploy_transaction(self, private_key, program_text: str, srs=None,
                           priority_fee: int | None = None,
                           rng=None) -> PendingTransaction:
        """Build a deploy-transaction (vm/deploy.rs shape): parse + check
        the program, synthesize per-function circuits with certificates
        (when an SRS is given), price it, and attach the fee transition.
        The program loads into the process when the transaction finalizes
        in a block (speculate accepts it)."""
        from .program import parse_program
        from .process import Stack
        from . import deploy as D
        from . import cost as C

        prog = parse_program(program_text)
        if prog.id in self.process.stacks:
            raise HaltError(f"program {prog.id} already exists")
        stack = Stack(prog, external=self.process.stacks)
        if srs is not None:
            deployment = D.deploy(srs, stack, rng or self.rng,
                                  program_text=program_text)
        else:
            deployment = D.Deployment(prog.id, program_text, [])
        # ProgramOwner: the deployer signs the deployment ID
        # (console/program owner; vm/deploy.rs attaches it to the tx)
        owner = D.ProgramOwner.new(private_key, deployment.to_deployment_id(),
                                   rng or self.rng)
        tx = Transaction("deploy", [], payload=deployment)
        tx.owner = owner
        pending = PendingTransaction(tx, [])
        pending.deployment = deployment
        if priority_fee is not None:
            base_fee, _ = C.deployment_cost(deployment)
            # the fee signs the deployment id (vm/deploy.rs binds
            # deployment_or_execution_id = deployment.to_deployment_id())
            fee_pending = self._fee_public(private_key, base_fee, priority_fee,
                                           deployment.to_deployment_id())
            tx.transitions.append(fee_pending.transaction.transitions[0])
            tx.fee_amount = base_fee
            pending.futures.extend(fee_pending.futures)
            pending._fee_auths = list(getattr(fee_pending, "_proof_auths", []))
            if self.srs is not None:
                self.prove_transaction(pending)
        return pending

    def _fee_public(self, private_key, base_fee: int, priority_fee: int,
                    deployment_or_execution_id: int) -> PendingTransaction:
        """Build the fee transition (credits.aleo/fee_public)."""
        return self.execute(
            private_key, "credits.aleo", "fee_public",
            [f"{base_fee}u64", f"{priority_fee}u64",
             f"{deployment_or_execution_id}field"],
            [("public", "u64"), ("public", "u64"), ("public", "field")],
            _prove=False)

    TRANSACTION_SPEND_LIMIT = 100_000_000   # console/network/src/lib.rs

    def check_transaction(self, pending: "PendingTransaction") -> None:
        """Fee sufficiency check (vm/verify.rs check_fee shape): the fee
        transition's base amount must cover the execution cost of the
        non-fee transitions. Also rejects restricted transitions
        (vm/verify.rs:305 restrictions gate) and over-limit spends
        (TRANSACTION_SPEND_LIMIT). Raises ValueError.

        Transactions that already passed are remembered in an LRU
        (vm/mod.rs:223 partially_verified_transactions), so block
        re-validation (check_next_block re-speculation) skips the
        expensive checks — restrictions are ALWAYS re-checked because
        they are height-dependent."""
        from . import cost as C
        if self.restrictions.contains_restricted_transitions(
                pending.transaction.transitions, self.block_height + 1):
            raise ValueError("transaction contains a restricted transition")
        txid = pending.transaction.id()
        if txid in self._partially_verified:
            self._partially_verified.move_to_end(txid)
            return
        if pending.transaction.kind == "deploy":
            owner = getattr(pending.transaction, "owner", None)
            deployment = getattr(pending, "deployment", None)
            if owner is not None and deployment is not None and \
                    not owner.verify(deployment.to_deployment_id()):
                raise ValueError("invalid program owner signature")
        body, fee_ts = self._split_fee(pending.transaction.transitions)
        if self.srs is not None:
            self._check_transaction_proofs(pending.transaction)
        else:
            # dev mode still enforces the fee<->body binding (cheap hashes)
            self._check_fee_binding(pending.transaction)
        required, _ = C.execution_cost(self.process, body) if body else (0, (0, 0))
        if pending.transaction.kind == "execute" and \
                required > self.TRANSACTION_SPEND_LIMIT:
            raise ValueError(
                f"execution cost {required} exceeds the transaction spend "
                f"limit {self.TRANSACTION_SPEND_LIMIT}")
        if not fee_ts:
            if required > 0:
                raise ValueError(f"transaction is missing a fee (requires {required})")
        else:
            amount = pending.transaction.fee_amount or 0
            if amount < required:
                raise ValueError(f"fee {amount} below required {required}")
        self._partially_verified[txid] = True
        if len(self._partially_verified) > self._PARTIAL_CACHE_SIZE:
            self._partially_verified.popitem(last=False)

    def execution_cost(self, pending: "PendingTransaction"):
        """(total, (storage, finalize)) for an execute transaction
        (process/src/cost.rs:29 execution_cost)."""
        from . import cost as C
        body = [t for t in pending.transaction.transitions
                if not (t.program_id == "credits.aleo"
                        and t.function_name.startswith("fee_"))]
        return C.execution_cost(self.process, body)

    def deployment_cost(self, deployment):
        from . import cost as C
        return C.deployment_cost(deployment)

    # ---- speculate / finalize (vm/finalize.rs) ----
    @staticmethod
    def _is_fee_future(fut) -> bool:
        pid, fname = fut[0], fut[1]
        return pid == "credits.aleo" and fname in ("fee_public", "fee_private")

    def speculate(self, pending, state: F.FinalizeGlobalState | None = None):
        """vm/finalize.rs atomic_speculate: per-tx checkpoint/rewind.

        Returns (accepted, rejected, aborted) index lists:
          * accepted — all finalize futures succeeded;
          * rejected — the BODY halted but the fee finalize succeeded, so
            the transaction enters the block as a fee-only
            ConfirmedTransaction::Rejected* and the fee IS charged
            (finalize.rs: Rejected new_execution/new_deployment);
          * aborted  — the tx can't even pay (fee finalize failed or no
            fee attached): excluded from the block entirely
            (Block.aborted_transaction_ids)."""
        state = state or F.FinalizeGlobalState(block_height=self.block_height + 1)
        # run ALL futures of one tx under one checkpoint
        self._staged_commitments = set()
        self._staged_serials = set()
        self.store.maps.start_atomic()
        accepted, rejected, aborted = [], [], []
        stacks = self.process.stacks
        pending_programs = {}   # programs visible to later txs in this batch
        for i, p in enumerate(pending):
            self.store.maps.atomic_checkpoint()
            try:
                deployment = getattr(p, "deployment", None)
                if deployment is not None:
                    from .program import parse_program
                    prog = parse_program(deployment.program_text)
                    if prog.id in stacks or prog.id in pending_programs:
                        raise HaltError(f"program {prog.id} already exists")
                    pending_programs[prog.id] = deployment
                for pid, fname, args, tid in p.futures:
                    F.execute_finalize(stacks[pid], fname, args, self.store, state, tid)
                accepted.append(i)
                self.store.maps.clear_latest_checkpoint()
                self._stage_records(p)
            except HaltError:
                self.store.maps.atomic_rewind()
                fee_futures = [f for f in p.futures if self._is_fee_future(f)]
                if not fee_futures:
                    aborted.append(i)
                    continue
                self.store.maps.atomic_checkpoint()
                try:
                    for pid, fname, args, tid in fee_futures:
                        F.execute_finalize(stacks[pid], fname, args,
                                           self.store, state, tid)
                    rejected.append(i)
                    self.store.maps.clear_latest_checkpoint()
                except HaltError:
                    self.store.maps.atomic_rewind()
                    aborted.append(i)
        self._pending_programs = pending_programs
        return accepted, rejected, aborted

    def _stage_records(self, p):
        for t in p.transaction.transitions:
            for com, _, _ in getattr(t, "output_records", []) or []:
                self._staged_commitments.add(com)
            for kind, val in t.inputs:
                if kind == "record":
                    self._staged_serials.add(val)

    def finalize(self):
        self.store.maps.finish_atomic()
        self.record_commitments |= getattr(self, "_staged_commitments", set())
        self.spent_serial_numbers |= getattr(self, "_staged_serials", set())
        self._staged_commitments = set()
        self._staged_serials = set()
        # load accepted deployments into the process (vm/finalize.rs:
        # atomic_finalize deploy branch)
        for pid, deployment in getattr(self, "_pending_programs", {}).items():
            if pid not in self.process.stacks:
                self.process.deploy(deployment.program_text)
        self._pending_programs = {}

    def abort_speculation(self):
        self.store.maps.abort_atomic()

    # ---- block production (ledger/src/advance.rs shape) ----
    def advance_to_next_block(self, pending, timestamp: int | None = None) -> Block:
        accepted, rejected, aborted = self.speculate(pending)
        self.finalize()
        from ..ledger.block import fee_only_transaction
        txs = []
        for i, p in enumerate(pending):
            if i in accepted:
                txs.append(p.transaction)
            elif i in rejected:
                txs.append(fee_only_transaction(p.transaction))
        self.block_height += 1
        prev = self.blocks[-1] if self.blocks else None
        md = Metadata(
            height=self.block_height,
            round=self.block_height,
            timestamp=timestamp or (prev.header.metadata.timestamp + T.BLOCK_TIME if prev else 1),
        )
        header = Header(
            previous_state_root=self.previous_hash or 1,
            transactions_root=transactions_root(txs),
            finalize_root=1, ratifications_root=1, solutions_root=0, subdag_root=0,
            metadata=md,
        )
        block = Block(previous_hash=self.previous_hash, header=header, transactions=txs,
                      aborted_transaction_ids=[pending[i].transaction.id() for i in aborted])
        self.previous_hash = block.hash()
        self.blocks.append(block)
        return block

    def check_next_block(self, block: Block) -> bool:
        return block.verify_structure()
