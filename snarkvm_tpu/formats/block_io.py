"""Block object-graph wire format (ledger/block/src/**/bytes.rs).

Parses a full Block — header, authority, ratifications, solutions,
confirmed transactions (deploy/execute/fee with Varuna proofs), aborted
ID lists — into neutral dataclasses that re-serialize byte-exactly.

Layout references:
  Block          ledger/block/src/bytes.rs:18 (version 1)
  Header         header/bytes.rs (version + 6 roots + metadata)
  Metadata       header/metadata/bytes.rs
  Authority      ledger/authority/src/bytes.rs (0=Beacon sig, 1=Quorum subdag)
  Ratifications  ratifications/bytes.rs; Ratify ratify/bytes.rs
  Committee      ledger/committee/src/bytes.rs
  Solutions      solutions/bytes.rs
  ConfirmedTransaction transactions/confirmed/bytes.rs (variant,index,tx,[rejected],finalize ops)
  Transaction    transaction/bytes.rs (0=deploy,1=execute,2=fee)
  Deployment     transaction/deployment/bytes.rs (edition, program, (ident,vk,cert)*)
  Execution/Fee  transaction/execution/bytes.rs, fee/bytes.rs
  Transition     transition/bytes.rs + input/output variants
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .io import Reader, Writer
from . import program_io, varuna_io


# ---------------------------------------------------------------------------
# Plaintext values (console/program/src/data/plaintext/bytes.rs)
# ---------------------------------------------------------------------------

@dataclass
class Plaintext:
    kind: str                  # literal | struct | array
    value: object              # (type_name, v) | [(ident, Plaintext)] | [Plaintext]


def read_plaintext(r: Reader) -> Plaintext:
    variant = r.u8()
    if variant == 0:
        return Plaintext("literal", program_io.read_literal(r))
    if variant == 1:
        n = r.u8()
        members = []
        for _ in range(n):
            ident = r.ident()
            nb = r.u16()
            sub = Reader(r.read(nb))
            members.append((ident, read_plaintext(sub)))
        return Plaintext("struct", members)
    if variant == 2:
        n = r.u32()
        elems = []
        for _ in range(n):
            nb = r.u16()
            sub = Reader(r.read(nb))
            elems.append(read_plaintext(sub))
        return Plaintext("array", elems)
    raise ValueError(f"bad plaintext variant {variant}")


def write_plaintext(w: Writer, pt: Plaintext) -> None:
    if pt.kind == "literal":
        w.u8(0)
        name, v = pt.value
        program_io.write_literal(w, name, v)
    elif pt.kind == "struct":
        w.u8(1)
        w.u8(len(pt.value))
        for ident, sub in pt.value:
            w.ident(ident)
            sw = Writer()
            write_plaintext(sw, sub)
            b = sw.getvalue()
            w.u16(len(b))
            w.write(b)
    elif pt.kind == "array":
        w.u8(2)
        w.u32(len(pt.value))
        for sub in pt.value:
            sw = Writer()
            write_plaintext(sw, sub)
            b = sw.getvalue()
            w.u16(len(b))
            w.write(b)
    else:
        raise ValueError(pt.kind)


def plaintext_to_text(pt: Plaintext, indent: int = 0) -> str:
    if pt.kind == "literal":
        name, v = pt.value
        return program_io.literal_text(name, v)
    if pt.kind == "struct":
        inner = ", ".join(f"{k}: {plaintext_to_text(v)}" for k, v in pt.value)
        return "{ " + inner + " }"
    inner = ", ".join(plaintext_to_text(v) for v in pt.value)
    return "[" + inner + "]"


# Future (console/program/src/data/future/bytes.rs); arguments are
# Argument enum: 0=Plaintext, 1=Future (argument/bytes.rs).

@dataclass
class FutureVal:
    program_id: str
    function_name: str
    arguments: list            # ("plaintext", Plaintext) | ("future", FutureVal)


def read_future(r: Reader) -> FutureVal:
    name = r.ident()
    network = r.ident()
    function_name = r.ident()
    n = r.u8()
    args = []
    for _ in range(n):
        nb = r.u16()
        sub = Reader(r.read(nb))
        av = sub.u8()
        if av == 0:
            args.append(("plaintext", read_plaintext(sub)))
        elif av == 1:
            args.append(("future", read_future(sub)))
        else:
            raise ValueError(f"bad future argument variant {av}")
    return FutureVal(f"{name}.{network}", function_name, args)


def write_future(w: Writer, fut: FutureVal) -> None:
    name, network = fut.program_id.rsplit(".", 1)
    w.ident(name)
    w.ident(network)
    w.ident(fut.function_name)
    w.u8(len(fut.arguments))
    for kind, val in fut.arguments:
        sw = Writer()
        if kind == "plaintext":
            sw.u8(0)
            write_plaintext(sw, val)
        else:
            sw.u8(1)
            write_future(sw, val)
        b = sw.getvalue()
        w.u16(len(b))
        w.write(b)


# Record<Ciphertext> (console/program/src/data/record/bytes.rs) — the
# encrypted record attached to Record outputs.

@dataclass
class RecordCiphertext:
    owner_variant: int         # Owner::<Ciphertext> variant byte
    owner: object              # group x (public) or [field] ciphertext
    entries: list              # (ident, entry_variant, payload)
    nonce: int


def _read_ciphertext(r: Reader) -> list:
    n = r.u16()
    return [r.field() for _ in range(n)]


def _write_ciphertext(w: Writer, fields: list) -> None:
    w.u16(len(fields))
    for f in fields:
        w.field(f)


def read_record_ciphertext(r: Reader) -> RecordCiphertext:
    ov = r.u8()
    if ov == 0:    # public owner: plain address
        owner = r.group()
    elif ov == 1:  # private owner: ciphertext
        owner = _read_ciphertext(r)
    else:
        raise ValueError(f"bad record owner variant {ov}")
    n = r.u8()
    entries = []
    for _ in range(n):
        ident = r.ident()
        nb = r.u16()
        sub = Reader(r.read(nb))
        ev = sub.u8()
        if ev in (0, 1):   # constant/public: Plaintext
            payload = read_plaintext(sub)
        elif ev == 2:      # private: Ciphertext
            payload = _read_ciphertext(sub)
        else:
            raise ValueError(f"bad record entry variant {ev}")
        entries.append((ident, ev, payload))
    nonce = r.group()
    return RecordCiphertext(ov, owner, entries, nonce)


def write_record_ciphertext(w: Writer, rec: RecordCiphertext) -> None:
    w.u8(rec.owner_variant)
    if rec.owner_variant == 0:
        w.group(rec.owner)
    else:
        _write_ciphertext(w, rec.owner)
    w.u8(len(rec.entries))
    for ident, ev, payload in rec.entries:
        w.ident(ident)
        sw = Writer()
        sw.u8(ev)
        if ev in (0, 1):
            write_plaintext(sw, payload)
        else:
            _write_ciphertext(sw, payload)
        b = sw.getvalue()
        w.u16(len(b))
        w.write(b)
    w.group(rec.nonce)


# ---------------------------------------------------------------------------
# Transition inputs/outputs
# ---------------------------------------------------------------------------

@dataclass
class TransitionInput:
    variant: int               # 0 constant, 1 public, 2 private, 3 record, 4 external
    id: int                    # hash / serial number / commitment (field)
    payload: object = None     # Plaintext | [field] ciphertext | tag (record)


@dataclass
class TransitionOutput:
    variant: int               # 0..2 as inputs, 3 record, 4 external, 5 future
    id: int                    # hash / commitment
    payload: object = None     # Plaintext | ciphertext | (checksum, RecordCiphertext|None) | FutureVal
    checksum: int | None = None


def read_transition_input(r: Reader) -> TransitionInput:
    variant = r.u8()
    if variant in (0, 1):
        h = r.field()
        payload = read_plaintext(r) if r.boolean() else None
        return TransitionInput(variant, h, payload)
    if variant == 2:
        h = r.field()
        payload = _read_ciphertext(r) if r.boolean() else None
        return TransitionInput(variant, h, payload)
    if variant == 3:
        serial = r.field()
        tag = r.field()
        return TransitionInput(variant, serial, tag)
    if variant == 4:
        return TransitionInput(variant, r.field())
    raise ValueError(f"bad transition input variant {variant}")


def write_transition_input(w: Writer, inp: TransitionInput) -> None:
    w.u8(inp.variant)
    if inp.variant in (0, 1):
        w.field(inp.id)
        w.boolean(inp.payload is not None)
        if inp.payload is not None:
            write_plaintext(w, inp.payload)
    elif inp.variant == 2:
        w.field(inp.id)
        w.boolean(inp.payload is not None)
        if inp.payload is not None:
            _write_ciphertext(w, inp.payload)
    elif inp.variant == 3:
        w.field(inp.id)
        w.field(inp.payload)
    elif inp.variant == 4:
        w.field(inp.id)
    else:
        raise ValueError(inp.variant)


def read_transition_output(r: Reader) -> TransitionOutput:
    variant = r.u8()
    if variant in (0, 1):
        h = r.field()
        payload = read_plaintext(r) if r.boolean() else None
        return TransitionOutput(variant, h, payload)
    if variant == 2:
        h = r.field()
        payload = _read_ciphertext(r) if r.boolean() else None
        return TransitionOutput(variant, h, payload)
    if variant == 3:
        commitment = r.field()
        checksum = r.field()
        payload = read_record_ciphertext(r) if r.boolean() else None
        return TransitionOutput(variant, commitment, payload, checksum)
    if variant == 4:
        return TransitionOutput(variant, r.field())
    if variant == 5:
        h = r.field()
        payload = read_future(r) if r.boolean() else None
        return TransitionOutput(variant, h, payload)
    raise ValueError(f"bad transition output variant {variant}")


def write_transition_output(w: Writer, out: TransitionOutput) -> None:
    w.u8(out.variant)
    if out.variant in (0, 1):
        w.field(out.id)
        w.boolean(out.payload is not None)
        if out.payload is not None:
            write_plaintext(w, out.payload)
    elif out.variant == 2:
        w.field(out.id)
        w.boolean(out.payload is not None)
        if out.payload is not None:
            _write_ciphertext(w, out.payload)
    elif out.variant == 3:
        w.field(out.id)
        w.field(out.checksum)
        w.boolean(out.payload is not None)
        if out.payload is not None:
            write_record_ciphertext(w, out.payload)
    elif out.variant == 4:
        w.field(out.id)
    elif out.variant == 5:
        w.field(out.id)
        w.boolean(out.payload is not None)
        if out.payload is not None:
            write_future(w, out.payload)
    else:
        raise ValueError(out.variant)


# ---------------------------------------------------------------------------
# Transition / Execution / Fee / Deployment / Transaction
# ---------------------------------------------------------------------------

@dataclass
class Transition:
    id: int
    program_id: str
    function_name: str
    inputs: list
    outputs: list
    tpk: int
    tcm: int
    scm: int


def read_transition(r: Reader) -> Transition:
    r.version(1, "transition")
    tid = r.field()
    name = r.ident()
    network = r.ident()
    function_name = r.ident()
    inputs = [read_transition_input(r) for _ in range(r.u8())]
    outputs = [read_transition_output(r) for _ in range(r.u8())]
    tpk = r.group()
    tcm = r.field()
    scm = r.field()
    return Transition(tid, f"{name}.{network}", function_name, inputs, outputs,
                      tpk, tcm, scm)


def write_transition(w: Writer, t: Transition) -> None:
    w.u8(1)
    w.field(t.id)
    name, network = t.program_id.rsplit(".", 1)
    w.ident(name)
    w.ident(network)
    w.ident(t.function_name)
    w.u8(len(t.inputs))
    for inp in t.inputs:
        write_transition_input(w, inp)
    w.u8(len(t.outputs))
    for out in t.outputs:
        write_transition_output(w, out)
    w.group(t.tpk)
    w.field(t.tcm)
    w.field(t.scm)


@dataclass
class Execution:
    transitions: list
    global_state_root: int
    proof: object | None


def read_execution(r: Reader) -> Execution:
    r.version(1, "execution")
    n = r.u8()
    transitions = [read_transition(r) for _ in range(n)]
    gsr = r.field()
    pv = r.u8()
    if pv == 0:
        proof = None
    elif pv == 1:
        r.version(1, "proof")
        proof = varuna_io.read_proof(r)
    else:
        raise ValueError(f"bad proof variant {pv}")
    return Execution(transitions, gsr, proof)


def write_execution(w: Writer, e: Execution) -> None:
    w.u8(1)
    w.u8(len(e.transitions))
    for t in e.transitions:
        write_transition(w, t)
    w.field(e.global_state_root)
    if e.proof is None:
        w.u8(0)
    else:
        w.u8(1)
        w.u8(1)
        varuna_io.write_proof(w, e.proof)


@dataclass
class Fee:
    transition: Transition
    global_state_root: int
    proof: object | None


def read_fee(r: Reader) -> Fee:
    r.version(1, "fee")
    transition = read_transition(r)
    gsr = r.field()
    pv = r.u8()
    if pv == 0:
        proof = None
    elif pv == 1:
        r.version(1, "proof")
        proof = varuna_io.read_proof(r)
    else:
        raise ValueError(f"bad proof variant {pv}")
    return Fee(transition, gsr, proof)


def write_fee(w: Writer, f: Fee) -> None:
    w.u8(1)
    write_transition(w, f.transition)
    w.field(f.global_state_root)
    if f.proof is None:
        w.u8(0)
    else:
        w.u8(1)
        w.u8(1)
        varuna_io.write_proof(w, f.proof)


@dataclass
class Deployment:
    edition: int
    program: program_io.ProgramAst
    verifying_keys: list       # (ident, (vk, num_variables), certificate)


def read_deployment(r: Reader) -> Deployment:
    r.version(1, "deployment")
    edition = r.u16()
    program = program_io.read_program(r)
    n = r.u16()
    vks = []
    for _ in range(n):
        ident = r.ident()
        r.version(1, "verifying key")
        vk = varuna_io.read_circuit_vk(r)
        num_variables = r.u64()
        cert = varuna_io.read_certificate(r)
        vks.append((ident, (vk, num_variables), cert))
    return Deployment(edition, program, vks)


def write_deployment(w: Writer, d: Deployment) -> None:
    w.u8(1)
    w.u16(d.edition)
    program_io.write_program(w, d.program)
    w.u16(len(d.verifying_keys))
    for ident, (vk, num_variables), cert in d.verifying_keys:
        w.ident(ident)
        w.u8(1)
        varuna_io.write_circuit_vk(w, vk)
        w.u64(num_variables)
        varuna_io.write_certificate(w, cert)


@dataclass
class ProgramOwner:
    address: int
    signature: tuple           # (challenge, response, pk_sig, pr_sig)


def read_program_owner(r: Reader) -> ProgramOwner:
    r.version(1, "program owner")
    address = r.group()
    challenge = r.scalar()
    response = r.scalar()
    pk_sig = r.group()
    pr_sig = r.group()
    return ProgramOwner(address, (challenge, response, pk_sig, pr_sig))


def write_program_owner(w: Writer, o: ProgramOwner) -> None:
    w.u8(1)
    w.group(o.address)
    challenge, response, pk_sig, pr_sig = o.signature
    w.scalar(challenge)
    w.scalar(response)
    w.group(pk_sig)
    w.group(pr_sig)


@dataclass
class Transaction:
    variant: int               # 0 deploy, 1 execute, 2 fee
    id: int
    owner: ProgramOwner | None = None
    deployment: Deployment | None = None
    execution: Execution | None = None
    fee: Fee | None = None


def read_transaction(r: Reader) -> Transaction:
    r.version(1, "transaction")
    variant = r.u8()
    if variant == 0:
        tid = r.field()
        owner = read_program_owner(r)
        deployment = read_deployment(r)
        fee = read_fee(r)
        return Transaction(0, tid, owner=owner, deployment=deployment, fee=fee)
    if variant == 1:
        tid = r.field()
        execution = read_execution(r)
        fv = r.u8()
        fee = read_fee(r) if fv == 1 else None
        if fv > 1:
            raise ValueError(f"bad fee variant {fv}")
        return Transaction(1, tid, execution=execution, fee=fee)
    if variant == 2:
        tid = r.field()
        fee = read_fee(r)
        return Transaction(2, tid, fee=fee)
    raise ValueError(f"bad transaction variant {variant}")


def write_transaction(w: Writer, tx: Transaction) -> None:
    w.u8(1)
    w.u8(tx.variant)
    w.field(tx.id)
    if tx.variant == 0:
        write_program_owner(w, tx.owner)
        write_deployment(w, tx.deployment)
        write_fee(w, tx.fee)
    elif tx.variant == 1:
        write_execution(w, tx.execution)
        if tx.fee is None:
            w.u8(0)
        else:
            w.u8(1)
            write_fee(w, tx.fee)
    elif tx.variant == 2:
        write_fee(w, tx.fee)
    else:
        raise ValueError(tx.variant)


# ---------------------------------------------------------------------------
# Confirmed transactions + finalize operations
# ---------------------------------------------------------------------------

@dataclass
class FinalizeOperation:
    variant: int
    fields: tuple              # mapping_id [, key_id [, value_id]] / index


def read_finalize_operation(r: Reader) -> FinalizeOperation:
    variant = r.u8()
    if variant == 0:
        return FinalizeOperation(0, (r.field(),))
    if variant in (1, 2):
        return FinalizeOperation(variant, (r.field(), r.field(), r.field()))
    if variant == 3:
        return FinalizeOperation(3, (r.field(), r.field()))
    if variant == 4:
        return FinalizeOperation(4, (r.field(),))
    if variant == 5:
        return FinalizeOperation(5, (r.field(),))
    raise ValueError(f"bad finalize operation variant {variant}")


def write_finalize_operation(w: Writer, op: FinalizeOperation) -> None:
    w.u8(op.variant)
    for f in op.fields:
        w.field(f)


@dataclass
class Rejected:
    variant: int               # 0 deployment, 1 execution
    program_owner: ProgramOwner | None
    deployment: Deployment | None
    execution: Execution | None


def read_rejected(r: Reader) -> Rejected:
    variant = r.u8()
    if variant == 0:
        owner = read_program_owner(r)
        deployment = read_deployment(r)
        return Rejected(0, owner, deployment, None)
    if variant == 1:
        execution = read_execution(r)
        return Rejected(1, None, None, execution)
    raise ValueError(f"bad rejected variant {variant}")


def write_rejected(w: Writer, rej: Rejected) -> None:
    w.u8(rej.variant)
    if rej.variant == 0:
        write_program_owner(w, rej.program_owner)
        write_deployment(w, rej.deployment)
    else:
        write_execution(w, rej.execution)


@dataclass
class ConfirmedTransaction:
    variant: int               # 0 AcceptedDeploy, 1 AcceptedExecute, 2 RejectedDeploy, 3 RejectedExecute
    index: int
    transaction: Transaction
    rejected: Rejected | None
    finalize_ops: list


def read_confirmed_transaction(r: Reader) -> ConfirmedTransaction:
    variant = r.u8()
    if variant > 3:
        raise ValueError(f"bad confirmed tx variant {variant}")
    index = r.u32()
    tx = read_transaction(r)
    rejected = read_rejected(r) if variant in (2, 3) else None
    n = r.u16()
    ops = [read_finalize_operation(r) for _ in range(n)]
    return ConfirmedTransaction(variant, index, tx, rejected, ops)


def write_confirmed_transaction(w: Writer, ct: ConfirmedTransaction) -> None:
    w.u8(ct.variant)
    w.u32(ct.index)
    write_transaction(w, ct.transaction)
    if ct.rejected is not None:
        write_rejected(w, ct.rejected)
    w.u16(len(ct.finalize_ops))
    for op in ct.finalize_ops:
        write_finalize_operation(w, op)


# ---------------------------------------------------------------------------
# Ratifications / committee / solutions / authority
# ---------------------------------------------------------------------------

@dataclass
class Committee:
    id: int
    starting_round: int
    members: list              # (address, stake, is_open, commission)
    total_stake: int


def read_committee(r: Reader) -> Committee:
    r.version(1, "committee")
    cid = r.field()
    starting_round = r.u64()
    n = r.u16()
    members = []
    for _ in range(n):
        addr = r.group()
        stake = r.u64()
        is_open = r.boolean()
        commission = r.u8()
        members.append((addr, stake, is_open, commission))
    total_stake = r.u64()
    return Committee(cid, starting_round, members, total_stake)


def write_committee(w: Writer, c: Committee) -> None:
    w.u8(1)
    w.field(c.id)
    w.u64(c.starting_round)
    w.u16(len(c.members))
    for addr, stake, is_open, commission in c.members:
        w.group(addr)
        w.u64(stake)
        w.boolean(is_open)
        w.u8(commission)
    w.u64(c.total_stake)


@dataclass
class Ratify:
    variant: int               # 0 Genesis, 1 BlockReward, 2 PuzzleReward
    committee: Committee | None = None
    public_balances: list = field(default_factory=list)   # (address, amount)
    bonded_balances: list = field(default_factory=list)   # (addr, validator, withdrawal, amount)
    amount: int | None = None


def read_ratify(r: Reader) -> Ratify:
    r.version(1, "ratify")
    variant = r.u8()
    if variant == 0:
        committee = read_committee(r)
        pub = [(r.group(), r.u64()) for _ in range(r.u16())]
        bonded = [(r.group(), r.group(), r.group(), r.u64()) for _ in range(r.u16())]
        return Ratify(0, committee=committee, public_balances=pub, bonded_balances=bonded)
    if variant in (1, 2):
        return Ratify(variant, amount=r.u64())
    raise ValueError(f"bad ratify variant {variant}")


def write_ratify(w: Writer, rat: Ratify) -> None:
    w.u8(1)
    w.u8(rat.variant)
    if rat.variant == 0:
        write_committee(w, rat.committee)
        w.u16(len(rat.public_balances))
        for addr, amount in rat.public_balances:
            w.group(addr)
            w.u64(amount)
        w.u16(len(rat.bonded_balances))
        for addr, validator, withdrawal, amount in rat.bonded_balances:
            w.group(addr)
            w.group(validator)
            w.group(withdrawal)
            w.u64(amount)
    else:
        w.u64(rat.amount)


@dataclass
class Solution:
    epoch_hash: int
    address: int
    counter: int
    target: int


def read_solutions(r: Reader):
    """Solutions option (solutions/bytes.rs) + PuzzleSolutions map."""
    r.version(1, "solutions")
    variant = r.u8()
    if variant == 0:
        return None
    if variant != 1:
        raise ValueError(f"bad solutions variant {variant}")
    n = r.u8()
    out = []
    for _ in range(n):
        # Solution (puzzle/src/solution/bytes.rs): PartialSolution + target
        epoch_hash = r.field()
        address = r.group()
        counter = r.u64()
        target = r.u64()
        out.append(Solution(epoch_hash, address, counter, target))
    return out


def write_solutions(w: Writer, sols) -> None:
    w.u8(1)
    if sols is None:
        w.u8(0)
        return
    w.u8(1)
    w.u8(len(sols))
    for s in sols:
        w.field(s.epoch_hash)
        w.group(s.address)
        w.u64(s.counter)
        w.u64(s.target)


# ---------------------------------------------------------------------------
# Header / metadata / block
# ---------------------------------------------------------------------------

@dataclass
class Metadata:
    network: int
    round: int
    height: int
    cumulative_weight: int
    cumulative_proof_target: int
    coinbase_target: int
    proof_target: int
    last_coinbase_target: int
    last_coinbase_timestamp: int
    timestamp: int


def read_metadata(r: Reader) -> Metadata:
    r.version(1, "metadata")
    return Metadata(
        network=r.u16(), round=r.u64(), height=r.u32(),
        cumulative_weight=r.u128(), cumulative_proof_target=r.u128(),
        coinbase_target=r.u64(), proof_target=r.u64(),
        last_coinbase_target=r.u64(), last_coinbase_timestamp=r.i64(),
        timestamp=r.i64(),
    )


def write_metadata(w: Writer, m: Metadata) -> None:
    w.u8(1)
    w.u16(m.network)
    w.u64(m.round)
    w.u32(m.height)
    w.u128(m.cumulative_weight)
    w.u128(m.cumulative_proof_target)
    w.u64(m.coinbase_target)
    w.u64(m.proof_target)
    w.u64(m.last_coinbase_target)
    w.i64(m.last_coinbase_timestamp)
    w.i64(m.timestamp)


@dataclass
class Header:
    previous_state_root: int
    transactions_root: int
    finalize_root: int
    ratifications_root: int
    solutions_root: int
    subdag_root: int
    metadata: Metadata


def read_header(r: Reader) -> Header:
    r.version(1, "header")
    return Header(
        previous_state_root=r.field(),
        transactions_root=r.field(),
        finalize_root=r.field(),
        ratifications_root=r.field(),
        solutions_root=r.field(),
        subdag_root=r.field(),
        metadata=read_metadata(r),
    )


def write_header(w: Writer, h: Header) -> None:
    w.u8(1)
    w.field(h.previous_state_root)
    w.field(h.transactions_root)
    w.field(h.finalize_root)
    w.field(h.ratifications_root)
    w.field(h.solutions_root)
    w.field(h.subdag_root)
    write_metadata(w, h.metadata)


@dataclass
class Authority:
    variant: int               # 0 beacon, 1 quorum
    signature: tuple | None = None   # beacon: (challenge, response, pk_sig, pr_sig)
    subdag: object | None = None


def read_authority(r: Reader) -> Authority:
    variant = r.u8()
    if variant == 0:
        challenge = r.scalar()
        response = r.scalar()
        pk_sig = r.group()
        pr_sig = r.group()
        return Authority(0, signature=(challenge, response, pk_sig, pr_sig))
    if variant == 1:
        from .narwhal_io import read_subdag
        return Authority(1, subdag=read_subdag(r))
    raise ValueError(f"bad authority variant {variant}")


def write_authority(w: Writer, a: Authority) -> None:
    w.u8(a.variant)
    if a.variant == 0:
        challenge, response, pk_sig, pr_sig = a.signature
        w.scalar(challenge)
        w.scalar(response)
        w.group(pk_sig)
        w.group(pr_sig)
    else:
        from .narwhal_io import write_subdag
        write_subdag(w, a.subdag)


@dataclass
class Block:
    block_hash: int
    previous_hash: int
    header: Header
    authority: Authority
    ratifications: list
    solutions: list | None
    aborted_solution_ids: list
    transactions: list         # ConfirmedTransaction
    aborted_transaction_ids: list


def read_block(data: bytes) -> Block:
    r = Reader(data)
    r.version(1, "block")
    block_hash = r.field()
    previous_hash = r.field()
    header = read_header(r)
    authority = read_authority(r)
    r.version(1, "ratifications")
    ratifications = [read_ratify(r) for _ in range(r.u32())]
    solutions = read_solutions(r)
    aborted_solution_ids = [r.field() for _ in range(r.u32())]
    r.version(1, "transactions")
    transactions = [read_confirmed_transaction(r) for _ in range(r.u32())]
    aborted_transaction_ids = [r.field() for _ in range(r.u32())]
    if r.remaining():
        raise ValueError(f"{r.remaining()} trailing bytes after block")
    return Block(block_hash, previous_hash, header, authority, ratifications,
                 solutions, aborted_solution_ids, transactions,
                 aborted_transaction_ids)


def write_block(b: Block) -> bytes:
    w = Writer()
    w.u8(1)
    w.field(b.block_hash)
    w.field(b.previous_hash)
    write_header(w, b.header)
    write_authority(w, b.authority)
    w.u8(1)
    w.u32(len(b.ratifications))
    for rat in b.ratifications:
        write_ratify(w, rat)
    write_solutions(w, b.solutions)
    w.u32(len(b.aborted_solution_ids))
    for sid in b.aborted_solution_ids:
        w.field(sid)
    w.u8(1)
    w.u32(len(b.transactions))
    for ct in b.transactions:
        write_confirmed_transaction(w, ct)
    w.u32(len(b.aborted_transaction_ids))
    for tid in b.aborted_transaction_ids:
        w.field(tid)
    return w.getvalue()
