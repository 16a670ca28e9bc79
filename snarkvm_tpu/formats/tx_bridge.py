"""In-memory VM transactions -> wire format (ledger/block/src/transaction
bytes.rs shape via block_io). The VM's ledger.block.Transaction carries
(kind, id) input/output pairs + proofs; this bridge lifts them into the
TransitionInput/TransitionOutput enums and the Execution/Fee containers
so `snarkvm_tpu execute` (and any endpoint) can emit the byte form the
reference network exchanges. Optional payloads (plaintext values,
ciphertexts) are omitted — a valid wire choice (bytes.rs Options)."""
from __future__ import annotations

from . import block_io as B
from .io import Writer

_IN_VARIANT = {"constant": 0, "public": 1, "private": 2}
_OUT_VARIANT = {"constant": 0, "public": 1, "private": 2, "future": 5}


def wire_transition(t) -> "B.Transition":
    """ledger.block.Transition -> wire Transition."""
    inputs = []
    tags = getattr(t, "input_tags", None) or [None] * len(t.inputs)
    for (kind, v), tag in zip(t.inputs, tags):
        if kind == "record":
            if tag is None:
                raise ValueError("record input carries no tag")
            inputs.append(B.TransitionInput(3, v, tag))
        elif kind == "external_record":
            inputs.append(B.TransitionInput(4, v))
        else:
            inputs.append(B.TransitionInput(_IN_VARIANT[kind], v))
    outputs = []
    checksums = {com: cks
                 for com, cks, _ in getattr(t, "output_records", None) or []}
    for kind, v in t.outputs:
        if kind == "record":
            outputs.append(B.TransitionOutput(3, v, None, checksums.get(v)))
        elif kind == "external_record":
            outputs.append(B.TransitionOutput(4, v))
        else:
            outputs.append(B.TransitionOutput(_OUT_VARIANT[kind], v))
    if t.tpk is None:
        raise ValueError("transition carries no tpk (unproven)")
    return B.Transition(t.id(), t.program_id, t.function_name,
                        inputs, outputs, t.tpk[0], t.tcm, t.scm)


def wire_execute_transaction(tx) -> bytes:
    """An execute ledger.block.Transaction (with proofs) -> wire bytes."""
    body, fee_ts = [], []
    for t in tx.transitions:
        is_fee = (t.program_id == "credits.aleo"
                  and t.function_name.startswith("fee_"))
        (fee_ts if is_fee else body).append(t)
    execution = B.Execution([wire_transition(t) for t in body],
                            tx.global_state_root, tx.proof)
    fee = None
    if fee_ts:
        fee = B.Fee(wire_transition(fee_ts[0]), tx.global_state_root,
                    tx.fee_proof)
    wtx = B.Transaction(1, tx.id(), execution=execution, fee=fee)
    w = Writer()
    B.write_transaction(w, wtx)
    return w.getvalue()
