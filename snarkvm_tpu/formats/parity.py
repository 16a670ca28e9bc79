"""Semantic parity: recompute every ID/root/hash of a parsed block with our
own hashing stack and compare to the values carried in the wire bytes.

Derivations mirrored:
  transition ID    hash_bhp512(function_tree_root || tcm)   transition/mod.rs:84
  transition tree  depth-5 BHP over TransitionLeaf(version=1,index,variant,id)
                   transition/merkle.rs:67; leaf bits state_path/transition_leaf/to_bits.rs
  transaction ID   depth-5 BHP tree root over TransactionLeaf(variant,index,id)
                   transaction/merkle.rs (execution leaves variant=1, fee last;
                   deployment leaves variant=0 with id=hash_bhp1024(program_id||fn bytes))
  transactions root depth-20 tree over tx IDs                transactions/merkle.rs:61
  finalize root    depth-9 finalize IDs per tx + ratified id -> depth-20 tree
                   transactions/merkle.rs:20, confirmed/mod.rs:267
  ratifications root depth-16 over ratify IDs = hash_bhp1024(ratify bytes bits)
                   ratifications/merkle.rs:33, ratify/mod.rs:45
  committee ID     hash_bhp1024(round||n||members||total bits)  committee/src/to_id.rs:20
  header root      depth-3 over HeaderLeaf(index, field)        header/merkle.rs:67
  block hash       hash_bhp1024(previous_hash || header_root)   block/src/lib.rs:101
  beacon authority Schnorr verify over [block_hash]             block/src/verify.rs:202
"""
from __future__ import annotations

from .io import Writer
from . import block_io
from ..console import network as N
from ..console.merkle import MerkleTree, BHPHasher
from ..console.types import int_to_bits_le, bytes_to_bits_le

_BHP = BHPHasher(1024, 512)

TRANSITION_DEPTH = 5
TRANSACTION_DEPTH = 5
TRANSACTIONS_DEPTH = 20
FINALIZE_ID_DEPTH = TRANSACTION_DEPTH + 4
FINALIZE_OPERATIONS_DEPTH = TRANSACTIONS_DEPTH
RATIFICATIONS_DEPTH = 16
HEADER_DEPTH = 3


def _field_bits(v: int):
    return int_to_bits_le(v, 253)


def _u8_bits(v: int):
    return int_to_bits_le(v, 8)


def _u16_bits(v: int):
    return int_to_bits_le(v, 16)


# ---------------------------------------------------------------------------
# Transition
# ---------------------------------------------------------------------------

def transition_leaf_bits(index: int, variant: int, leaf_id: int):
    """(version=1 || index u8 || variant u8 || id field)."""
    return _u8_bits(1) + _u8_bits(index) + _u8_bits(variant) + _field_bits(leaf_id)


def transition_function_root(t: block_io.Transition) -> int:
    leaves = []
    for i, inp in enumerate(t.inputs):
        leaves.append(transition_leaf_bits(i, inp.variant, inp.id))
    base = len(t.inputs)
    for i, out in enumerate(t.outputs):
        leaves.append(transition_leaf_bits(base + i, out.variant, out.id))
    return MerkleTree(TRANSITION_DEPTH, _BHP, leaves).root


def transition_id(t: block_io.Transition) -> int:
    root = transition_function_root(t)
    return N.hash_bhp(512, _field_bits(root) + _field_bits(t.tcm))


# ---------------------------------------------------------------------------
# Transaction
# ---------------------------------------------------------------------------

def transaction_leaf_bits(variant: int, index: int, leaf_id: int):
    return _u8_bits(variant) + _u16_bits(index) + _field_bits(leaf_id)


def deployment_function_leaf_id(program_id: str, function_ast) -> int:
    """hash_bhp1024(to_bits_le![program.id(), function.to_bytes_le()])."""
    name, network = program_id.rsplit(".", 1)
    bits = []
    # ProgramID ToBits: name ident bits then network ident bits, each as the
    # ident's UTF-8 bytes' LE bits (console Identifier to_bits_le).
    bits += bytes_to_bits_le(name.encode())
    bits += bytes_to_bits_le(network.encode())
    bits += bytes_to_bits_le(function_ast.to_bytes())
    return N.hash_bhp(1024, bits)


def transaction_id(tx: block_io.Transaction) -> int:
    leaves = []
    if tx.variant == 0:   # deploy: function leaves variant=0, fee leaf last (variant=1)
        functions = tx.deployment.program.functions()
        for i, fn in enumerate(functions):
            leaves.append(transaction_leaf_bits(
                0, i, deployment_function_leaf_id(tx.deployment.program.id, fn)))
        leaves.append(transaction_leaf_bits(
            1, len(functions), transition_id(tx.fee.transition)))
    elif tx.variant == 1:  # execute
        for i, t in enumerate(tx.execution.transitions):
            leaves.append(transaction_leaf_bits(1, i, transition_id(t)))
        if tx.fee is not None:
            leaves.append(transaction_leaf_bits(
                1, len(tx.execution.transitions), transition_id(tx.fee.transition)))
    else:                  # fee
        leaves.append(transaction_leaf_bits(1, 0, transition_id(tx.fee.transition)))
    return MerkleTree(TRANSACTION_DEPTH, _BHP, leaves).root


# ---------------------------------------------------------------------------
# Block-level roots
# ---------------------------------------------------------------------------

def transactions_root(confirmed: list) -> int:
    leaves = [_field_bits(transaction_id(ct.transaction)) for ct in confirmed]
    return MerkleTree(TRANSACTIONS_DEPTH, _BHP, leaves).root


def finalize_operation_bits(op: block_io.FinalizeOperation):
    bits = _u8_bits(op.variant)
    for f in op.fields:
        bits += _field_bits(f)
    return bits


def confirmed_finalize_id(ct: block_io.ConfirmedTransaction) -> int:
    leaves = [finalize_operation_bits(op) for op in ct.finalize_ops]
    return MerkleTree(FINALIZE_ID_DEPTH, _BHP, leaves).root


def finalize_root(confirmed: list, ratified_finalize_operations=()) -> int:
    ratified_id = MerkleTree(
        FINALIZE_ID_DEPTH, _BHP,
        [finalize_operation_bits(op) for op in ratified_finalize_operations]).root
    leaves = [_field_bits(confirmed_finalize_id(ct)) for ct in confirmed]
    leaves.append(_field_bits(ratified_id))
    return MerkleTree(FINALIZE_OPERATIONS_DEPTH, _BHP, leaves).root


def _ident_bits(name: str):
    return bytes_to_bits_le(name.encode())


def _program_id_bits(program_id: str):
    name, network = program_id.rsplit(".", 1)
    return _ident_bits(name) + _ident_bits(network)


def mapping_id(program_id: str, mapping_name: str) -> int:
    """hash_bhp1024(program_id || false || mapping_name) — store finalize.rs:37."""
    return N.hash_bhp(1024, _program_id_bits(program_id) + [False] + _ident_bits(mapping_name))


def key_id(program_id: str, mapping_name: str, key_bits) -> int:
    return N.hash_bhp(1024, _program_id_bits(program_id) + [False]
                      + _ident_bits(mapping_name) + [False] + list(key_bits))


def value_id(kid: int, value_bits) -> int:
    vh = N.hash_bhp(1024, list(value_bits))
    return N.hash_bhp(1024, _field_bits(kid) + _field_bits(vh))


# Metadata mapping keys (vm/finalize.rs:1157,1169): the two reserved
# addresses tracking validator/delegator counts.
_NUM_VALIDATORS_KEY = "aleo1qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq3ljyzc"
_NUM_DELEGATORS_KEY = "aleo1qgqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqanmpl0"


def genesis_ratified_finalize_operations(rat: block_io.Ratify) -> list:
    """The 7 finalize operations of Ratify::Genesis (vm/finalize.rs:1136-1196):
    ReplaceMapping(committee/delegated/bonded/withdraw), two metadata
    UpdateKeyValue (validator/delegator counts), ReplaceMapping(account)."""
    from ..console.types import Plaintext, literal_from_str, Literal
    assert rat.variant == 0
    pid = "credits.aleo"
    ops = []
    for name in ("committee", "delegated", "bonded", "withdraw"):
        ops.append(block_io.FinalizeOperation(4, (mapping_id(pid, name),)))
    num_validators = len(rat.committee.members)
    num_delegators = max(len(rat.bonded_balances) - num_validators, 0)
    for key_addr, count in ((_NUM_VALIDATORS_KEY, num_validators),
                            (_NUM_DELEGATORS_KEY, num_delegators)):
        kb = Plaintext("literal", literal_from_str(key_addr)).to_bits_le()
        vb = Plaintext("literal", Literal("u32", count)).to_bits_le()
        kid = key_id(pid, "metadata", kb)
        ops.append(block_io.FinalizeOperation(2, (mapping_id(pid, "metadata"), kid,
                                                  value_id(kid, vb))))
    ops.append(block_io.FinalizeOperation(4, (mapping_id(pid, "account"),)))
    return ops


def ratify_id(rat: block_io.Ratify) -> int:
    w = Writer()
    block_io.write_ratify(w, rat)
    return N.hash_bhp(1024, bytes_to_bits_le(w.getvalue()))


def ratifications_root(ratifications: list) -> int:
    leaves = [_field_bits(ratify_id(r)) for r in ratifications]
    return MerkleTree(RATIFICATIONS_DEPTH, _BHP, leaves).root


def committee_id(c: block_io.Committee) -> int:
    w = Writer()
    w.u64(c.starting_round)
    w.u16(len(c.members))
    for addr, stake, is_open, commission in c.members:
        w.group(addr)
        w.u64(stake)
        w.boolean(is_open)
        w.u8(commission)
    w.u64(c.total_stake)
    return N.hash_bhp(1024, bytes_to_bits_le(w.getvalue()))


def metadata_hash(m: block_io.Metadata) -> int:
    bits = []
    bits += _u8_bits(0)  # leading version byte (metadata/to_bits.rs:22); 696 bits total
    bits += int_to_bits_le(m.network, 16)
    bits += int_to_bits_le(m.round, 64)
    bits += int_to_bits_le(m.height, 32)
    bits += int_to_bits_le(m.cumulative_weight, 128)
    bits += int_to_bits_le(m.cumulative_proof_target, 128)
    bits += int_to_bits_le(m.coinbase_target, 64)
    bits += int_to_bits_le(m.proof_target, 64)
    bits += int_to_bits_le(m.last_coinbase_target, 64)
    bits += int_to_bits_le(m.last_coinbase_timestamp % (1 << 64), 64)
    bits += int_to_bits_le(m.timestamp % (1 << 64), 64)
    return N.hash_bhp(1024, bits)


def header_root(h: block_io.Header) -> int:
    leaves = [
        _u8_bits(0) + _field_bits(h.previous_state_root),
        _u8_bits(1) + _field_bits(h.transactions_root),
        _u8_bits(2) + _field_bits(h.finalize_root),
        _u8_bits(3) + _field_bits(h.ratifications_root),
        _u8_bits(4) + _field_bits(h.solutions_root),
        _u8_bits(5) + _field_bits(h.subdag_root),
        _u8_bits(6) + _field_bits(0),
        _u8_bits(7) + _field_bits(metadata_hash(h.metadata)),
    ]
    return MerkleTree(HEADER_DEPTH, _BHP, leaves).root


def block_hash(previous_hash: int, hdr_root: int) -> int:
    return N.hash_bhp(1024, _field_bits(previous_hash) + _field_bits(hdr_root))


def verify_beacon_signature(blk: block_io.Block) -> bool:
    """Schnorr verify the beacon authority over [block_hash]."""
    from ..console import account as acct
    from ..console.types import _group_from_x
    challenge, response, pk_sig_x, pr_sig_x = blk.authority.signature
    pk_sig = _group_from_x(pk_sig_x)
    pr_sig = _group_from_x(pr_sig_x)
    sk_prf = N.hash_to_scalar_psd(4, [pk_sig[0], pr_sig[0]])
    ck = acct.ComputeKey(pk_sig, pr_sig, sk_prf)
    sig = acct.Signature(challenge, response, ck)
    address = ck.to_address()
    return sig.verify(address, [blk.block_hash])


def transition_verifier_inputs(t: block_io.Transition) -> list:
    """Public inputs for a transition proof (verify_execution.rs:165 /
    verify_fee.rs:185): [1, tpk_x, tpk_y, tcm, scm, input IDs (+record tags),
    is_root=1, parent_x, parent_y, output IDs (+record checksums)].

    Note: covers root transitions only — child transitions of multi-call
    executions additionally splice in caller context (call_graph handling).
    """
    from ..console.types import _group_from_x
    tpk = _group_from_x(t.tpk)
    parent = N.program_address(t.program_id)
    inputs = [1, tpk[0], tpk[1], t.tcm, t.scm]
    for inp in t.inputs:
        inputs.append(inp.id)
        if inp.variant == 3:      # record: (serial_number, tag)
            inputs.append(inp.payload)
    inputs += [1, parent[0], parent[1]]
    for out in t.outputs:
        inputs.append(out.id)
        if out.variant == 3:      # record output: (commitment, checksum)
            inputs.append(out.checksum)
    return inputs


def verify_single_transition_proof(srs, vk, transition, proof) -> bool:
    """Verify a 1-transition execution/fee proof against a verifying key."""
    from ..snark import varuna
    mode = varuna.VarunaHidingMode if proof.is_hiding() else varuna.VarunaNonHidingMode
    return varuna.verify_batch(srs, [(vk, [transition_verifier_inputs(transition)])],
                               proof, mode)


def check_block(blk: block_io.Block) -> dict:
    """Recompute everything; returns {check_name: bool}."""
    out = {}
    h = blk.header
    out["transactions_root"] = transactions_root(blk.transactions) == h.transactions_root
    ratified_ops = []
    for rat in blk.ratifications:
        if rat.variant == 0:
            ratified_ops.extend(genesis_ratified_finalize_operations(rat))
    out["finalize_root"] = finalize_root(blk.transactions, ratified_ops) == h.finalize_root
    out["ratifications_root"] = ratifications_root(blk.ratifications) == h.ratifications_root
    out["header_root+block_hash"] = (
        block_hash(blk.previous_hash, header_root(h)) == blk.block_hash)
    for ct in blk.transactions:
        tx = ct.transaction
        out[f"tx_{hex(tx.id)[:10]}_id"] = transaction_id(tx) == tx.id
        transitions = []
        if tx.execution:
            transitions += tx.execution.transitions
        if tx.fee:
            transitions.append(tx.fee.transition)
        for t in transitions:
            out[f"transition_{hex(t.id)[:10]}_id"] = transition_id(t) == t.id
    for rat in blk.ratifications:
        if rat.variant == 0:
            out["committee_id"] = committee_id(rat.committee) == rat.committee.id
    if blk.authority.variant == 0:
        out["beacon_signature"] = verify_beacon_signature(blk)
    return out
