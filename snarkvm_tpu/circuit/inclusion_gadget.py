"""The inclusion circuit: in-circuit StatePath verification + serial-number
derivation (process/src/trace/inclusion/mod.rs:201 to_circuit_assignment,
circuit/program/src/state_path/verify.rs).

Layout (public inputs in order): [1, global_state_root, local_state_root,
serial_number]. Private: the 5-level Merkle path, commitment, gamma,
is_global.

Checks:
  1. serial_number == CommitBHP512([SN domain, commitment], sn_nonce)
     where sn_nonce = HashToScalar_psd2([SN domain, (COFACTOR * gamma).x])
     (record/serial_number.rs semantics, console/record.py:152);
  2. transition leaf == commitment;
  3. the Merkle walk transition -> transaction -> transactions -> header
     -> block hash; then ternary(is_global, block-path walk reaches the
     global state root, transaction_id == local_state_root).
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..curves import edwards as ed
from ..console import network as N
from ..console.state_path import (StatePath, TRANSITION_DEPTH,
                                  TRANSACTION_DEPTH, TRANSACTIONS_DEPTH,
                                  HEADER_DEPTH, BLOCKS_DEPTH)
from ..hashes.bhp import SCALAR_BITS
from .builder import CircuitBuilder, LinearCombination, PUBLIC, PRIVATE
from .types import CField, CBool, CGroup
from .bhp_gadget import bhp_hash_point_gadget
from .merkle_gadget import hash_leaf_gadget, _hash_children_gadget
from . import poseidon_gadget

R = P.R


def bhp_commit_gadget(builder, variant: int, domain: str, bits,
                      randomizer_bits) -> CField:
    """CommitBHP: hash point + sum_i r_i * 2^i * random_base
    (circuit/algorithms/src/bhp/commit.rs). Returns the x-coordinate."""
    acc = bhp_hash_point_gadget(builder, variant, domain, bits)
    bhp = N._bhp(variant)
    # commit_uncompressed.rs:30: ternary(bit, power, zero) folds to LCs
    # (both arms constant), then a full 6-constraint Edwards add per bit
    for i, bit in enumerate(randomizer_bits[:SCALAR_BITS]):
        px, py = ed.to_affine(bhp.random_base[i])
        x_lc = LinearCombination(0).add(bit.lc, px)
        y_lc = LinearCombination(1).add(bit.lc, (py - 1) % R)
        term = CGroup(builder, CField(builder, x_lc), CField(builder, y_lc))
        acc = acc + term
    return acc.x


def _walk_path_gadget(builder, leaf_field: CField, step, depth: int) -> CField:
    """Merkle walk from a field leaf (BHP1024 leaf hash, BHP512 children)
    WITHOUT asserting the root — callers compare/select."""
    node = hash_leaf_gadget(builder, leaf_field.to_bits_le(253))
    index_bits = [CBool.new(builder, PRIVATE, (step.index >> i) & 1 == 1)
                  for i in range(depth)]
    sibs = [CField.new(builder, PRIVATE, s) for s in step.siblings]
    for bit, sib in zip(index_bits, sibs):
        left = sib.ternary(bit, node)
        right = node.ternary(bit, sib)
        node = _hash_children_gadget(builder, left, right)
    return node


def inclusion_assignment(state_path: StatePath, commitment: int, gamma,
                         serial_number: int, local_state_root: int,
                         is_global: bool) -> CircuitBuilder:
    """Builds the (satisfied) inclusion circuit for one record input."""
    builder = CircuitBuilder()
    gsr = CField.new(builder, PUBLIC, state_path.global_state_root)
    lsr = CField.new(builder, PUBLIC, local_state_root)
    sn = CField.new(builder, PUBLIC, serial_number)

    commit_g = CField.new(builder, PRIVATE, commitment)
    gamma_g = CGroup.new(builder, PRIVATE, gamma)
    is_global_g = CBool.new(builder, PRIVATE, is_global)

    # 1. serial number derivation
    cleared = gamma_g.double().double()              # COFACTOR = 4
    sn_domain = CField.constant(builder, N.SERIAL_NUMBER_DOMAIN)
    nonce_field = poseidon_gadget.hash_psd(builder, 2, [sn_domain, cleared.x])[0]
    nonce_bits = nonce_field.to_bits_le(253)[:250]   # from_field_lossy
    preimage = ([CBool.constant(builder, b)
                 for b in _bits(N.SERIAL_NUMBER_DOMAIN, 253)]
                + commit_g.to_bits_le(253))
    candidate_sn = bhp_commit_gadget(builder, 512, "AleoBHP512",
                                     preimage, nonce_bits)
    candidate_sn.assert_eq(sn)

    # 2. transition leaf is the commitment
    leaf = CField.new(builder, PRIVATE, state_path.transition_leaf)
    leaf.assert_eq(commit_g)

    # 3. the path walk
    tx_id = CField.new(builder, PRIVATE, state_path.transaction_id)
    txs_root = CField.new(builder, PRIVATE, state_path.transactions_root)
    header_root = CField.new(builder, PRIVATE, state_path.header_root)
    block_hash = CField.new(builder, PRIVATE, state_path.block_hash)

    _walk_path_gadget(builder, leaf, state_path.transition_path,
                      TRANSITION_DEPTH).assert_eq(tx_id)
    _walk_path_gadget(builder, tx_id, state_path.transaction_path,
                      TRANSACTION_DEPTH).assert_eq(txs_root)
    _walk_path_gadget(builder, txs_root, state_path.transactions_path,
                      TRANSACTIONS_DEPTH).assert_eq(header_root)
    _walk_path_gadget(builder, header_root, state_path.header_path,
                      HEADER_DEPTH).assert_eq(block_hash)
    candidate_gsr = _walk_path_gadget(builder, block_hash,
                                      state_path.block_path, BLOCKS_DEPTH)

    # ternary(is_global, global walk matches, transaction id == local root)
    global_ok = candidate_gsr.is_equal(gsr)
    local_ok = tx_id.is_equal(lsr)
    ok = _bool_ternary(builder, is_global_g, global_ok, local_ok)
    ok.assert_true()
    return builder


class _CMerklePath:
    """circuit/collections MerklePath: a U64 leaf index (64 private bit
    booleans — merkle_tree/mod.rs:28) + DEPTH sibling fields."""

    def __init__(self, builder, index: int, siblings, depth: int):
        self.index_bits = [CBool.new(builder, PRIVATE, (index >> i) & 1 == 1)
                           for i in range(64)]
        self.siblings = [CField.new(builder, PRIVATE, s) for s in siblings]
        self.depth = depth

    def verify(self, builder, root: CField, leaf_bits) -> CBool:
        """merkle_tree/verify.rs:20 — walk with (!bit) indicators and
        field ternaries, then root.is_equal(current)."""
        from .merkle_gadget import hash_leaf_gadget, _hash_children_gadget
        node = hash_leaf_gadget(builder, leaf_bits)
        for bit, sib in zip(self.index_bits[:self.depth], self.siblings):
            # verify.rs:43: indicator = !bit (an LC over {one, bit} — its
            # two B-side entries per ternary are load-bearing for nz_b
            # parity with the shipped inclusion key)
            indicator = ~bit
            left = node.ternary(indicator, sib)
            right = sib.ternary(indicator, node)
            node = _hash_children_gadget(builder, left, right)
        return root.is_equal(node)


def _u8_bits_gadget(builder, value: int, width: int = 8):
    return [CBool.new(builder, PRIVATE, (value >> i) & 1 == 1)
            for i in range(width)]


def ledger_inclusion_assignment(sp, commitment: int, gamma,
                                serial_number: int,
                                local_state_root: int = 0,
                                is_global: bool = True) -> CircuitBuilder:
    """The inclusion circuit over a REAL ledger state path, mirroring the
    reference exactly (trace/inclusion/mod.rs:201 to_circuit_assignment +
    circuit/program/src/state_path/{mod.rs:86 Inject, verify.rs:55}):

    Inject order: StatePath (global_state_root PUBLIC; block path, block
    hash, previous block hash, header root/path/leaf, transactions path,
    transaction id/path/leaf, transition root, tcm, transition path/leaf
    all PRIVATE, with U64 path indices and U8/U16 struct members as bit
    booleans) -> commitment -> gamma -> local_state_root (PUBLIC) ->
    is_global -> serial_number (PUBLIC).

    Checks: serial-number derivation, transition_leaf.id == commitment,
    and state_path.verify (struct leaves, variant equality checks, the
    transition_id = BHP512(transition_root || tcm) binding, block-hash
    preimage, with the is_global ternary)."""
    from ..console.state_path import (TRANSITION_DEPTH, TRANSACTION_DEPTH,
                                      TRANSACTIONS_DEPTH, HEADER_DEPTH)
    from ..ledger.ledger import BLOCK_TREE_DEPTH
    from .bhp_gadget import bhp_hash_gadget

    builder = CircuitBuilder()

    # ---- StatePath inject (state_path/mod.rs:90) ----
    gsr = CField.new(builder, PUBLIC, sp.global_state_root)
    block_path = _CMerklePath(builder, sp.block_level.index,
                              sp.block_level.siblings, BLOCK_TREE_DEPTH)
    block_hash = CField.new(builder, PRIVATE, sp.block_hash % R)
    prev_block_hash = CField.new(builder, PRIVATE, sp.previous_block_hash % R)
    header_root = CField.new(builder, PRIVATE, sp.header_level.root)
    header_path = _CMerklePath(builder, sp.header_level.index,
                               sp.header_level.siblings, HEADER_DEPTH)
    # HeaderLeaf { index: U8, id: Field }
    header_leaf_index = _u8_bits_gadget(builder, 1)
    header_leaf_id = CField.new(builder, PRIVATE, sp.transactions_level.root)
    transactions_path = _CMerklePath(builder, sp.transactions_level.index,
                                     sp.transactions_level.siblings,
                                     TRANSACTIONS_DEPTH)
    transaction_id = CField.new(builder, PRIVATE, sp.transaction_id)
    transaction_path = _CMerklePath(builder, sp.transaction_level.index,
                                    sp.transaction_level.siblings,
                                    TRANSACTION_DEPTH)
    # TransactionLeaf { variant: U8, index: U16, id: Field }
    tx_leaf_bits_raw = sp.transaction_level.leaf_bits
    tx_leaf_variant = _u8_bits_gadget(builder, _bits_to_int(tx_leaf_bits_raw[:8]))
    tx_leaf_index = _u8_bits_gadget(builder, _bits_to_int(tx_leaf_bits_raw[8:24]), 16)
    tx_leaf_id = CField.new(builder, PRIVATE, _bits_to_int(tx_leaf_bits_raw[24:]))
    transition_root = CField.new(builder, PRIVATE, sp.transition_root)
    tcm = CField.new(builder, PRIVATE, sp.tcm % R)
    transition_path = _CMerklePath(builder, sp.transition_level.index,
                                   sp.transition_level.siblings,
                                   TRANSITION_DEPTH)
    # TransitionLeaf { version: U8, index: U8, variant: U8, id: Field }
    tr_leaf_version = _u8_bits_gadget(builder, 1)
    tr_leaf_index = _u8_bits_gadget(builder, sp.leaf_index)
    tr_leaf_variant = _u8_bits_gadget(builder, 3)
    tr_leaf_id = CField.new(builder, PRIVATE, commitment)

    # ---- remaining witness inject (trace/inclusion/mod.rs:208) ----
    commit_g = CField.new(builder, PRIVATE, commitment)
    gamma_g = CGroup.new(builder, PRIVATE, gamma)
    lsr = CField.new(builder, PUBLIC, local_state_root % R)
    is_global_g = CBool.new(builder, PRIVATE, is_global)
    sn = CField.new(builder, PUBLIC, serial_number)

    # ---- serial number derivation (record/serial_number.rs) ----
    cleared = gamma_g.double().double()              # COFACTOR = 4
    sn_domain = CField.constant(builder, N.SERIAL_NUMBER_DOMAIN)
    nonce_field = poseidon_gadget.hash_psd(builder, 2, [sn_domain, cleared.x])[0]
    nonce_bits = nonce_field.to_bits_le(253)[:250]   # from_field_lossy
    preimage = ([CBool.constant(builder, b)
                 for b in _bits(N.SERIAL_NUMBER_DOMAIN, 253)]
                + commit_g.to_bits_le(253))
    bhp_commit_gadget(builder, 512, "AleoBHP512", preimage,
                      nonce_bits).assert_eq(sn)

    # ---- transition leaf id == commitment (inclusion/mod.rs:229) ----
    tr_leaf_id.assert_eq(commit_g)

    # ---- state_path.verify (verify.rs:55) ----
    tr_leaf_bits = (tr_leaf_version + tr_leaf_index + tr_leaf_variant
                    + tr_leaf_id.to_bits_le(253))
    check_transition_path = (
        transition_path.verify(builder, transition_root, tr_leaf_bits)
        & _u8_is_equal(builder, tr_leaf_variant, 3))

    # transaction leaf id == BHP512(transition_root || tcm)
    tid_pre = transition_root.to_bits_le(253) + tcm.to_bits_le(253)
    check_transaction_leaf = bhp_hash_gadget(
        builder, 512, "AleoBHP512", tid_pre).is_equal(tx_leaf_id)

    tx_leaf_bits = (tx_leaf_variant + tx_leaf_index
                    + tx_leaf_id.to_bits_le(253))
    check_transaction_path = (
        transaction_path.verify(builder, transaction_id, tx_leaf_bits)
        & _u8_is_equal(builder, tx_leaf_variant, 1))

    check_transactions_path = transactions_path.verify(
        builder, header_leaf_id, transaction_id.to_bits_le(253))

    header_leaf_bits = header_leaf_index + header_leaf_id.to_bits_le(253)
    check_header_path = (
        header_path.verify(builder, header_root, header_leaf_bits)
        & _u8_is_equal(builder, header_leaf_index, 1))

    # block hash = BHP1024(previous_block_hash || header_root)
    bh_pre = prev_block_hash.to_bits_le(253) + header_root.to_bits_le(253)
    check_block_hash = bhp_hash_gadget(
        builder, 1024, "AleoBHP1024", bh_pre).is_equal(block_hash)

    check_state_root = block_path.verify(builder, gsr,
                                         block_hash.to_bits_le(253))

    check_tt = (check_transition_path & check_transaction_path
                & check_transaction_leaf)
    check_local = check_tt & lsr.is_equal(transaction_id)
    check_global = (check_tt & check_transactions_path & check_header_path
                    & check_block_hash & check_state_root)
    ok = check_global.ternary(is_global_g, check_local)
    ok.assert_true()
    return builder


def _u8_is_equal(builder, bits, constant: int) -> CBool:
    """circuit U8::is_equal(constant): recompose to field (free LC),
    then Field::is_equal — 2 constraints (integers/src/equal.rs:36)."""
    lc = LinearCombination(0)
    for i, b in enumerate(bits):
        lc = lc.add(b.lc, (1 << i) % R)
    return CField(builder, lc).is_equal(CField.constant(builder, constant))


def _bits_to_int(bits) -> int:
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v


def _leaf_hash_bits(builder, leaf_bits):
    from .merkle_gadget import hash_leaf_gadget
    return hash_leaf_gadget(builder, leaf_bits)


def _bool_ternary(builder, cond: CBool, a: CBool, b: CBool) -> CBool:
    """cond ? a : b over booleans: out = b + cond*(a - b)."""
    av = builder.value_of(a.lc)
    bv = builder.value_of(b.lc)
    cv = builder.value_of(cond.lc)
    out_v = av if cv else bv
    out = CBool.new(builder, PRIVATE, bool(out_v))
    # out - b == cond * (a - b)
    diff = LinearCombination(0).add(a.lc, 1).add(b.lc, R - 1)
    lhs = LinearCombination(0).add(out.lc, 1).add(b.lc, R - 1)
    builder.enforce(cond.lc, diff, lhs)
    return out


def _bits(v: int, width: int):
    return [(v >> i) & 1 == 1 for i in range(width)]
