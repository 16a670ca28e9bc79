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


def ledger_inclusion_assignment(sp, commitment: int, gamma,
                                serial_number: int) -> CircuitBuilder:
    """Inclusion circuit over a REAL ledger state path (ledger/query.py
    LedgerStatePath): same serial-number derivation as above, then the
    exact tree encodings — field-leaf levels, the u8-prefixed header
    leaf at index 1, the flat BHP1024 block-hash binding, and the
    depth-32 block tree to the global state root.

    Public inputs: [1, global_state_root, serial_number]."""
    from ..console.state_path import (TRANSITION_DEPTH, TRANSACTION_DEPTH,
                                      TRANSACTIONS_DEPTH, HEADER_DEPTH)
    from ..ledger.ledger import BLOCK_TREE_DEPTH
    from .bhp_gadget import bhp_hash_gadget

    builder = CircuitBuilder()
    gsr = CField.new(builder, PUBLIC, sp.global_state_root)
    sn = CField.new(builder, PUBLIC, serial_number)
    commit_g = CField.new(builder, PRIVATE, commitment)
    gamma_g = CGroup.new(builder, PRIVATE, gamma)

    # serial number derivation (identical to the local-path variant)
    cleared = gamma_g.double().double()
    sn_domain = CField.constant(builder, N.SERIAL_NUMBER_DOMAIN)
    nonce_field = poseidon_gadget.hash_psd(builder, 2, [sn_domain, cleared.x])[0]
    nonce_bits = nonce_field.to_bits_le(253)[:250]
    preimage = ([CBool.constant(builder, b)
                 for b in _bits(N.SERIAL_NUMBER_DOMAIN, 253)]
                + commit_g.to_bits_le(253))
    bhp_commit_gadget(builder, 512, "AleoBHP512", preimage,
                      nonce_bits).assert_eq(sn)

    def walk(leaf_bits_g, level, depth):
        node = _leaf_hash_bits(builder, leaf_bits_g)
        index_bits = [CBool.new(builder, PRIVATE, (level.index >> i) & 1 == 1)
                      for i in range(depth)]
        sibs = [CField.new(builder, PRIVATE, s) for s in level.siblings]
        from .merkle_gadget import _hash_children_gadget
        for bit, sib in zip(index_bits, sibs):
            left = sib.ternary(bit, node)
            right = node.ternary(bit, sib)
            node = _hash_children_gadget(builder, left, right)
        return node

    # level 1: commitment leaf
    tx_id = walk(commit_g.to_bits_le(253), sp.transition_level,
                 TRANSITION_DEPTH)
    txs_root = walk(tx_id.to_bits_le(253), sp.transaction_level,
                    TRANSACTION_DEPTH)
    t_root = walk(txs_root.to_bits_le(253), sp.transactions_level,
                  TRANSACTIONS_DEPTH)
    # header leaf: u8 index prefix (1) + transactions root bits
    header_leaf = ([CBool.constant(builder, b) for b in _bits(1, 8)]
                   + t_root.to_bits_le(253))
    header_root = walk(header_leaf, sp.header_level, HEADER_DEPTH)
    # block hash = BHP1024(previous_hash bits || header_root bits)
    prev_g = CField.new(builder, PRIVATE, sp.previous_block_hash % R)
    block_hash = bhp_hash_gadget(
        builder, 1024, "AleoBHP1024",
        prev_g.to_bits_le(253) + header_root.to_bits_le(253))
    walk(block_hash.to_bits_le(253), sp.block_level,
         BLOCK_TREE_DEPTH).assert_eq(gsr)
    return builder


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
