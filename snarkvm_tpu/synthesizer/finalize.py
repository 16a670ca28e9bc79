"""Finalize execution: on-chain mapping commands + speculation engine.

Mirrors synthesizer/process/src/finalize.rs + synthesizer/src/vm/finalize.rs:
  * FinalizeRegisters run the command set (command/mod.rs:64): contains /
    get / get.or_use / set / remove, rand.chacha, branch.eq / branch.neq /
    position, await;
  * speculate: per-transaction atomic_checkpoint -> run finalize -> on
    halt atomic_rewind and mark Rejected (vm/finalize.rs:193);
  * finalize: same pipeline committed via finish_atomic.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..params import bls12_377 as P
from ..console.types import Literal, Plaintext, int_to_bits_le, bytes_to_bits_le, INT_WIDTHS
from ..console import network as N
from ..ledger.store import NestedMap
from ..utils.chacha import ChaCha20Rng
from .interpreter import HaltError
from .process import Stack, _as_plaintext, _as_literal, _BINARY, _UNARY
from . import interpreter as I

R = P.R


@dataclass
class FinalizeGlobalState:
    """vm finalize global state: block height/round + 32-byte random seed
    (finalize_global_state/mod.rs:50)."""
    block_height: int = 1
    block_round: int = 1
    random_seed: int = 0  # 32-byte seed as a little-endian int

    @classmethod
    def new(cls, block_round: int, block_height: int, cumulative_weight: int,
            cumulative_proof_target: int, previous_block_hash: int):
        """Seed = BHP768 over [round u64, height u32, weight u128,
        cumulative_proof_target u128, prev hash field] (605 bits), taken as
        32 LE bytes (finalize_global_state/mod.rs:57-73)."""
        bits = (int_to_bits_le(block_round, 64)
                + int_to_bits_le(block_height, 32)
                + int_to_bits_le(cumulative_weight, 128)
                + int_to_bits_le(cumulative_proof_target, 128)
                + int_to_bits_le(previous_block_hash % R, 253))
        seed = N.hash_bhp(768, bits)
        return cls(block_height=block_height, block_round=block_round,
                   random_seed=seed)


class FinalizeStore:
    """program id -> mapping name -> key bits -> value (FinalizeStore:529).
    `maps` may be any NestedMap-interface backend (in-memory default, or
    ledger/store_db.DbNestedMap for the persistent SQLite backend)."""

    def __init__(self, maps=None):
        self.maps = maps if maps is not None else NestedMap()

    def mapping(self, program_id: str, name: str):
        return self.maps.map((program_id, name))


def _key_of(value) -> bytes:
    pt = _as_plaintext(value)
    bits = pt.to_bits_le()
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


class FinalizeRegisters:
    def __init__(self, stack: Stack, store: FinalizeStore, state: FinalizeGlobalState,
                 transition_id: int, function_name: str):
        self.stack = stack
        self.store = store
        self.state = state
        self.transition_id = transition_id
        self.function_name = function_name
        self.regs = {}
        self.awaited = set()    # future registers awaited so far

    def load(self, operand):
        if operand == "block.height":
            return Literal("u32", self.state.block_height)
        if operand == "block.round":
            return Literal("u64", self.state.block_round)
        if operand == "network.id":
            return Literal("u16", N.ID)
        if operand.startswith("r") and operand.split(".")[0].split("[")[0] in self.regs:
            base = operand.split(".")[0].split("[")[0]
            if operand == base:
                return self.regs[base]
            # member/index access via the Stack register machinery
            from .process import Registers
            tmp = Registers()
            tmp.regs = {base: self.regs[base]}
            return tmp.load(operand)
        from ..console.types import literal_from_str
        return literal_from_str(operand)

    def store_reg(self, dest, value):
        self.regs[dest] = value


def execute_finalize(stack: Stack, finalize_name: str, inputs, store: FinalizeStore,
                     state: FinalizeGlobalState, transition_id: int = 0):
    """Run a finalize block against the speculative store view."""
    fin = stack.program.finalizes.get(finalize_name)
    if fin is None:
        raise HaltError(f"no finalize {finalize_name}")
    regs = FinalizeRegisters(stack, store, state, transition_id, finalize_name)
    for finput, value in zip(fin.inputs, inputs):
        if isinstance(value, str):
            from .process import parse_plaintext_str
            value = parse_plaintext_str(value)
        regs.store_reg(finput.register, value)

    pc = 0
    steps = 0
    commands = fin.commands
    while pc < len(commands):
        steps += 1
        if steps > 100_000:
            raise HaltError("finalize exceeded maximum steps")
        cmd = commands[pc]
        op = cmd.opcode
        if op == "position":
            pc += 1
            continue
        if op in ("branch.eq", "branch.neq"):
            a = regs.load(cmd.operands[0])
            b = regs.load(cmd.operands[1])
            target = None
            for operand in cmd.operands:
                if isinstance(operand, tuple) and operand[0] == "to":
                    target = operand[1]
            eq = I.plaintext_eq(a, b)
            if (op == "branch.eq") == eq:
                pc = fin.positions[target]
            else:
                pc += 1
            continue
        if op == "await":
            # runtime await accounting (process finalize rules): each
            # future input must be awaited EXACTLY once along the taken
            # control path — double-awaits and missed futures reject the
            # transaction (the branch_with_future corpus pins this).
            reg = cmd.operands[0]
            if reg in regs.awaited:
                raise HaltError(f"future {reg} awaited more than once")
            regs.awaited.add(reg)
        _execute_finalize_command(stack, regs, cmd)
        pc += 1
    future_inputs = {i.register for i in fin.inputs
                     if i.value_type.endswith(".future")}
    if regs.awaited != future_inputs:
        missing = future_inputs - regs.awaited
        raise HaltError(
            f"finalize '{finalize_name}' did not await {sorted(missing)}")
    return regs


def _sqrt_fr(v: int):
    """Square root in Fr, or None (console Field sqrt semantics)."""
    from ..fields.scalar import Fr as _Fr
    s = _Fr(v % R).sqrt()
    return None if s is None else s.v


def _split_mapping_access(token: str):
    """'balances[r0]' -> ('balances', 'r0') (finalize text format)."""
    name, _, rest = token.partition("[")
    assert rest.endswith("]"), f"expected mapping[key], got {token}"
    return name, rest[:-1]


def _resolve_mapping_owner(prog_id: str, mapping: str):
    """'users' -> own program; 'registry.aleo/users' -> external read
    (command/get.rs: reads may cross programs, writes may not —
    _validate_program rejects external set/remove at deploy)."""
    if "/" in mapping:
        return mapping.split("/", 1)
    return prog_id, mapping


def _execute_finalize_command(stack: Stack, regs: FinalizeRegisters, cmd):
    op = cmd.opcode
    prog_id = stack.program.id
    if op == "contains":
        mapping, key_op = _split_mapping_access(cmd.operands[0])
        pid, mapping = _resolve_mapping_owner(prog_id, mapping)
        m = regs.store.mapping(pid, mapping)
        found = m.contains_speculative(_key_of(regs.load(key_op)))
        regs.store_reg(cmd.destinations[0], Literal("boolean", found))
        return
    if op == "get":
        mapping, key_op = _split_mapping_access(cmd.operands[0])
        pid, mapping = _resolve_mapping_owner(prog_id, mapping)
        m = regs.store.mapping(pid, mapping)
        v = m.get_speculative(_key_of(regs.load(key_op)))
        if v is None:
            raise HaltError(f"missing key in mapping {mapping}")
        regs.store_reg(cmd.destinations[0], v)
        return
    if op == "get.or_use":
        mapping, key_op = _split_mapping_access(cmd.operands[0])
        pid, mapping = _resolve_mapping_owner(prog_id, mapping)
        default_op = cmd.operands[1]
        m = regs.store.mapping(pid, mapping)
        v = m.get_speculative(_key_of(regs.load(key_op)))
        if v is None:
            v = _as_plaintext(regs.load(default_op))
        regs.store_reg(cmd.destinations[0], v)
        return
    if op == "set":
        value_op = cmd.operands[0]
        mapping, key_op = _split_mapping_access(cmd.destinations[0])
        m = regs.store.mapping(prog_id, mapping)
        m.insert(_key_of(regs.load(key_op)), _as_plaintext(regs.load(value_op)))
        return
    if op == "remove":
        mapping, key_op = _split_mapping_access(cmd.operands[0])
        m = regs.store.mapping(prog_id, mapping)
        m.remove(_key_of(regs.load(key_op)))
        return
    if op == "rand.chacha":
        dest_type = (cmd.as_type or "field").split(".")[0]
        seeds = [regs.load(o) for o in cmd.operands]
        # rand_chacha.rs:90 preimage: [seed 256b, transition id field,
        # program id (name+network identifier bits, no dot), function name,
        # destination locator u64, destination type id u8, seeds]
        from ..console.types import VARIANTS
        preimage = int_to_bits_le(regs.state.random_seed, 256)
        preimage += int_to_bits_le(regs.transition_id % R, 253)
        name, _, network = prog_id.partition(".")
        preimage += bytes_to_bits_le(name.encode())
        preimage += bytes_to_bits_le(network.encode())
        preimage += bytes_to_bits_le(regs.function_name.encode())
        preimage += int_to_bits_le(int(cmd.destinations[0][1:]), 64)
        preimage += int_to_bits_le(VARIANTS[dest_type], 8)
        for s in seeds:
            preimage += _as_plaintext(s).to_bits_le()
        digest = N.hash_bhp(1024, preimage)
        rng = ChaCha20Rng(digest.to_bytes(32, "little"))
        if dest_type == "field":
            out = Literal("field", rng.rand_field(R, 3))
        elif dest_type == "boolean":
            out = Literal("boolean", rng.gen_bool())
        elif dest_type in INT_WIDTHS:
            w = INT_WIDTHS[dest_type]
            v = rng.gen_int(w) if dest_type[0] == "i" else rng.gen_uint(w)
            out = Literal(dest_type, v)
        elif dest_type == "scalar":
            out = Literal("scalar", rng.rand_field(P.S, 5))
        elif dest_type in ("group", "address"):
            # Uniform for twisted-Edwards projective (templates/
            # twisted_edwards_extended/projective.rs rand): sample x,
            # pick the greater/lesser y by a random bool, retry until
            # on-curve, clear the cofactor.
            from ..curves import edwards as ed
            pt = None
            while pt is None:
                x = rng.rand_field(R, 3)
                greatest = rng.gen_bool()
                x2 = x * x % R
                num = (P.EDWARDS_A * x2 - 1) % R
                den = (P.EDWARDS_D * x2 - 1) % R
                try:
                    y2 = num * pow(den, -1, R) % R
                except ValueError:
                    continue
                y = _sqrt_fr(y2)
                if y is None:
                    continue
                negy = (R - y) % R
                y_sel = y if (y < negy) ^ greatest else negy
                cand = (x, y_sel)
                pt = cand if ed.is_on_curve(cand) else None
            g = ed.mul(pt, 4)        # cofactor clearing
            out = Literal(dest_type, g)
        else:
            raise HaltError(f"rand.chacha unsupported type {dest_type}")
        regs.store_reg(cmd.destinations[0], out)
        return
    if op == "await":
        # await rX: execute the awaited child future's finalize against the
        # same speculative store view (command/await.rs semantics)
        v = regs.load(cmd.operands[0])
        if getattr(v, "kind", None) == "future":
            pid, fname, args = v.value
            sub = stack if pid == stack.program.id else stack.external.get(pid)
            if sub is None:
                raise HaltError(f"awaited program {pid} not found")
            execute_finalize(sub, fname, args, regs.store, regs.state,
                             regs.transition_id)
        return
    # plain instructions allowed inside finalize
    if op in _BINARY:
        a = _as_literal(regs.load(cmd.operands[0]))
        b = _as_literal(regs.load(cmd.operands[1]))
        regs.store_reg(cmd.destinations[0], _BINARY[op](a, b))
        return
    if op in _UNARY:
        regs.store_reg(cmd.destinations[0], _UNARY[op](_as_literal(regs.load(cmd.operands[0]))))
        return
    if op == "ternary":
        c = _as_literal(regs.load(cmd.operands[0]))
        a, b = regs.load(cmd.operands[1]), regs.load(cmd.operands[2])
        regs.store_reg(cmd.destinations[0], I.op_ternary(c, _as_literal(a), _as_literal(b)))
        return
    if op in ("is.eq", "is.neq"):
        eq = I.plaintext_eq(regs.load(cmd.operands[0]), regs.load(cmd.operands[1]))
        regs.store_reg(cmd.destinations[0], Literal("boolean", eq if op == "is.eq" else not eq))
        return
    if op in ("assert.eq", "assert.neq"):
        eq = I.plaintext_eq(regs.load(cmd.operands[0]), regs.load(cmd.operands[1]))
        if (op == "assert.eq") != eq:
            raise HaltError(f"{op} failed in finalize")
        return
    if op.startswith("hash.") or op.startswith("cast"):
        from .process import Registers
        tmp = Registers()
        tmp.regs = dict(regs.regs)
        stack._execute(cmd, tmp)
        for d in cmd.destinations:
            regs.store_reg(d, tmp.regs[d])
        return
    raise HaltError(f"unsupported finalize command {op}")


# ---------------------------------------------------------------------------
# Speculation (vm/finalize.rs:193 atomic_speculate)
# ---------------------------------------------------------------------------

def speculate(stacks: dict, transactions, store: FinalizeStore, state: FinalizeGlobalState):
    """transactions: list of (program_id, finalize_name, inputs, transition_id).
    Returns (accepted, rejected) index lists; store batch stays OPEN for
    finish via `finalize_commit` (mirror of speculate -> finalize split)."""
    store.maps.start_atomic()
    accepted, rejected = [], []
    for i, (program_id, finalize_name, inputs, tid) in enumerate(transactions):
        store.maps.atomic_checkpoint()
        try:
            execute_finalize(stacks[program_id], finalize_name, inputs, store, state, tid)
            accepted.append(i)
            store.maps.clear_latest_checkpoint()
        except HaltError:
            store.maps.atomic_rewind()
            rejected.append(i)
    return accepted, rejected


def finalize_commit(store: FinalizeStore):
    store.maps.finish_atomic()


def finalize_abort(store: FinalizeStore):
    store.maps.abort_atomic()
