"""Poseidon sponge — parameters, host sponge, and batched TPU permutation.

Parameter generation mirrors the reference's grain-LFSR procedure exactly
(fields/src/traits/poseidon_grain_lfsr.rs, poseidon_default.rs):
  * 80-bit grain LFSR seeded with (sbox flag, field bits, t, R_F, R_P),
    160 warm-up bits, "discard second bit until a 1" output rule;
  * ARK via rejection sampling, MDS as the Cauchy-like 1/(x_i + y_j).

Sponge semantics mirror algorithms/src/crypto_hash/poseidon.rs (duplex
absorb/squeeze with mode tracking; capacity index 0, rate after it).

The batched path (`permute_batched`) runs many sponges in parallel as Fr
limb planes on TPU — used by Merkle-tree building and the puzzle.
"""
from __future__ import annotations

import functools

import numpy as np

from ..params import bls12_377 as P


# ---------------------------------------------------------------------------
# Grain LFSR (exact mirror of the reference's bit semantics)
# ---------------------------------------------------------------------------

class GrainLFSR:
    def __init__(self, is_sbox_inverse: bool, field_bits: int, state_len: int,
                 full_rounds: int, partial_rounds: int):
        state = [False] * 80
        state[1] = True
        state[5] = is_sbox_inverse

        def put(value, lo, hi):
            cur = value
            for i in range(hi, lo - 1, -1):
                state[i] = (cur & 1) == 1
                cur >>= 1

        put(field_bits, 6, 17)
        put(state_len, 18, 29)
        put(full_rounds, 30, 39)
        put(partial_rounds, 40, 49)
        for i in range(50, 80):
            state[i] = True
        self.state = state
        self.head = 0
        self.field_bits = field_bits
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> bool:
        s, h = self.state, self.head
        b = s[(h + 62) % 80] ^ s[(h + 51) % 80] ^ s[(h + 38) % 80] ^ s[(h + 23) % 80] \
            ^ s[(h + 13) % 80] ^ s[h]
        s[h] = b
        self.head = (h + 1) % 80
        return b

    def get_bits(self, n: int):
        """n output bits with the discard rule."""
        out = []
        for _ in range(n):
            first = self._next_bit()
            while not first:
                self._next_bit()  # discard second
                first = self._next_bit()
            out.append(self._next_bit())
        return out

    def field_elements_rejection(self, modulus: int, num: int):
        out = []
        while len(out) < num:
            bits = self.get_bits(self.field_bits)
            # stream order is MSB-first
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            if v < modulus:
                out.append(v)
        return out

    def field_elements_mod_p(self, modulus: int, num: int):
        out = []
        for _ in range(num):
            bits = self.get_bits(self.field_bits)
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            out.append(v % modulus)
        return out


# Round configurations (curves/src/bls12_377/{fq.rs:180,fr.rs:195}):
#   (rate -> (alpha, full_rounds, partial_rounds))
FR_ENTRIES = {r: (17, 8, 31) for r in range(2, 9)}
FQ_ENTRIES = {2: (17, 8, 31), 3: (5, 8, 56), 4: (5, 8, 56), 5: (5, 8, 57),
              6: (5, 8, 57), 7: (5, 8, 57), 8: (5, 8, 57)}


class PoseidonParameters:
    def __init__(self, modulus: int, rate: int, alpha: int, full_rounds: int,
                 partial_rounds: int):
        self.modulus = modulus
        self.rate = rate
        self.capacity = 1
        self.t = rate + 1
        self.alpha = alpha
        self.full_rounds = full_rounds
        self.partial_rounds = partial_rounds
        field_bits = modulus.bit_length()
        lfsr = GrainLFSR(False, field_bits, self.t, full_rounds, partial_rounds)
        rounds = full_rounds + partial_rounds
        self.ark = [lfsr.field_elements_rejection(modulus, self.t) for _ in range(rounds)]
        xs = lfsr.field_elements_mod_p(modulus, self.t)
        ys = lfsr.field_elements_mod_p(modulus, self.t)
        self.mds = [[pow((x + y) % modulus, -1, modulus) for y in ys] for x in xs]


@functools.lru_cache(maxsize=None)
def parameters(field: str, rate: int) -> PoseidonParameters:
    if field == "fr":
        alpha, rf, rp = FR_ENTRIES[rate]
        return PoseidonParameters(P.R, rate, alpha, rf, rp)
    if field == "fq":
        alpha, rf, rp = FQ_ENTRIES[rate]
        return PoseidonParameters(P.Q, rate, alpha, rf, rp)
    raise ValueError(field)


# ---------------------------------------------------------------------------
# Host sponge (duplex, exact reference semantics)
# ---------------------------------------------------------------------------

class PoseidonSponge:
    """State layout: [capacity (1), rate (RATE)]. Mode-tracked duplex."""

    def __init__(self, params: PoseidonParameters):
        self.p = params
        self.state = [0] * params.t
        self.mode_absorbing = True
        self.index = 0  # next absorb or squeeze index within the rate

    # -- permutation --
    def _permute(self):
        p = self.p
        m = p.modulus
        half = p.full_rounds // 2
        total = p.full_rounds + p.partial_rounds
        st = self.state
        for rnd in range(total):
            ark = p.ark[rnd]
            st = [(s + a) % m for s, a in zip(st, ark)]
            is_full = not (half <= rnd < half + p.partial_rounds)
            if is_full:
                st = [pow(s, p.alpha, m) for s in st]
            else:
                st[0] = pow(st[0], p.alpha, m)
            st = [sum(s * w for s, w in zip(st, row)) % m for row in p.mds]
        self.state = st

    # -- duplex absorb --
    def absorb_native(self, elements):
        elements = list(elements)
        if not elements:
            return
        if self.mode_absorbing:
            start = self.index
            if start == self.p.rate:
                self._permute()
                start = 0
        else:
            self._permute()
            start = 0
        self._absorb_internal(start, elements)

    def _absorb_internal(self, rate_start, inp):
        rate = self.p.rate
        i = 0
        while True:
            chunk = inp[i : i + (rate - rate_start)]
            for j, e in enumerate(chunk):
                self.state[1 + rate_start + j] = (self.state[1 + rate_start + j] + e) % self.p.modulus
            i += len(chunk)
            if i >= len(inp):
                self.mode_absorbing = True
                self.index = rate_start + len(chunk)
                return
            self._permute()
            rate_start = 0

    # -- duplex squeeze --
    def squeeze_native(self, num: int):
        if num == 0:
            return []
        if self.mode_absorbing:
            self._permute()
            start = 0
        else:
            start = self.index
            if start == self.p.rate:
                self._permute()
                start = 0
        return self._squeeze_internal(start, num)

    def _squeeze_internal(self, rate_start, num):
        rate = self.p.rate
        out = []
        while True:
            take = min(rate - rate_start, num - len(out))
            out.extend(self.state[1 + rate_start : 1 + rate_start + take])
            if len(out) >= num:
                self.mode_absorbing = False
                self.index = rate_start + take
                return out
            self._permute()
            rate_start = 0


def evaluate(field: str, rate: int, inputs, num_outputs: int = 1):
    """Poseidon::evaluate_many — fresh sponge, absorb, squeeze."""
    sp = PoseidonSponge(parameters(field, rate))
    sp.absorb_native(inputs)
    return sp.squeeze_native(num_outputs)


def hash_psd(rate: int, inputs):
    """console Poseidon hash over Fr (single output)."""
    return evaluate("fr", rate, inputs, 1)[0]


# ---------------------------------------------------------------------------
# Batched TPU permutation (Fr limb planes) — many sponges in parallel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _device_constants(field: str, rate: int):
    from ..fields import limb

    spec = limb.FR if field == "fr" else limb.FQ
    p = parameters(field, rate)
    # pure-host Montgomery conversion (safe inside jax traces)
    conv = lambda rows: np.stack(
        [np.stack([limb.int_to_limbs_py(x * spec.R % spec.p, spec.L) for x in row]) for row in rows]
    )
    return p, spec, conv(p.ark), conv(p.mds)


def permute_batched(state, field: str = "fr", rate: int = 2):
    """state: Montgomery limbs [batch, t, L] -> permuted state (same shape).
    On TPU this dispatches to the fused Pallas kernel (all rounds in
    VMEM, ops/poseidon_pallas.py); the per-op XLA path below serves CPU
    tests and as the SNARKVM_TPU_POSEIDON=xla escape hatch."""
    import os
    import jax as _jax
    import jax.numpy as jnp
    from ..fields import limb

    if (_jax.default_backend() != "cpu"
            and os.environ.get("SNARKVM_TPU_POSEIDON", "fused") == "fused"):
        from ..ops.poseidon_pallas import permute_batched_fused
        return permute_batched_fused(state, field, rate)

    p, spec, ark_np, mds_np = _device_constants(field, rate)
    ark = jnp.asarray(ark_np)
    mds = jnp.asarray(mds_np)
    half = p.full_rounds // 2
    total = p.full_rounds + p.partial_rounds

    def sbox(x):
        # x^alpha with alpha = 17 or 5: square chain + final mul
        acc = limb.mont_mul(x, x, spec)          # x^2
        acc = limb.mont_mul(acc, acc, spec)      # x^4
        if p.alpha == 5:
            return limb.mont_mul(acc, x, spec)
        acc = limb.mont_mul(acc, acc, spec)      # x^8
        acc = limb.mont_mul(acc, acc, spec)      # x^16
        return limb.mont_mul(acc, x, spec)       # x^17

    for rnd in range(total):
        state = limb.add(state, jnp.broadcast_to(ark[rnd], state.shape), spec)
        if not (half <= rnd < half + p.partial_rounds):
            state = sbox(state)
        else:
            s0 = sbox(state[..., 0:1, :])
            state = jnp.concatenate([s0, state[..., 1:, :]], axis=-2)
        # MDS: new_i = sum_j mds[i][j] * s_j
        prod = limb.mont_mul(state[..., None, :, :], jnp.broadcast_to(mds, state.shape[:-2] + mds.shape), spec)
        acc = prod[..., 0, :]
        for j in range(1, p.t):
            acc = limb.add(acc, prod[..., j, :], spec)
        state = acc
    return state


def domain_separator(domain: str, modulus: int = P.R) -> int:
    """Field::new_domain_separator — LE bytes of the ASCII string mod p."""
    return int.from_bytes(domain.encode(), "little") % modulus


def hash_many_with_domain(field: str, rate: int, domain: str, inputs, num_outputs: int):
    """console Poseidon{2,4,8} hash_many: preimage = [domain, len, 0-pad to rate] ++ input.
    Ref: console/algorithms/src/poseidon/hash_many.rs."""
    modulus = P.R if field == "fr" else P.Q
    preimage = [domain_separator(domain, modulus), len(list(inputs)) % modulus]
    preimage += [0] * max(0, rate - len(preimage))
    preimage += list(inputs)
    sp = PoseidonSponge(parameters(field, rate))
    sp.absorb_native(preimage)
    return sp.squeeze_native(num_outputs)


def hash_with_domain(field: str, rate: int, domain: str, inputs) -> int:
    return hash_many_with_domain(field, rate, domain, inputs, 1)[0]
