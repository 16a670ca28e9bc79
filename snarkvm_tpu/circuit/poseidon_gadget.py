"""Circuit Poseidon sponge (circuit/algorithms/src/poseidon/) — the
R1CS mirror of hashes/poseidon.py, built on CField gadgets. ARK/MDS are
constants; only the S-boxes cost constraints (alpha=17: 5 muls/element)."""
from __future__ import annotations

from ..params import bls12_377 as P
from ..hashes import poseidon as host_poseidon
from ..console import network as N
from .builder import CircuitBuilder, LinearCombination
from .types import CField

R = P.R


def _permute(builder, state, params):
    half = params.full_rounds // 2
    total = params.full_rounds + params.partial_rounds
    for rnd in range(total):
        ark = params.ark[rnd]
        state = [s.add_const(a) for s, a in zip(state, ark)]
        is_full = not (half <= rnd < half + params.partial_rounds)
        if is_full:
            state = [s.pow_const(params.alpha) for s in state]
        else:
            state = [state[0].pow_const(params.alpha)] + state[1:]
        new_state = []
        for row in params.mds:
            acc = LinearCombination(0)
            for s, w in zip(state, row):
                acc = acc.add(s.lc, w)
            new_state.append(CField(builder, acc))
        state = new_state
    return state


def hash_psd(builder: CircuitBuilder, rate: int, inputs, num_outputs: int = 1):
    """Circuit version of console hash_psd{rate} with the Aleo domain:
    preimage = [domain, len, 0-pad] ++ inputs; absorb; squeeze."""
    params = host_poseidon.parameters("fr", rate)
    domain = N.domain_separator(f"AleoPoseidon{rate}")
    preimage = [CField.constant(builder, domain),
                CField.constant(builder, len(inputs))]
    preimage += [CField.constant(builder, 0)] * max(0, rate - 2)
    preimage = preimage[:rate] + list(inputs)
    # duplex absorb starting from zero state
    state = [CField.constant(builder, 0) for _ in range(params.t)]
    i = 0
    first = True
    idx = 0
    remaining = list(preimage)
    while remaining:
        chunk = remaining[:rate - idx]
        remaining = remaining[len(chunk):]
        for j, e in enumerate(chunk):
            state[1 + idx + j] = state[1 + idx + j] + e
        if remaining:
            state = _permute(builder, state, params)
            idx = 0
        else:
            idx = idx + len(chunk)
    # squeeze
    out = []
    state = _permute(builder, state, params)
    idx = 0
    while len(out) < num_outputs:
        take = min(rate - idx, num_outputs - len(out))
        out.extend(state[1 + idx:1 + idx + take])
        idx += take
        if len(out) < num_outputs:
            state = _permute(builder, state, params)
            idx = 0
    return out
