"""Circuit environment: a functional R1CS builder.

Replaces the reference's thread-local mutable builder
(circuit/environment/src/circuit.rs:25 `thread_local! CIRCUIT`) with an
explicit object — the TPU-first design choice (SURVEY.md §2.8 P5): pure
construction, no global state, trivially parallel across instances.

Produces Assignments compatible with snark.r1cs / snark.varuna
(the Assignment -> prove edge, circuit/environment/src/helpers/
assignment.rs:88 -> varuna.rs:336).
"""
from __future__ import annotations

from ..params import bls12_377 as P
from ..snark import r1cs

R = P.R

CONSTANT, PUBLIC, PRIVATE = "constant", "public", "private"


class LinearCombination:
    """Sparse LC over builder variables + constant term. Keys are variable
    indices into the builder's combined (public ++ private) numbering;
    the constant ONE lives in `.constant`."""

    __slots__ = ("constant", "terms")

    def __init__(self, constant=0, terms=None):
        self.constant = constant % R
        self.terms = dict(terms or {})

    def copy(self):
        return LinearCombination(self.constant, self.terms)

    def add(self, other, coeff=1):
        out = self.copy()
        out.constant = (out.constant + coeff * other.constant) % R
        for v, c in other.terms.items():
            nc = (out.terms.get(v, 0) + coeff * c) % R
            if nc:
                out.terms[v] = nc
            else:
                out.terms.pop(v, None)
        return out

    def scale(self, k):
        k %= R
        return LinearCombination(self.constant * k, {v: c * k % R for v, c in self.terms.items() if c * k % R})

    def is_constant(self):
        return not self.terms


class CircuitBuilder:
    """Mode-aware R1CS accumulator (Environment trait semantics,
    circuit/environment/src/environment.rs:23)."""

    def __init__(self):
        self.public = [1]           # values; index 0 is ONE
        self.private = []
        self.constraints = []       # (a_lc, b_lc, c_lc)
        self.scope_stack = []
        # (label, c0, c1, v0, v1) spans recorded by scope() — the
        # Circuit::scope analog used to diff constraint-emission ORDER
        # against the reference synthesis (tools/dump_circuit_order.py)
        self.scopes = []

    def scope(self, label: str):
        """Context manager: record the constraint/private-var span of a
        named synthesis block (environment.rs Circuit::scope analog)."""
        b = self

        class _Scope:
            def __enter__(self):
                self.c0 = len(b.constraints)
                self.v0 = len(b.private)
                b.scope_stack.append(label)
                return self

            def __exit__(self, *exc):
                b.scope_stack.pop()
                b.scopes.append((".".join(b.scope_stack + [label]),
                                 self.c0, len(b.constraints),
                                 self.v0, len(b.private)))
                return False

        return _Scope()

    # -- variables --
    def new_public(self, value: int) -> LinearCombination:
        self.public.append(value % R)
        return LinearCombination(0, {("public", len(self.public) - 1): 1})

    def new_private(self, value: int) -> LinearCombination:
        self.private.append(value % R)
        return LinearCombination(0, {("private", len(self.private) - 1): 1})

    def new_variable(self, mode: str, value: int) -> LinearCombination:
        if mode == CONSTANT:
            return LinearCombination(value)
        if mode == PUBLIC:
            return self.new_public(value)
        return self.new_private(value)

    def value_of(self, lc: LinearCombination) -> int:
        acc = lc.constant
        for (kind, idx), coeff in lc.terms.items():
            v = self.public[idx] if kind == "public" else self.private[idx]
            acc += coeff * v
        return acc % R

    # -- constraints --
    def enforce(self, a: LinearCombination, b: LinearCombination, c: LinearCombination):
        # The reference environment drops constraints whose operands are
        # all constants, asserting satisfaction instead
        # (circuit/environment/src/circuit.rs:173) — count parity
        # requires the same.
        if a.is_constant() and b.is_constant() and c.is_constant():
            if a.constant * b.constant % R != c.constant % R:
                raise AssertionError(
                    f"constant constraint failed: {a.constant} * {b.constant} != {c.constant}")
            return
        self.constraints.append((a, b, c))

    def assert_eq(self, a: LinearCombination, b: LinearCombination):
        one = LinearCombination(1)
        self.enforce(a, one, b)

    def is_satisfied(self) -> bool:
        for a, b, c in self.constraints:
            if self.value_of(a) * self.value_of(b) % R != self.value_of(c):
                return False
        return True

    @property
    def num_constraints(self):
        return len(self.constraints)

    @property
    def num_public(self):
        return len(self.public)

    @property
    def num_private(self):
        return len(self.private)

    # -- eject (circuit.rs eject_assignment_and_reset analog) --
    def to_synthesizer(self) -> "BuilderSynthesizer":
        return BuilderSynthesizer(self)


class BuilderSynthesizer(r1cs.ConstraintSynthesizer):
    """Replays a built circuit into a prover ConstraintSystem
    (Assignment::generate_constraints semantics, assignment.rs:163)."""

    def __init__(self, builder: CircuitBuilder):
        self.builder = builder

    def generate_constraints(self, cs: r1cs.ConstraintSystem):
        b = self.builder
        pub_vars = [cs.one]
        for v in b.public[1:]:
            pub_vars.append(cs.alloc_input(v))
        priv_vars = [cs.alloc(v) for v in b.private]

        def conv(lc: LinearCombination):
            out = []
            if lc.constant:
                out.append((lc.constant, cs.one))
            for (kind, idx), coeff in lc.terms.items():
                var = pub_vars[idx] if kind == "public" else priv_vars[idx]
                out.append((coeff, var))
            return out

        for a, b_, c in b.constraints:
            cs.enforce(conv(a), conv(b_), conv(c))
