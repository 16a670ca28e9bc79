"""R1CS constraint-system representation (prover side).

Mirrors algorithms/src/r1cs + snark/varuna/ahp/{prover,indexer}/
constraint_system.rs behavior: matrices as per-row sparse (coeff, column)
lists with public columns first, `format_public_input` = [1, inputs...],
and the indexer/prover padding rules (matrices.rs).
"""
from __future__ import annotations

from ..params import bls12_377 as P

R = P.R


class ConstraintSystem:
    """Collects A/B/C rows over variables [1, public..., private...]."""

    def __init__(self):
        self.public = [1]        # variable 0 is the constant one
        self.private = []
        self.a = []              # rows: list[(coeff, ('public'|'private', idx))]
        self.b = []
        self.c = []

    # -- allocation --
    def alloc_input(self, value: int) -> tuple:
        self.public.append(value % R)
        return ("public", len(self.public) - 1)

    def alloc(self, value: int) -> tuple:
        self.private.append(value % R)
        return ("private", len(self.private) - 1)

    @property
    def one(self):
        return ("public", 0)

    def enforce(self, a_lc, b_lc, c_lc):
        """Each lc: list of (coeff, var)."""
        self.a.append(list(a_lc))
        self.b.append(list(b_lc))
        self.c.append(list(c_lc))

    @property
    def num_constraints(self):
        return len(self.a)

    @property
    def num_public(self):
        return len(self.public)

    @property
    def num_private(self):
        return len(self.private)

    # -- padding (matrices.rs) --
    def pad_input_to_power_of_two(self):
        n = self.num_public
        size = 1 << max(0, (n - 1)).bit_length() if n > 1 else 1
        for _ in range(size - n):
            self.alloc_input(0)

    def add_randomizing_variables(self, assignments=None):
        """ZK padding: 3 variables with a*b=c constraint (matrices.rs:47)."""
        vals = assignments if assignments is not None else [1, 1, 1]
        vs = [self.alloc(v) for v in vals]
        self.enforce([(1, vs[0])], [(1, vs[1])], [(1, vs[2])])

    def to_matrices(self):
        """Resolve columns: public i -> i, private i -> num_public + i.
        Returns (a, b, c) with rows as sorted [(coeff, col)] lists,
        duplicate columns merged (into_matrix_helper semantics)."""
        np_ = self.num_public

        def conv(rows):
            out = []
            for row in rows:
                m = {}
                for coeff, (kind, idx) in row:
                    col = idx if kind == "public" else np_ + idx
                    m[col] = (m.get(col, 0) + coeff) % R
                out.append(sorted(((v, k) for k, v in m.items() if v != 0), key=lambda t: t[1]))
            return out

        return conv(self.a), conv(self.b), conv(self.c)

    def full_assignment(self):
        return self.public + self.private


def format_public_input(public_input):
    """[1] ++ inputs (prover/constraint_system.rs:40)."""
    return [1] + [x % R for x in public_input]


def num_non_zero(matrix):
    return sum(len(row) for row in matrix)


class ConstraintSynthesizer:
    """Base: subclasses implement generate_constraints(cs)."""

    def generate_constraints(self, cs: ConstraintSystem):
        raise NotImplementedError
