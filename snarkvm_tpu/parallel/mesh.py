"""Multi-chip parallelism: the TPU replacement for the reference's
parallelism inventory (SURVEY.md §2.8):

  P1 rayon loops        -> batched/vmapped kernels (implicit, everywhere)
  P2 CUDA offload       -> the limb-plane kernels in ops/ on each chip
  P4 batch proving      -> instance-batch data parallelism (leading dims)
  scale-out (new)       -> shard_map over a jax Mesh:
       * distributed four-step NTT: local column FFTs + all_to_all
         stage exchange over ICI + local row FFTs (the "sequence
         parallelism" of polynomial domains, SURVEY.md §5.7)
       * sharded Pippenger MSM: points partitioned per chip, per-window
         partial sums combined with an all_gather + EC-add fold
         (EC addition is not a ring sum, so psum does not apply).

All functions work on any mesh — real ICI-connected TPU chips or the
8-virtual-device CPU mesh used by tests and the driver's dryrun.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
# jax >= 0.8 moved shard_map to the top level and renamed check_rep to
# check_vma (same semantics for our use: disable the replication check
# on EC limb planes, which shard_map cannot infer through fori bodies)
from jax import shard_map

from ..fields import limb
from ..fields.limb import FR, FQ
from ..ops.ntt import Domain
from ..ops import ec, msm


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# Distributed four-step NTT
# ---------------------------------------------------------------------------

class DistributedNTT:
    """Four-step NTT of size n = n1*n2 over a 1-D mesh.

    Layout: coeffs viewed as M[k1, k2] (row-major reshape of the
    coefficient vector, k = k2 + n2*k1).
      step 1: size-n1 FFTs along k1 (columns sharded over the mesh)
      step 2: twiddle multiply by w_n^(j1*k2)
      step 3: all_to_all re-shard from columns to rows (ICI exchange)
      step 4: size-n2 FFTs along k2
    Output: evals in natural order [n, L], sharded over the mesh.
    """

    def __init__(self, n1: int, n2: int, mesh: Mesh, axis: str = "x"):
        self.n1, self.n2, self.n = n1, n2, n1 * n2
        self.mesh = mesh
        self.axis = axis
        self.d1 = Domain(n1)
        self.d2 = Domain(n2)
        self.big = Domain(self.n)
        # twiddle plane w_n^(j1*k2) [n1, n2] in Montgomery form (host precompute)
        p = FR.p
        w = self.big.group_gen
        rows = []
        wj1 = 1
        for j1 in range(n1):
            row = [1] * n2
            for k2 in range(1, n2):
                row[k2] = row[k2 - 1] * wj1 % p
            rows.append(row)
            wj1 = wj1 * w % p
        flat = [x * FR.R % p for row in rows for x in row]
        self.twiddle = np.stack([limb.int_to_limbs_py(x, FR.L) for x in flat]).reshape(n1, n2, FR.L)

    @functools.cached_property
    def _fn(self):
        n1, n2, L = self.n1, self.n2, FR.L
        ax = self.axis
        d1, d2 = self.d1, self.d2
        tw_full = jnp.asarray(self.twiddle)

        def step(m_local, tw_local):
            # m_local: [n1, n2/D, L] (columns local), tw_local same sharding
            cols = jnp.moveaxis(m_local, 0, -3)  # already [n1, cols, L] -> treat axis0 as transform dim
            # FFT along axis 0 (k1): arrange [cols, n1, L]
            a = jnp.swapaxes(m_local, 0, 1)               # [n2/D, n1, L]
            a = d1.fft(a)                                  # size-n1 FFTs
            a = jnp.swapaxes(a, 0, 1)                      # [n1, n2/D, L]
            b = limb.mont_mul(a, tw_local, FR)             # twiddle
            # re-shard: rows local. all_to_all splits axis 0, concats axis 1.
            c = jax.lax.all_to_all(b, ax, split_axis=0, concat_axis=1, tiled=True)
            # c: [n1/D, n2, L]; FFT along axis 1 (k2)
            out = d2.fft(c)                                # [n1/D, n2, L]
            return out

        fn = shard_map(
            step,
            mesh=self.mesh,
            in_specs=(P(None, ax), P(None, ax)),
            out_specs=P(ax, None),
            check_vma=False,
        )
        return jax.jit(lambda m: fn(m, tw_full))

    def fft(self, coeffs):
        """coeffs: [n, L] Montgomery limbs -> evals [n, L] natural order.
        Result rows C[j1, j2]; natural order X[j1 + n1*j2] = C[j1][j2] means
        the flat output is C transposed."""
        m = coeffs.reshape(self.n1, self.n2, FR.L)
        c = self._fn(m)                                    # [n1, n2, L] (sharded rows)
        return jnp.swapaxes(c, 0, 1).reshape(self.n, FR.L)

    # -- inverse: iNTT(e)[k] = (1/n) sum_j e[j] w^{-jk} is itself a
    #    four-step transform with the inverse generator; d1.ifft/d2.ifft
    #    carry the 1/n1 and 1/n2 scales (product = 1/n) --

    @functools.cached_property
    def _inv_twiddle(self):
        p = FR.p
        winv = pow(self.big.group_gen, p - 2, p)
        rows = []
        wj1 = 1
        for j1 in range(self.n1):
            row = [1] * self.n2
            for k2 in range(1, self.n2):
                row[k2] = row[k2 - 1] * wj1 % p
            rows.append(row)
            wj1 = wj1 * winv % p
        flat = [x * FR.R % p for row in rows for x in row]
        return np.stack([limb.int_to_limbs_py(x, FR.L)
                         for x in flat]).reshape(self.n1, self.n2, FR.L)

    @functools.cached_property
    def _ifn(self):
        ax = self.axis
        d1, d2 = self.d1, self.d2
        tw_full = jnp.asarray(self._inv_twiddle)

        def step(m_local, tw_local):
            a = jnp.swapaxes(m_local, 0, 1)               # [n2/D, n1, L]
            a = d1.ifft(a)                                 # inverse size-n1
            a = jnp.swapaxes(a, 0, 1)                      # [n1, n2/D, L]
            b = limb.mont_mul(a, tw_local, FR)
            c = jax.lax.all_to_all(b, ax, split_axis=0, concat_axis=1,
                                   tiled=True)
            return d2.ifft(c)                              # [n1/D, n2, L]

        fn = shard_map(
            step, mesh=self.mesh,
            in_specs=(P(None, ax), P(None, ax)),
            out_specs=P(ax, None), check_vma=False)
        return jax.jit(lambda m: fn(m, tw_full))

    def ifft(self, evals):
        """evals [n, L] natural order -> coeffs [n, L]. The same
        four-step with the inverse generator; input/output transposes
        mirror fft() (the inverse transform reads the forward's natural
        order directly as its own row-major input)."""
        m = evals.reshape(self.n1, self.n2, FR.L)
        c = self._ifn(m)
        return jnp.swapaxes(c, 0, 1).reshape(self.n, FR.L)


# ---------------------------------------------------------------------------
# Domain-sharded prover round (VERDICT r4 #7): the round-2 rowcheck with
# every polynomial transform running as a distributed four-step NTT
# ---------------------------------------------------------------------------

class ShardedRowcheck:
    """Varuna round-2 rowcheck (dround._rowcheck_fn math) with the
    polynomial domain sharded over the mesh:

        h_0 = ((z_A z_B - z_C) * mult) / (x^cd - 1)

    3 size-cd iNTTs + 3 size-2cd NTTs + pointwise + 1 size-2cd iNTT,
    ALL as DistributedNTT four-step transforms (all_to_all over ICI);
    the pointwise multiply/subtract runs on the sharded evaluation
    planes. Bit-exact vs dround.rowcheck_contrib (test_parallel.py)."""

    def __init__(self, mesh: Mesh, cd: int, axis: str = "x"):
        self.cd = cd
        D = mesh.shape[axis]
        import math

        def split(n):
            n1 = 1 << (n.bit_length() - 1).__floordiv__(2)
            while n1 % D or (n // n1) % D:
                n1 <<= 1
                if n1 > n:
                    raise ValueError(f"cannot split {n} over {D} devices")
            return n1, n // n1

        n1, n2 = split(cd)
        m1, m2 = split(2 * cd)
        self.small = DistributedNTT(n1, n2, mesh, axis)
        self.big = DistributedNTT(m1, m2, mesh, axis)

    def __call__(self, za_e, zb_e, zc_e, mult_m):
        from ..snark.dround import (_divide_vanishing_plane, _pad_to,
                                    _scale_plane)
        cd = self.cd
        za_c = self.small.ifft(za_e)
        zb_c = self.small.ifft(zb_e)
        zc_c = self.small.ifft(zc_e)
        A = self.big.fft(_pad_to(za_c, 2 * cd))
        B = self.big.fft(_pad_to(zb_c, 2 * cd))
        C = self.big.fft(_pad_to(zc_c, 2 * cd))
        rc = limb._sub(limb.mont_mul(A, B, FR), C, FR)
        coeffs = self.big.ifft(rc)
        q, _ = _divide_vanishing_plane(coeffs, cd)
        return _scale_plane(q, mult_m)


# ---------------------------------------------------------------------------
# Sharded MSM
# ---------------------------------------------------------------------------

def sharded_msm_g1(mesh: Mesh, c: int, num_bits: int, axis: str = "x"):
    """Returns a jitted fn(points, scalar_limbs) -> G1 Jacobian point (shape []).

    Points/scalars are sharded along the mesh; each chip runs local
    Pippenger window accumulation; per-window partial sums cross ICI via
    all_gather and are folded with EC adds; window combination is
    replicated (tiny)."""
    windows = (num_bits + c - 1) // c
    ax = axis

    def local(points, scalars):
        sums = msm._bucket_windows(points, scalars, c, windows, ec.g1_add, ec.g1_neg, ec.g1_infinity)
        # sums: leading dim = windows. gather over chips: [D, windows, ...]
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, ax, axis=0), sums
        )
        ndev = mesh.shape[ax]
        acc = jax.tree_util.tree_map(lambda x: x[0], gathered)
        for d in range(1, ndev):
            acc = ec.g1_add(acc, jax.tree_util.tree_map(lambda x: x[d], gathered))
        return acc

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=({"X": P(ax), "Y": P(ax), "Z": P(ax)}, P(ax)),
        out_specs={"X": P(), "Y": P(), "Z": P()},
        check_vma=False,
    )

    @jax.jit
    def run(points, scalar_limbs):
        # window combination inside the SAME jit as a lax.scan (eagerly
        # it was ~w*c sequential dispatches; unrolled it bloats compile)
        sums = fn(points, scalar_limbs)           # [windows, ...] replicated

        def step(total, s):
            for _ in range(c):                     # c is small + static
                total = ec.g1_double(total)
            return ec.g1_add(total, s), 0

        init = msm._index(sums, windows - 1)
        rest = jax.tree_util.tree_map(
            lambda x: x[windows - 2::-1] if windows > 1 else x[:0], sums)
        total, _ = jax.lax.scan(step, init, rest)
        return total

    return run


# ---------------------------------------------------------------------------
# Instance-batch data parallelism (the "batch proving" axis, P4)
# ---------------------------------------------------------------------------

def batch_parallel_ntt(mesh: Mesh, domain: Domain, axis: str = "x"):
    """Shard a batch of polynomials across chips; local NTTs, no comms."""
    ax = axis

    def local(batch):
        return domain.fft(batch)

    return jax.jit(
        shard_map(local, mesh=mesh, in_specs=P(ax, None, None), out_specs=P(ax, None, None), check_vma=False)
    )


def witness_polys_mesh(mesh: Mesh, jobs, vd: int, idd: int, axis: str = "x"):
    """Instance-DP for Varuna's first prover round (the reference's
    batch-proving scale axis, varuna.rs:336 / SURVEY §2.8 P4): the
    per-instance witness-polynomial pipeline (x-poly NTT -> off-coset
    witness combine -> iNTT) runs with the INSTANCE batch sharded over
    the mesh. Bit-exact vs the single-device path (same kernels, same
    data — only the batch placement differs).

    jobs: [(private_vals, x_poly_coeffs)] — all instances of one circuit
    (shared vd/idd). Returns one DPoly per job (pre-vanishing-division),
    exactly what dround.witness_poly_device yields per instance.
    """
    from ..snark.dround import _witness_maps
    from ..snark.dpoly import DPoly, _ints_to_mont

    D = mesh.shape[axis]
    d = Domain(vd)
    d._jitted
    mask, src = _witness_maps(vd, idd)

    w_ext, x_planes = [], []
    for private_vals, x_coeffs in jobs:
        pv = list(private_vals)
        w_ext.append(_ints_to_mont(pv + [0] * (vd - idd - len(pv))))
        xc = list(x_coeffs)
        x_planes.append(_ints_to_mont(xc + [0] * (vd - len(xc))))
    b = len(jobs)
    pad = (-b) % D
    for _ in range(pad):                 # shard_map needs D | batch
        w_ext.append(w_ext[-1])
        x_planes.append(x_planes[-1])
    w_ext = jnp.stack(w_ext)
    x_planes = jnp.stack(x_planes)

    def local(xp, we):
        x_evals = d.fft(xp)              # [b/D, vd, L]
        wg = jnp.take(we, src, axis=1)
        w_evals = jnp.where(mask[None, :, None], limb._sub(wg, x_evals, FR),
                            jnp.zeros_like(wg))
        return d.ifft(w_evals)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None, None), check_vma=False))
    coeffs = fn(x_planes, w_ext)
    return [DPoly.from_mont_plane(coeffs[i], vd) for i in range(b)]
