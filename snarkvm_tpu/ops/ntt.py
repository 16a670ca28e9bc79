"""Radix-2 NTT over BLS12-377 Fr (and any FpSpec field) — TPU batched path.

Replaces the reference's EvaluationDomain FFT (algorithms/src/fft/domain.rs:83,
CUDA dispatch at domain.rs:374-378) with a fully vectorized JAX pipeline:

  * Decimation-in-time butterflies expressed as whole-array reshapes +
    batched Montgomery muls (VPU), one dispatch per stage — no scalar loops.
  * Twiddle planes precomputed host-side per domain size and cached
    (Montgomery form), analogous to FFTPrecomputation (domain.rs:883).
  * Natural-order input/output, coset shift = multiplicative generator —
    matching reference conventions exactly, verified in tests vs an O(n^2)
    golden evaluation.

The multi-chip stage-exchange variant lives in snarkvm_tpu.parallel.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.limb import FpSpec, FR


def _use_unrolled() -> bool:
    """Unrolled limb chains on accelerators (single-pass fusion); rolled
    loops on CPU where compile time dominates unit tests."""
    import os
    mode = os.environ.get("SNARKVM_TPU_UNROLL", "auto")
    if mode in ("1", "true"):
        return True
    if mode in ("0", "false"):
        return False
    return jax.default_backend() != "cpu"


class Domain:
    """Multiplicative subgroup domain of power-of-two size n (cf. EvaluationDomain)."""

    def __init__(self, n: int, spec: FpSpec = FR, two_adic_root: int | None = None,
                 two_adicity: int | None = None, generator: int | None = None):
        assert n & (n - 1) == 0 and n >= 1
        from ..params import bls12_377 as P

        if spec is FR:
            two_adic_root = P.FR_TWO_ADIC_ROOT_OF_UNITY
            two_adicity = P.FR_TWO_ADICITY
            generator = P.FR_GENERATOR
        elif two_adic_root is None:
            raise ValueError("need root for non-Fr spec")
        assert n <= (1 << two_adicity)
        self.n = n
        self.log_n = n.bit_length() - 1
        self.spec = spec
        p = spec.p
        # group_gen = two_adic_root ^ (2^adicity / n)  (get_root_of_unity semantics)
        self.group_gen = pow(two_adic_root, (1 << two_adicity) // n, p)
        self.group_gen_inv = pow(self.group_gen, -1, p)
        self.generator = generator % p
        self.generator_inv = pow(self.generator, -1, p)
        self.size_inv = pow(n, -1, p)
        assert pow(self.group_gen, n, p) == 1

    # ---- host-side precompute (cached numpy constants) ----
    @functools.cached_property
    def _bitrev(self) -> np.ndarray:
        lb = self.log_n
        idx = np.arange(self.n)
        rev = np.zeros(self.n, dtype=np.int32)
        for b in range(lb):
            rev |= ((idx >> b) & 1) << (lb - 1 - b)
        return rev

    def _twiddles(self, root: int):
        """Per-stage twiddle planes in Montgomery form: stage s (1-indexed,
        block size 2^s) needs w_n^(n/2^s * k) for k < 2^(s-1) — every
        stage is a strided slice of the full power plane of `root`."""
        full = self._full_power_plane(root)
        out = []
        for s in range(1, self.log_n + 1):
            half = 1 << (s - 1)
            out.append(np.ascontiguousarray(full[:: self.n >> s][:half]))
        return out

    def _full_power_plane(self, root: int):
        """[n, L] Montgomery limb plane of root^i — C fast path when the
        spec is Fr (csrc fr_powers_mont16; the Python bigint loop costs
        ~77 s at n = 2^22), Python fallback otherwise."""
        if self.spec is FR and self.spec.L == 16:
            from ..utils import native
            if native.fr_available():
                return native.fr_powers_mont16_np(root, 1, self.n)
        return np.asarray(self._power_plane_py(root, 1))

    @functools.cached_property
    def _fwd_twiddles(self):
        return self._twiddles(self.group_gen)

    @functools.cached_property
    def _inv_twiddles(self):
        return self._twiddles(self.group_gen_inv)

    @functools.cached_property
    def _coset_powers(self):
        return np.asarray(self._power_plane(self.generator, 1))

    @functools.cached_property
    def _coset_inv_powers_scaled(self):
        """generator_inv^i * n^-1 (fused coset-ifft post-scale, cf. domain.rs:442)."""
        return np.asarray(self._power_plane(self.generator_inv, self.size_inv))

    @functools.cached_property
    def _coset_inv_powers_only(self):
        """generator_inv^i WITHOUT the n^-1 factor (the fused-engine ifft
        already folds n^-1 into its leaf DFT scale)."""
        return np.asarray(self._power_plane(self.generator_inv, 1))

    @functools.cached_property
    def _size_inv_mont(self):
        return limb.int_to_limbs_py(self.size_inv * self.spec.R % self.spec.p, self.spec.L)

    def _power_plane(self, g: int, c: int):
        if self.spec is FR and self.spec.L == 16:
            from ..utils import native
            if native.fr_available():
                return native.fr_powers_mont16_np(g, c, self.n)
        return self._power_plane_py(g, c)

    def _power_plane_py(self, g: int, c: int):
        p, R, L = self.spec.p, self.spec.R, self.spec.L
        vals = [c % p] * self.n
        for i in range(1, self.n):
            vals[i] = vals[i - 1] * g % p
        return np.stack([limb.int_to_limbs_py(x * R % p, L) for x in vals])

    def elements(self):
        """Domain elements 1, w, w^2, ... as Python ints."""
        p = self.spec.p
        out = [1] * self.n
        for i in range(1, self.n):
            out[i] = out[i - 1] * self.group_gen % p
        return out

    # ---- device transforms (x: Montgomery limbs [n, L] or [..., n, L]) ----
    def _core(self, x, twiddles):
        spec = self.spec
        n, L = self.n, spec.L
        if _use_unrolled():
            # accelerators: fully unrolled limb chains fuse into one pass/stage
            mul, add_, sub_ = limb._mont_mul_unrolled, limb._add_unrolled, limb._sub_unrolled
        else:
            # CPU tests: compact rolled graphs compile fast
            mul, add_, sub_ = limb.mont_mul, limb.add, limb.sub
        x = jnp.take(x, jnp.asarray(self._bitrev), axis=-2)
        for s in range(1, self.log_n + 1):
            half = 1 << (s - 1)
            blocks = n >> s
            xr = x.reshape(x.shape[:-2] + (blocks, 2, half, L))
            even = xr[..., 0, :, :]
            odd = mul(xr[..., 1, :, :], jnp.asarray(twiddles[s - 1]), spec)
            top = add_(even, odd, spec)
            bot = sub_(even, odd, spec)
            x = jnp.concatenate([top[..., None, :, :], bot[..., None, :, :]], axis=-3)
            x = x.reshape(x.shape[:-4] + (n, L))
        return x

    @functools.cached_property
    def _use_fused(self) -> bool:
        """Dispatch DPoly/Varuna transforms to the fused constant-geometry
        Pallas engine (ops/ntt_fused_plan.py, 2.5x the per-stage butterfly
        network) on TPU for Fr domains of >= 2^10 points."""
        import os
        return (self.spec.name == "fr" and self.n >= 1024
                and jax.default_backend() != "cpu"
                and os.environ.get("SNARKVM_TPU_NTT", "fused") == "fused")

    # ---- constant planes as ARGUMENTS --------------------------------------
    # Closure-captured device/numpy arrays lower as inline HLO constants;
    # at a 2^21 domain the fused plan's twiddle tensors alone are ~134MB of
    # module, which the axon remote-compile tunnel rejects (HTTP 413) and
    # which bloats every compile. All big per-domain tensors therefore ride
    # as jit arguments: Domain.fft/ifft pass them at call time, and the
    # fused Varuna round functions (snark/dround.py) thread them through
    # their own jit boundaries via {fft,ifft,...}_tensors() + apply_with().

    def _fused_plan(self, inverse: bool):
        from .ntt_fused_plan import FusedPlanML
        key = "_fused_plan_inv" if inverse else "_fused_plan_fwd"
        plan = getattr(self, key, None)
        if plan is None:
            plan = FusedPlanML(
                self.n, self.group_gen_inv if inverse else self.group_gen,
                inverse)
            setattr(self, key, plan)
        return plan

    def _plan_tensors(self, inverse: bool):
        cache = getattr(self, "_plan_tensor_cache", None)
        if cache is None:
            cache = self._plan_tensor_cache = {}
        if inverse not in cache:
            cache[inverse] = self._fused_plan(inverse)._consts()
        return cache[inverse]

    def fft_tensors(self):
        return self._plan_tensors(False) if self._use_fused else None

    def ifft_tensors(self):
        return self._plan_tensors(True) if self._use_fused else None

    def coset_fft_tensors(self):
        if not self._use_fused:
            return None
        return (jnp.asarray(self._coset_powers),) + self._plan_tensors(False)

    def coset_ifft_tensors(self):
        if not self._use_fused:
            return None
        return self._plan_tensors(True) + \
            (jnp.asarray(self._coset_inv_powers_only),)

    def _apply_fused(self, x, tensors, inverse: bool):
        posts, perm = tensors
        plan = self._fused_plan(inverse)
        return plan._run(jnp.swapaxes(x, -1, -2), posts,
                         perm).swapaxes(-1, -2)

    def apply_with(self, kind: str, x, tensors):
        """Traceable transform with the constant planes passed in.
        kind in {fft, ifft, coset_fft, coset_ifft}. tensors=None (CPU /
        small domains / non-fused) falls back to the closure-constant
        butterfly network — fine there, the planes are small."""
        if tensors is None or x.ndim != 2:
            if kind == "fft":
                return self._core(x, self._fwd_twiddles)
            if kind == "ifft":
                y = self._core(x, self._inv_twiddles)
                sinv = jnp.asarray(self._size_inv_mont)
                return limb.mont_mul(y, jnp.broadcast_to(sinv, y.shape),
                                     self.spec)
            if kind == "coset_fft":
                shifted = limb.mont_mul(x, jnp.asarray(self._coset_powers),
                                        self.spec)
                return self._core(shifted, self._fwd_twiddles)
            if kind == "coset_ifft":
                y = self._core(x, self._inv_twiddles)
                return limb.mont_mul(
                    y, jnp.asarray(self._coset_inv_powers_scaled), self.spec)
            raise ValueError(kind)
        if kind == "fft":
            return self._apply_fused(x, tensors, False)
        if kind == "ifft":
            return self._apply_fused(x, tensors, True)
        if kind == "coset_fft":
            shifted = limb.mont_mul(x, tensors[0], self.spec)
            return self._apply_fused(shifted, tensors[1:], False)
        if kind == "coset_ifft":
            # fused ifft already applies n^-1; scale by generator powers
            # WITHOUT the extra n^-1 (it is folded into the plan)
            y = self._apply_fused(x, tensors[:-1], True)
            return limb.mont_mul(y, tensors[-1], self.spec)
        raise ValueError(kind)

    @functools.cached_property
    def _jitted(self):
        # materialize all host-side constants eagerly (outside any trace)
        self._bitrev, self._fwd_twiddles, self._inv_twiddles
        self._coset_powers, self._coset_inv_powers_scaled, self._size_inv_mont
        return {k: jax.jit(functools.partial(self.apply_with, k))
                for k in ("fft", "ifft", "coset_fft", "coset_ifft")}

    def fft(self, coeffs):
        """coeffs (Mont limbs [..., n, L]) -> evals over the domain (natural order)."""
        return self._jitted["fft"](coeffs, self.fft_tensors())

    def ifft(self, evals):
        return self._jitted["ifft"](evals, self.ifft_tensors())

    def coset_fft(self, coeffs):
        return self._jitted["coset_fft"](coeffs, self.coset_fft_tensors())

    def coset_ifft(self, evals):
        return self._jitted["coset_ifft"](evals, self.coset_ifft_tensors())


# ---------------------------------------------------------------------------
# Python-int golden model (small n, used by tests and host-side Varuna checks)
# ---------------------------------------------------------------------------

def ntt_py(coeffs, domain: Domain):
    """Direct O(n^2) evaluation: evals[j] = sum_i c_i * g^(ij). Golden reference."""
    p = domain.spec.p
    n = domain.n
    g = domain.group_gen
    out = []
    wj = 1
    for _ in range(n):
        acc, x = 0, 1
        for c in coeffs:
            acc = (acc + c * x) % p
            x = x * wj % p
        out.append(acc)
        wj = wj * g % p
    return out
