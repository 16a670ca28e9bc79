"""KZG10 + SonicKZG10 polynomial commitment (host orchestration).

Behavioral mirror of algorithms/src/polycommit/{kzg10,sonic_pc}:
  * commit: MSM of coefficients over powers of beta (shifted powers for
    degree-bounded polys); hiding via a blinding polynomial against
    powers of beta*gamma.
  * open: witness poly (p(X) - p(z))/(X - z), committed over the powers.
  * sonic batch_open: per query point, sponge-squeezed 168-bit challenges
    combine polynomials; one KZG proof per point.
  * batch_check: accumulate commitments per degree bound + witnesses with
    a running randomizer, finish with one multi-pairing product.

The SRS here is a locally generated test SRS (known beta); the loader for
Aleo's shipped .usrs artifacts plugs into the same PowersOfBeta interface.
"""
from __future__ import annotations

import functools
import hashlib

from ..params import bls12_377 as P
from ..curves import sw_fast as g1
from ..curves import sw, pairing
from ..utils import native
from ..fields.scalar import Fq, Fq2
from ..snark.poly import Poly

R = P.R


def _msm(bases, scalars):
    """Native C Pippenger when available (utils/native.py), Python fallback.
    Used for every size: the Python Pippenger pays a fixed ~2^14 bucket
    adds even for tiny inputs, so small commits (masks, single openings)
    must not fall through to it."""
    if native.available():
        out = native.msm_g1(list(bases), [s % R for s in scalars])
        if out is not None:
            return out
    return g1.msm(list(bases), [s % R for s in scalars])


# ---------------------------------------------------------------------------
# Device (TPU) MSM dispatch — the analog of the reference's opportunistic
# CUDA offload with CPU fallback (algorithms/src/msm/variable_base/mod.rs:36).
# SRS base planes are uploaded to HBM once per SRS object and sliced per
# call; scalars ride as packed limb rows.
# ---------------------------------------------------------------------------

import os as _os
import weakref as _weakref

_DEVICE_SRS_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def _device_msm_min() -> int:
    # multi-set batching amortizes the dispatch: device wins from ~2^13
    return int(_os.environ.get("SNARKVM_TPU_DEVICE_MSM_MIN", str(1 << 13)))


def _device_msm_enabled() -> bool:
    mode = _os.environ.get("SNARKVM_TPU_DEVICE_MSM", "auto")
    if mode == "off":
        return False
    try:
        import jax
        return jax.default_backend() != "cpu" or mode == "always"
    except Exception:
        return False


def _device_planes(srs, kind: str):
    """Upload (once) the full base-point plane for this SRS + kind."""
    from ..ops import ec_pallas as ep
    planes = _DEVICE_SRS_CACHE.setdefault(srs, {})
    if kind not in planes:
        pts = (srs.powers_of_beta_g if kind == "beta"
               else srs.powers_of_beta_times_gamma_g)
        planes[kind] = (ep.g1_from_affine_lm_fast(list(pts)), len(pts))
    return planes[kind]


def _plane_window(srs, kind: str, shift: int, lanes: int):
    from ..ops import ec_pallas as ep
    import jax.numpy as jnp
    plane, total = _device_planes(srs, kind)
    window = {k: v[:, shift : min(shift + lanes, total)]
              for k, v in plane.items()}
    cur = window["X"].shape[1]
    if cur < lanes:
        window = {k: jnp.pad(v, ((0, 0), (0, lanes - cur)))
                  for k, v in window.items()}
        window = ep._mask_identity(window, jnp.arange(lanes) < cur)
    return window


def _msm_srs_dpoly(srs, kind: str, shift: int, dp):
    """Commit MSM straight from a DPoly's Montgomery plane: de-Montgomery
    on device, no host int round-trip."""
    from ..ops import ec_pallas as ep
    from ..snark import dpoly as dpoly_mod
    import jax
    from ..fields import limb as limb_mod
    n = dp.n
    npad = 1 << (n - 1).bit_length()
    lanes = max(ep.LANE, npad)
    window = _plane_window(srs, kind, shift, lanes)
    from_mont = jax.jit(lambda a: limb_mod._from_mont(a, limb_mod.FR))
    sl = from_mont(dp._padded(npad))
    return ep.msm_g1_lm(window, sl, npad)


def _msm_srs(srs, kind: str, shift: int, scalars):
    """MSM over srs powers[shift : shift+len(scalars)] — device when large
    enough, host C otherwise. Falls back to host on ANY device error."""
    n = len(scalars)
    if n >= _device_msm_min() and _device_msm_enabled():
        try:
            from ..ops import ec_pallas as ep
            import jax.numpy as jnp
            plane, total = _device_planes(srs, kind)
            assert shift + n <= total
            # pad to the next power of two so every commit in a proof
            # shares a handful of compiled MSM shapes (zero scalars land
            # in bucket 0 and are skipped — free)
            npad = 1 << (n - 1).bit_length()
            lanes = max(ep.LANE, npad)
            window = {k: v[:, shift : min(shift + lanes, total)]
                      for k, v in plane.items()}
            cur = window["X"].shape[1]
            if cur < lanes:
                window = {k: jnp.pad(v, ((0, 0), (0, lanes - cur)))
                          for k, v in window.items()}
                window = ep._mask_identity(window, jnp.arange(lanes) < cur)
            scalars = [s % R for s in scalars] + [0] * (npad - n)
            sl = ep.scalars_to_limbs(scalars)
            return ep.msm_g1_lm(window, sl, npad)
        except Exception:
            pass
    pts = (srs.powers_of_beta_g if kind == "beta"
           else srs.powers_of_beta_times_gamma_g)
    return _msm(pts[shift : shift + n], scalars)


class UniversalSRS:
    """Test SRS with known beta (deterministic from a seed)."""

    def __init__(self, max_degree: int, seed: bytes = b"snarkvm-tpu-test-srs"):
        self.max_degree = max_degree
        h = hashlib.sha256(seed).digest()
        self.beta = int.from_bytes(h, "little") % R
        self.gamma = int.from_bytes(hashlib.sha256(seed + b"/gamma").digest(), "little") % R
        g = (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)
        self.g = g
        # powers_of_beta_g[i] = beta^i * G (affine int tuples)
        pows = []
        acc = g1.from_affine(g)
        cur = 1
        for _ in range(max_degree + 1):
            pows.append(cur)
            cur = cur * self.beta % R
        self.powers_of_beta = pows  # scalars; points computed lazily in batch
        self._powers_g = None
        self._gamma_powers_g = None
        # G2 side
        self.h = (sw.G2.generator[0], sw.G2.generator[1])
        self.beta_h = sw.G2.mul(self.h, self.beta)

    def _powers_for(self, scalars):
        jac = native.batch_scalar_mul(self.g, scalars) if native.available() else None
        if jac is not None:
            return g1.batch_to_affine(jac)
        gj = g1.from_affine(self.g)
        return g1.batch_to_affine([g1.mul_int(gj, s) for s in scalars])

    @property
    def powers_of_beta_g(self):
        if self._powers_g is None:
            self._powers_g = self._powers_for(self.powers_of_beta)
        return self._powers_g

    @property
    def powers_of_beta_times_gamma_g(self):
        if self._gamma_powers_g is None:
            self._gamma_powers_g = self._powers_for(
                [s * self.gamma % R for s in self.powers_of_beta])
        return self._gamma_powers_g

    @functools.lru_cache(maxsize=None)
    def neg_power_of_beta_h(self, degree_bound: int):
        """h^(beta^-(max_degree - degree_bound)) for the degree-bound pairing."""
        shift = self.max_degree - degree_bound
        beta_inv_pow = pow(pow(self.beta, -1, R), shift, R)
        return sw.G2.mul(self.h, beta_inv_pow)


@functools.lru_cache(maxsize=8)
def test_srs(max_degree: int) -> UniversalSRS:
    return UniversalSRS(max_degree)


_DEV_SRS = {}


def dev_srs(max_degree: int = 1 << 17) -> UniversalSRS:
    """Process-cached dev SRS — the default proof-carrying posture's
    universal parameters (VM/Ledger srs='dev'). 2^17 covers the
    credits.aleo fee circuit and typical package functions."""
    if max_degree not in _DEV_SRS:
        _DEV_SRS[max_degree] = UniversalSRS(max_degree)
    return _DEV_SRS[max_degree]


class LoadedSRS:
    """UniversalSRS backed by on-disk .usrs artifacts — no beta/gamma known,
    only the group elements (the trusted-setup consumption path,
    parameters/src/mainnet/powers.rs:60). Drop-in for the prover/verifier:
    exposes the same surface as UniversalSRS minus the trapdoor scalars.

    Artifact dialect: dense G1 powers + dense gamma powers (the mainnet
    artifacts ship the gamma powers as a sparse BTreeMap keyed by shift;
    we generate our own files via UniversalSRS.save, so dense is used)."""

    def __init__(self, max_degree, g_powers, gamma_powers, h, beta_h, neg_powers):
        self.max_degree = max_degree
        self._powers_g = g_powers
        self._gamma_powers_g = gamma_powers
        self.g = g_powers[0]
        self.h = h
        self.beta_h = beta_h
        self._neg_powers = dict(neg_powers)

    @property
    def powers_of_beta_g(self):
        return self._powers_g

    @property
    def powers_of_beta_times_gamma_g(self):
        return self._gamma_powers_g

    def neg_power_of_beta_h(self, degree_bound: int):
        pt = self._neg_powers.get(degree_bound)
        if pt is None:
            raise KeyError(f"SRS artifact has no neg power for degree bound {degree_bound}")
        return pt

    @classmethod
    def load(cls, directory: str) -> "LoadedSRS":
        import os
        from ..params import srs_io
        from ..fields.scalar import Fq2
        g_powers = srs_io.read_powers_file(os.path.join(directory, "powers-of-beta.usrs"))
        gamma = srs_io.read_powers_file(os.path.join(directory, "powers-of-beta-gamma.usrs"))
        neg = srs_io.read_neg_powers_file(os.path.join(directory, "neg-powers-of-beta.usrs"))
        with open(os.path.join(directory, "beta-h.usrs"), "rb") as f:
            data = f.read()

        def g2(b):
            (x0, x1), (y0, y1) = srs_io.read_g2(b)
            return (Fq2(x0, x1), Fq2(y0, y1))

        h = g2(data[:192])
        beta_h = g2(data[192:384])
        neg = {k: (Fq2(v[0][0], v[0][1]), Fq2(v[1][0], v[1][1]))
               for k, v in neg.items()}
        return cls(len(g_powers) - 1, g_powers, gamma, h, beta_h, neg)


def save_srs(srs: UniversalSRS, directory: str, degree_bounds=()) -> None:
    """Write a UniversalSRS as .usrs artifacts consumable by LoadedSRS
    (beta-h.usrs holds h || beta_h)."""
    import os
    from ..params import srs_io
    os.makedirs(directory, exist_ok=True)
    srs_io.write_powers_file(os.path.join(directory, "powers-of-beta.usrs"),
                             srs.powers_of_beta_g)
    srs_io.write_powers_file(os.path.join(directory, "powers-of-beta-gamma.usrs"),
                             srs.powers_of_beta_times_gamma_g)
    srs_io.write_neg_powers_file(
        os.path.join(directory, "neg-powers-of-beta.usrs"),
        {db: srs.neg_power_of_beta_h(db) for db in degree_bounds})
    with open(os.path.join(directory, "beta-h.usrs"), "wb") as f:
        f.write(srs_io.write_g2(srs.h))
        f.write(srs_io.write_g2(srs.beta_h))


class Randomness:
    """Commitment randomness: a blinding polynomial (empty = non-hiding)."""

    def __init__(self, blinding: Poly | None = None):
        self.blinding = blinding if blinding is not None else Poly.zero()

    @classmethod
    def empty(cls):
        return cls()

    def is_hiding(self):
        return not self.blinding.is_zero()

    @classmethod
    def rand(cls, hiding_degree: int, rng):
        coeffs = [rng.randrange(R) for _ in range(hiding_degree + 1)]
        if all(c == 0 for c in coeffs):
            coeffs[0] = 1
        return cls(Poly(coeffs))

    def add_scaled(self, coeff: int, other: "Randomness"):
        return Randomness(self.blinding + other.blinding.scale(coeff))


def commit(srs: UniversalSRS, poly: Poly, degree_bound: int | None = None,
           hiding_bound: int | None = None, rng=None):
    """KZG10::commit (+ sonic shifted powers). Returns ((x,y)|None affine, Randomness)."""
    shift = (srs.max_degree - degree_bound) if degree_bound is not None else 0
    if (type(poly).__name__ == "DPoly" and poly.n >= _device_msm_min()
            and _device_msm_enabled()):
        try:
            assert shift + poly.n <= srs.max_degree + 1
            comm = _msm_srs_dpoly(srs, "beta", shift, poly)
            randomness = Randomness.empty()
            if hiding_bound is not None:
                assert rng is not None
                randomness = Randomness.rand(hiding_bound, rng)
                comm = g1.jac_add(comm, _msm_srs(srs, "gamma", shift,
                                                 randomness.blinding.c))
            return g1.to_affine(comm), randomness
        except Exception:
            pass
    coeffs = poly.c
    assert shift + len(coeffs) <= srs.max_degree + 1, "polynomial too large for SRS"
    comm = _msm_srs(srs, "beta", shift, coeffs)
    randomness = Randomness.empty()
    if hiding_bound is not None:
        assert rng is not None
        randomness = Randomness.rand(hiding_bound, rng)
        # degree-bounded commits use SHIFTED gamma powers, matching
        # sonic_pc shifted_powers_of_beta_times_gamma_g (mod.rs:80-90)
        comm = g1.jac_add(comm, _msm_srs(srs, "gamma", shift,
                                         randomness.blinding.c))
    return g1.to_affine(comm), randomness


_LAGRANGE_CACHE: dict = {}


def lagrange_basis_points(srs: UniversalSRS, n: int):
    """Lagrange-basis SRS over the size-n domain: L_i(beta)*G for the
    i-th Lagrange polynomial (kzg10/mod.rs:159 commit_lagrange uses
    precomputed `lagrange_bases_at_beta_g`; here they are DERIVED from
    the power points by a group-valued inverse NTT — each butterfly's
    twiddle scaling is an EC scalar mul, so results are cached per
    (srs, n))."""
    key = (id(srs), n)
    if key in _LAGRANGE_CACHE:
        return _LAGRANGE_CACHE[key]
    assert n & (n - 1) == 0 and n - 1 <= srs.max_degree
    from ..snark.poly import domain_params
    w, w_inv, n_inv = domain_params(n)
    pts = [g1.from_affine(p) if p is not None else g1.INF
           for p in srs.powers_of_beta_g[:n]]

    def ec_intt(vals, root_inv):
        m = len(vals)
        if m == 1:
            return vals
        ev = ec_intt(vals[0::2], root_inv * root_inv % R)
        od = ec_intt(vals[1::2], root_inv * root_inv % R)
        out = [None] * m
        tw = 1
        for i in range(m // 2):
            t = g1.mul_int(od[i], tw)
            out[i] = g1.jac_add(ev[i], t)
            out[i + m // 2] = g1.jac_add(ev[i], g1.neg(t))
            tw = tw * root_inv % R
        return out

    basis = [g1.mul_int(p, n_inv) for p in ec_intt(pts, w_inv)]
    basis = [g1.to_affine(b) for b in basis]
    _LAGRANGE_CACHE[key] = basis
    return basis


def commit_lagrange(srs: UniversalSRS, evals, hiding_bound: int | None = None,
                    rng=None):
    """KZG10::commit_lagrange (kzg10/mod.rs:159): commit a polynomial
    given in EVALUATION form over the size-len(evals) domain without an
    iFFT — MSM against the Lagrange-basis points."""
    n = len(evals)
    basis = lagrange_basis_points(srs, n)
    from ..utils import native
    pairs = [(b, e % R) for b, e in zip(basis, evals) if e % R and b is not None]
    if not pairs:
        comm = g1.INF
    else:
        pts, sc = zip(*pairs)
        try:
            comm = native.msm_g1(list(pts), list(sc))
        except Exception:
            comm = g1.msm(list(pts), list(sc))
    randomness = Randomness.empty()
    if hiding_bound is not None:
        assert rng is not None
        randomness = Randomness.rand(hiding_bound, rng)
        comm = g1.jac_add(comm, _msm_srs(srs, "gamma", 0, randomness.blinding.c))
    return g1.to_affine(comm), randomness


def open_single(srs: UniversalSRS, poly: Poly, point: int, randomness: Randomness):
    """KZG10::open — returns (w affine, random_v or None)."""
    witness, _ = poly.divide_by_linear(point)
    if (type(witness).__name__ == "DPoly" and witness.n >= _device_msm_min()
            and _device_msm_enabled()):
        try:
            w = _msm_srs_dpoly(srs, "beta", 0, witness)
        except Exception:
            w = _msm_srs(srs, "beta", 0, witness.c or [0])
    else:
        w = _msm_srs(srs, "beta", 0, witness.c or [0])
    random_v = None
    if randomness.is_hiding():
        hw, _ = randomness.blinding.divide_by_linear(point)
        w = g1.jac_add(w, _msm_srs(srs, "gamma", 0, hw.c or [0]))
        random_v = randomness.blinding.evaluate(point)
    return g1.to_affine(w), random_v


# ---------------------------------------------------------------------------
# Sonic batched opening / checking
# ---------------------------------------------------------------------------

class LabeledPoly:
    def __init__(self, label: str, poly: Poly, degree_bound=None, hiding_bound=None):
        self.label = label
        self.poly = poly
        self.degree_bound = degree_bound
        self.hiding_bound = hiding_bound


class LabeledCommitment:
    def __init__(self, label: str, commitment, degree_bound=None):
        self.label = label
        self.commitment = commitment  # affine (x, y) or None
        self.degree_bound = degree_bound


def batch_open(srs: UniversalSRS, labeled_polys, query_set, rands, sponge):
    """sonic_pc::batch_open. query_set: set of (label, (point_name, point)).
    Returns list of (w, random_v) proofs ordered by point_name."""
    poly_rand = {lp.label: (lp, r) for lp, r in zip(labeled_polys, rands)}
    query_to_labels = {}
    for label, (point_name, point) in sorted(query_set):
        query_to_labels.setdefault(point_name, (point, []))
        query_to_labels[point_name][1].append(label)
    entries = []
    for point_name in sorted(query_to_labels):
        point, labels = query_to_labels[point_name]
        # combine with sponge challenges (labels sorted/BTreeSet order)
        combined_rand = Randomness.empty()
        members, mcoeffs = [], []
        for label in sorted(set(labels)):
            lp, rand = poly_rand[label]
            challenge = sponge.squeeze_short_nonnative_field_element()
            members.append(lp.poly)
            mcoeffs.append(challenge)
            combined_rand = combined_rand.add_scaled(challenge, rand)
        combined = _combine_polys(members, mcoeffs)
        _ = sponge.squeeze_short_nonnative_field_element()  # _randomizer (discarded)
        entries.append((combined, point, combined_rand))
    # batch the witness MSMs across query points when device-eligible
    if (len(entries) >= 2 and _device_msm_enabled()
            and not any(r.is_hiding() for _, _, r in entries)):
        wits = [c.divide_by_linear(p)[0] for c, p, _ in entries]
        if all(type(w).__name__ == "DPoly" and w.n >= _device_msm_min()
               for w in wits):
            try:
                affs = commit_many_dpoly(srs, "beta", 0, wits)
                return [(a, None) for a in affs]
            except Exception:
                import logging
                logging.getLogger(__name__).warning(
                    "batched witness-MSM device path failed; falling back "
                    "to per-point opens", exc_info=True)
    return [open_single(srs, c, p, r) for c, p, r in entries]


def batch_check(srs: UniversalSRS, labeled_comms, query_set, values, proofs, sponge) -> bool:
    """sonic_pc::batch_check — accumulate + one multi-pairing."""
    comm_map = {c.label: c for c in labeled_comms}
    query_to_labels = {}
    for label, (point_name, point) in sorted(query_set):
        query_to_labels.setdefault(point_name, (point, []))
        query_to_labels[point_name][1].append(label)
    assert len(proofs) == len(query_to_labels)

    randomizer = 1
    combined_comms = {}   # degree_bound -> jacobian
    combined_witness = g1.INF
    combined_adjusted_witness = g1.INF

    for point_name, (w_proof) in zip(sorted(query_to_labels), proofs):
        point, labels = query_to_labels[point_name]
        w, random_v = w_proof
        combined_values = 0
        for label in sorted(set(labels)):
            c = comm_map[label]
            value = values[(label, point)]
            chal = sponge.squeeze_short_nonnative_field_element()
            combined_values = (combined_values + value * chal) % R
            coeff = randomizer * chal % R
            db = c.degree_bound
            cur = combined_comms.get(db, g1.INF)
            combined_comms[db] = g1.jac_add(cur, g1.mul_int(g1.from_affine(c.commitment), coeff))
        # accumulate witness terms
        bases = [srs.g, (w[0], (-w[1]) % P.Q) if w else None]
        coeffs = [combined_values, point]
        if random_v is not None:
            bases.append(srs.powers_of_beta_times_gamma_g[0])
            coeffs.append(random_v)
        coeffs = [c * randomizer % R for c in coeffs]
        combined_witness = g1.jac_add(combined_witness, g1.mul_int(g1.from_affine(w), randomizer))
        acc = g1.INF
        for b, cf in zip(bases, coeffs):
            acc = g1.jac_add(acc, g1.mul_int(g1.from_affine(b), cf))
        combined_adjusted_witness = g1.jac_add(combined_adjusted_witness, acc)
        randomizer = sponge.squeeze_short_nonnative_field_element()

    return _check_elems(srs, combined_comms, combined_witness, combined_adjusted_witness)


def _check_elems(srs, combined_comms, combined_witness, combined_adjusted_witness) -> bool:
    pairs = []
    for db in sorted(combined_comms, key=lambda x: (x is not None, x)):
        comm = combined_comms[db]
        g2pt = srs.neg_power_of_beta_h(db) if db is not None else srs.h
        pairs.append((_to_fq_affine(comm), g2pt))
    pairs.append((_to_fq_affine(g1.neg(combined_adjusted_witness)), srs.h))
    pairs.append((_to_fq_affine(g1.neg(combined_witness)), srs.beta_h))
    pairs = [(a, b) for a, b in pairs if a is not None]
    return pairing.product_of_pairings(pairs).is_one()


def _to_fq_affine(j):
    aff = g1.to_affine(j)
    if aff is None:
        return None
    return (Fq(aff[0]), Fq(aff[1]))


class LinearCombination:
    """Label -> coefficient map; LCTerm 'one' uses the key None."""

    def __init__(self, label: str, terms=()):
        self.label = label
        self.terms = {}  # key: str poly label or None (the constant term)
        for coeff, term in terms:
            self.add(coeff, term)

    def add(self, coeff: int, term):
        key = None if term is None or term == 1 else term
        self.terms[key] = (self.terms.get(key, 0) + coeff) % R
        return self

    def scale(self, k: int):
        for key in self.terms:
            self.terms[key] = self.terms[key] * k % R
        return self

    def add_lc(self, coeff: int, other: "LinearCombination"):
        for key, c in other.terms.items():
            self.terms[key] = (self.terms.get(key, 0) + coeff * c) % R
        return self


def open_combinations(srs, linear_combinations, labeled_polys, rands, query_set, sponge):
    """sonic_pc::open_combinations — build LC polys then batch_open."""
    label_map = {lp.label: (lp, r) for lp, r in zip(labeled_polys, rands)}
    lc_polys = []
    lc_rands = []
    for lc in linear_combinations:
        randomness = Randomness.empty()
        degree_bound = None
        hiding_bound = None
        num_polys = len(lc.terms)
        members, mcoeffs = [], []
        for label, coeff in lc.terms.items():
            if label is None:
                continue
            lp, rand = label_map[label]
            if lp.degree_bound is not None:
                assert num_polys == 1, f"degree-bounded LC {lc.label} must be singleton"
                assert coeff == 1
                degree_bound = lp.degree_bound
            if lp.hiding_bound is not None:
                hiding_bound = max(hiding_bound or 0, lp.hiding_bound)
            members.append(lp.poly)
            mcoeffs.append(coeff)
            randomness = randomness.add_scaled(coeff, rand)
        poly = _combine_polys(members, mcoeffs)
        lc_polys.append(LabeledPoly(lc.label, poly, degree_bound, hiding_bound))
        lc_rands.append(randomness)
    return batch_open(srs, lc_polys, query_set, lc_rands, sponge)


def _combine_polys(members, coeffs):
    """sum coeff*poly — ONE device dispatch when any member is device-
    resident, host Poly arithmetic otherwise."""
    if not members:
        return Poly.zero()
    if any(type(p).__name__ == "DPoly" for p in members):
        from ..snark import dround
        return dround.linear_combine(members, coeffs)
    poly = Poly.zero()
    for p, c in zip(members, coeffs):
        poly = poly + p.scale(c)
    return poly


def check_combinations(srs, linear_combinations, labeled_comms, query_set, evaluations, proofs, sponge) -> bool:
    """sonic_pc::check_combinations — combine commitments then batch_check."""
    comm_map = {c.label: c for c in labeled_comms}
    evaluations = dict(evaluations)
    lc_comms = []
    for lc in linear_combinations:
        degree_bound = None
        acc = g1.INF
        num_polys = len(lc.terms)
        for label, coeff in lc.terms.items():
            if label is None:
                # constant term: subtract from claimed evaluations of this LC
                for key in list(evaluations):
                    if key[0] == lc.label:
                        evaluations[key] = (evaluations[key] - coeff) % R
                continue
            c = comm_map[label]
            if c.degree_bound is not None:
                assert num_polys == 1 and coeff == 1
                degree_bound = c.degree_bound
            acc = g1.jac_add(acc, g1.mul_int(g1.from_affine(c.commitment), coeff))
        lc_comms.append(LabeledCommitment(lc.label, g1.to_affine(acc), degree_bound))
    return batch_check(srs, lc_comms, query_set, evaluations, proofs, sponge)


# ---------------------------------------------------------------------------
# Committer keys (SonicKZG10::trim, sonic_pc/mod.rs:62; CommitterUnionKey,
# sonic_pc/data_structures.rs). In this framework the SRS is a live object
# and `commit` enforces degree bounds directly, so the keys are validating
# VIEWS over the SRS rather than copied power tables — the union key is how
# multi-circuit batches (varuna.rs:377-382) share one opening pass.
# ---------------------------------------------------------------------------

class CommitterKey:
    """A trimmed view: commits are only allowed up to supported_degree and
    only at the registered degree bounds."""

    def __init__(self, srs, supported_degree: int, degree_bounds=(),
                 supported_lagrange_sizes=()):
        if supported_degree > srs.max_degree:
            raise ValueError("trim beyond SRS max degree")
        self.srs = srs
        self.supported_degree = supported_degree
        self.degree_bounds = frozenset(int(b) for b in degree_bounds)
        self.lagrange_sizes = frozenset(int(s) for s in supported_lagrange_sizes)

    def commit(self, poly, degree_bound=None, hiding_bound=None, rng=None):
        if poly.degree > self.supported_degree:
            raise ValueError(
                f"degree {poly.degree} > supported {self.supported_degree}")
        if degree_bound is not None and degree_bound not in self.degree_bounds:
            raise ValueError(f"degree bound {degree_bound} not in trim set")
        return commit(self.srs, poly, degree_bound=degree_bound,
                      hiding_bound=hiding_bound, rng=rng)

    def commit_lagrange(self, evals, hiding_bound=None, rng=None):
        if self.lagrange_sizes and len(evals) not in self.lagrange_sizes:
            raise ValueError(f"lagrange size {len(evals)} not in trim set")
        return commit_lagrange(self.srs, evals, hiding_bound=hiding_bound,
                               rng=rng)

    def union(self, *others) -> "CommitterUnionKey":
        return CommitterUnionKey([self, *others])


def trim(srs, supported_degree: int, degree_bounds=(),
         supported_lagrange_sizes=()) -> CommitterKey:
    """SonicKZG10::trim (sonic_pc/mod.rs:62)."""
    return CommitterKey(srs, supported_degree, degree_bounds,
                        supported_lagrange_sizes)


class CommitterUnionKey(CommitterKey):
    """Union of per-circuit committer keys: max supported degree, union of
    degree bounds/lagrange sizes (sonic_pc CommitterUnionKey)."""

    def __init__(self, keys):
        keys = list(keys)
        if not keys:
            raise ValueError("empty union")
        srs = keys[0].srs
        if any(k.srs is not srs for k in keys):
            raise ValueError("union across different SRS objects")
        super().__init__(
            srs,
            max(k.supported_degree for k in keys),
            frozenset().union(*(k.degree_bounds for k in keys)),
            frozenset().union(*(k.lagrange_sizes for k in keys)),
        )


def commit_many_dpoly(srs, kind: str, shift: int, dps):
    """Commit k device polynomials against the SAME SRS window in ONE
    fused multi-set MSM dispatch. Returns affine points."""
    from ..ops import ec_pallas as ep
    from ..fields import limb as limb_mod
    import jax
    import jax.numpy as jnp
    # _plane_window pads lanes beyond the SRS with identity-masked points,
    # so an out-of-range polynomial would otherwise commit silently wrong
    # (same guard commit() enforces via supported_degree).
    max_n = max(dp.n for dp in dps)
    if shift + max_n > srs.max_degree + 1:
        raise ValueError(
            f"commit_many_dpoly: shift {shift} + poly length {max_n} "
            f"exceeds SRS degree {srs.max_degree}")
    npad = 1 << (max(dp.n for dp in dps) - 1).bit_length()
    lanes = max(ep.LANE, npad)
    # the dense multi-set schedule materializes [L, W*npad] u32 planes x3
    # coords (+temps): at 2^21-lane windows that is ~19GB of HLO temps —
    # gate it here (cheap ValueError -> caller falls back to per-poly
    # msm_v2 commits) instead of paying a doomed device compile
    from .. import ops as _ops  # noqa: F401  (keep import graph explicit)
    from ..ops.msm import device_window
    est_w = (253 + device_window(npad) - 1) // device_window(npad)
    if est_w * lanes > (1 << 24):
        raise ValueError("grouped dense schedule too large "
                         f"({est_w}x{lanes} lanes)")
    window = _plane_window(srs, kind, shift, lanes)
    from_mont = jax.jit(lambda a: limb_mod._from_mont(a, limb_mod.FR))
    sls = jnp.stack([from_mont(dp._padded(npad)) for dp in dps])
    jacs = ep.msm_g1_lm_multi(window, sls, npad)
    return [g1.to_affine(j) for j in jacs]
