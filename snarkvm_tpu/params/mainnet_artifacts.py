"""Loader for the real Aleo mainnet SRS/key artifacts
(parameters/src/mainnet/resources/): the verifier-side universal SRS
(beta-h, neg-powers keyed by degree bound, gamma powers map, G1 powers
shards) and the credits.aleo circuit verifying keys.

File dialects (parameters/src/mainnet/powers.rs + CanonicalSerialize):
  powers-of-beta-15.usrs   u32/u64 count + count * uncompressed G1 (96B)
  powers-of-beta-gamma.usrs u64 count + (u64 key, uncompressed G1) entries
  neg-powers-of-beta.usrs  u64 count + (u64 degree_bound, uncompressed G2) entries
  beta-h.usrs              one uncompressed G2 (192B)
"""
from __future__ import annotations

import functools
import os
import struct

from . import bls12_377 as P
from ..fields.scalar import Fq2
from ..formats import canonical

DEFAULT_RESOURCE_DIR = "/root/reference/parameters/src/mainnet/resources"


def _g2_obj(pt):
    (x0, x1), (y0, y1) = pt
    return (Fq2(x0, x1), Fq2(y0, y1))


class MainnetVerifierSRS:
    """Verifier-side view of the real Aleo universal SRS.

    Exposes the same surface polycommit.kzg.batch_check needs: g, h,
    beta_h, neg_power_of_beta_h(bound), powers_of_beta_times_gamma_g[0].
    """

    def __init__(self, resource_dir: str = DEFAULT_RESOURCE_DIR):
        self.resource_dir = resource_dir
        self.g = (P.G1_GENERATOR_X, P.G1_GENERATOR_Y)
        self.h = _g2_obj(((P.G2_GENERATOR_X_C0, P.G2_GENERATOR_X_C1),
                          (P.G2_GENERATOR_Y_C0, P.G2_GENERATOR_Y_C1)))
        with open(os.path.join(resource_dir, "beta-h.usrs"), "rb") as f:
            self.beta_h = _g2_obj(canonical.read_g2_uncompressed(f.read(192)))
        # negative powers of beta in G2, keyed by degree bound
        self._neg_powers = {}
        with open(os.path.join(resource_dir, "neg-powers-of-beta.usrs"), "rb") as f:
            data = f.read()
        (n,) = struct.unpack("<Q", data[:8])
        off = 8
        for _ in range(n):
            (k,) = struct.unpack("<Q", data[off:off + 8])
            self._neg_powers[k] = _g2_obj(
                canonical.read_g2_uncompressed(data[off + 8: off + 200]))
            off += 200
        # gamma powers map (sparse): key -> G1
        self._gamma_powers = {}
        with open(os.path.join(resource_dir, "powers-of-beta-gamma.usrs"), "rb") as f:
            data = f.read()
        (n,) = struct.unpack("<Q", data[:8])
        off = 8
        for _ in range(n):
            (k,) = struct.unpack("<Q", data[off:off + 8])
            self._gamma_powers[k] = canonical.read_g1_uncompressed(data[off + 8: off + 104])
            off += 104
        self.max_degree = max(self._neg_powers) + 1 if self._neg_powers else 0

    def neg_power_of_beta_h(self, degree_bound: int):
        pt = self._neg_powers.get(degree_bound)
        if pt is None:
            raise KeyError(f"no neg power for degree bound {degree_bound}")
        return pt

    @property
    def powers_of_beta_times_gamma_g(self):
        return self._gamma_powers

    def powers_of_beta_g(self, lo: int = 0, hi: int | None = None):
        """Load G1 powers [lo, hi) from the shipped shards (shard 15 only
        locally; higher shards are downloaded on demand by the reference)."""
        path = os.path.join(self.resource_dir, "powers-of-beta-15.usrs")
        with open(path, "rb") as f:
            data = f.read()
        n32 = int.from_bytes(data[:4], "little")
        if 4 + n32 * 96 == len(data):
            count, off = n32, 4
        else:
            count = int.from_bytes(data[:8], "little")
            off = 8
        hi = count if hi is None else min(hi, count)
        out = []
        for i in range(lo, hi):
            out.append(canonical.read_g1_uncompressed(data[off + 96 * i: off + 96 * (i + 1)]))
        return out


@functools.lru_cache(maxsize=1)
def verifier_srs(resource_dir: str = DEFAULT_RESOURCE_DIR) -> MainnetVerifierSRS:
    return MainnetVerifierSRS(resource_dir)


MAX_NUM_POWERS = 1 << 28  # parameters/src/mainnet/powers.rs:51


def _read_powers_file(path: str):
    with open(path, "rb") as f:
        data = f.read()
    n32 = int.from_bytes(data[:4], "little")
    if 4 + n32 * 96 == len(data):
        count, off = n32, 4
    else:
        count = int.from_bytes(data[:8], "little")
        off = 8
    return [canonical.read_g1_uncompressed(data[off + 96 * i: off + 96 * (i + 1)])
            for i in range(count)]


class _PowerWindows:
    """Sliceable view over sparse global power indices.

    Backed by windows (contiguous [start, start+len) ranges) and a sparse
    dict of individual points. Slicing outside available coverage raises.
    """

    def __init__(self):
        self.windows = []     # (start, [points])
        self.sparse = {}

    def add_window(self, start: int, points: list) -> None:
        self.windows.append((start, points))

    def __getitem__(self, key):
        if isinstance(key, slice):
            lo, hi = key.start or 0, key.stop
            for start, pts in self.windows:
                if lo >= start and hi <= start + len(pts):
                    return pts[lo - start: hi - start]
            out = []
            for i in range(lo, hi):
                out.append(self.sparse[i])
            return out
        for start, pts in self.windows:
            if start <= key < start + len(pts):
                return pts[key - start]
        return self.sparse[key]


class MainnetSRS(MainnetVerifierSRS):
    """Prover-capable view of the real mainnet SRS from the locally shipped
    shards: low powers 0..2^15 (powers-of-beta-15), shifted powers covering
    the top 2^16 global indices (shifted-powers-of-beta-{15,16}), the sparse
    gamma-powers map, neg powers, and beta-h. Supports committing polys of
    degree < 2^15 with degree bounds of form 2^k - 2 (k <= 16).

    Global indexing (powers.rs:257-266): shifted shard files cover
    [MAX_NUM_POWERS - total_shifted_len, MAX_NUM_POWERS); degree-bound
    commits read powers at [max_degree - bound, ...) with
    max_degree = MAX_NUM_POWERS - 1.
    """

    def __init__(self, resource_dir: str = DEFAULT_RESOURCE_DIR):
        super().__init__(resource_dir)
        self.max_degree = MAX_NUM_POWERS - 1
        low = _read_powers_file(os.path.join(resource_dir, "powers-of-beta-15.usrs"))
        self._g_windows = _PowerWindows()
        self._g_windows.add_window(0, low)
        shifted = []
        for shard in (16, 15):   # shard 16 covers the window below shard 15
            path = os.path.join(resource_dir, f"shifted-powers-of-beta-{shard}.usrs")
            if os.path.exists(path):
                shifted.extend(_read_powers_file(path))
        if shifted:
            self._g_windows.add_window(MAX_NUM_POWERS - len(shifted), shifted)
        gamma = _PowerWindows()
        gamma.sparse = dict(self._gamma_powers)
        self._gamma_windows = gamma

    @property
    def powers_of_beta_g(self):
        return self._g_windows

    @property
    def powers_of_beta_times_gamma_g(self):
        return self._gamma_windows


@functools.lru_cache(maxsize=None)
def credits_verifying_key(function_name: str, resource_dir: str = DEFAULT_RESOURCE_DIR):
    """Parse a shipped .verifier key; returns (CircuitVerifyingKey, num_vars)."""
    from ..formats import varuna_io
    with open(os.path.join(resource_dir, f"{function_name}.verifier"), "rb") as f:
        return varuna_io.read_verifying_key(f.read())
