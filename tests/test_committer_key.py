"""SonicKZG10 trim / CommitterKey / CommitterUnionKey views
(reference sonic_pc/mod.rs:62, sonic_pc/data_structures.rs)."""
import pytest

from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.snark.poly import Poly


def test_trim_and_commit():
    srs = kzg.test_srs(64)
    ck = kzg.trim(srs, 16, degree_bounds=(8,))
    p = Poly([1, 2, 3])
    c1, _ = ck.commit(p)
    c2, _ = kzg.commit(srs, p)
    assert c1 == c2
    cb, _ = ck.commit(p, degree_bound=8)
    assert cb is not None

    with pytest.raises(ValueError):
        ck.commit(Poly(list(range(1, 20))))       # degree 18 > 16
    with pytest.raises(ValueError):
        ck.commit(p, degree_bound=4)              # bound not registered
    with pytest.raises(ValueError):
        kzg.trim(srs, 100)                        # beyond SRS


def test_union_key():
    srs = kzg.test_srs(64)
    a = kzg.trim(srs, 8, degree_bounds=(4,))
    b = kzg.trim(srs, 32, degree_bounds=(16,))
    u = a.union(b)
    assert u.supported_degree == 32
    assert u.degree_bounds == frozenset((4, 16))
    c1, _ = u.commit(Poly([5, 6]), degree_bound=16)
    assert c1 is not None
