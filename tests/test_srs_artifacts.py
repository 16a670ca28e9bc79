"""SRS .usrs artifacts: save a test SRS, reload without the trapdoor, and
run a full Varuna prove/verify against the loaded artifact
(parameters/src/mainnet/powers.rs consumption path)."""
import random

import pytest

from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.params import srs_io


class TestRoundTrip:
    def test_g1_g2_io(self, tmp_path):
        srs = kzg.test_srs(32)
        pts = srs.powers_of_beta_g[:8] + [None]
        p = tmp_path / "p.usrs"
        srs_io.write_powers_file(str(p), pts)
        assert srs_io.read_powers_file(str(p)) == pts

    def test_loaded_srs_matches(self, tmp_path):
        srs = kzg.test_srs(64)
        kzg.save_srs(srs, str(tmp_path), degree_bounds=[10, 20])
        loaded = kzg.LoadedSRS.load(str(tmp_path))
        assert loaded.max_degree == 64
        assert loaded.powers_of_beta_g == srs.powers_of_beta_g
        assert loaded.powers_of_beta_times_gamma_g == srs.powers_of_beta_times_gamma_g
        assert loaded.neg_power_of_beta_h(10) == srs.neg_power_of_beta_h(10)
        with pytest.raises(KeyError):
            loaded.neg_power_of_beta_h(11)


class TestVarunaOnLoadedSRS:
    def test_prove_with_test_srs_verify_with_loaded(self, tmp_path):
        from snarkvm_tpu.snark import varuna, r1cs

        rng = random.Random(0)

        class Circ(r1cs.ConstraintSynthesizer):
            def generate_constraints(self, cs):
                c_pub = cs.alloc_input(35)
                a = cs.alloc(5)
                b = cs.alloc(7)
                cs.enforce([(1, a)], [(1, b)], [(1, c_pub)])
                cur, cv = a, 5
                for _ in range(6):
                    cv = cv * cv % kzg.R
                    nxt = cs.alloc(cv)
                    cs.enforce([(1, cur)], [(1, cur)], [(1, nxt)])
                    cur = nxt

        circ = Circ()
        srs = kzg.test_srs(1 << 10)
        pk, vk = varuna.circuit_setup(srs, circ, varuna.VarunaNonHidingMode)
        proof = varuna.prove_batch(srs, [(pk, [circ])], rng, varuna.VarunaNonHidingMode)
        public = [1, 35]

        # capture the degree bounds the verifier needs, then save + reload
        used = set()
        orig = type(srs).neg_power_of_beta_h
        try:
            type(srs).neg_power_of_beta_h = lambda s, db, _o=orig, _u=used: (
                _u.add(db), _o(s, db))[1]
            assert varuna.verify_batch(srs, [(vk, [public])], proof,
                                       varuna.VarunaNonHidingMode)
        finally:
            type(srs).neg_power_of_beta_h = orig

        kzg.save_srs(srs, str(tmp_path), degree_bounds=sorted(used))
        loaded = kzg.LoadedSRS.load(str(tmp_path))
        assert varuna.verify_batch(loaded, [(vk, [public])], proof,
                                   varuna.VarunaNonHidingMode)
        # tampered proof still fails on the loaded SRS
        bad_public = [1, 4]
        assert not varuna.verify_batch(loaded, [(vk, [bad_public])], proof,
                                       varuna.VarunaNonHidingMode)
