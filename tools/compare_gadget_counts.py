"""Per-gadget constraint-count parity harness.

Measures our gadget costs in isolation and compares them against the
expected counts hard-coded in the REFERENCE'S OWN TESTS (assert_scope /
check_* calls, cited per row). This is the gadget-level measuring stick
for the credits.aleo CircuitInfo chase: when every row matches, the
function totals must match too.

Usage: JAX_PLATFORMS=cpu python tools/compare_gadget_counts.py
"""
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snarkvm_tpu.circuit.builder import CircuitBuilder, PUBLIC, PRIVATE
from snarkvm_tpu.circuit.types import CField, CBool, CGroup, CScalar
from snarkvm_tpu.circuit import poseidon_gadget
from snarkvm_tpu.circuit import request_gadget as RG
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.params import bls12_377 as P

rng = random.Random(0xBEEF)


def rand_scalar():
    return rng.randrange(1, P.S)


def rand_field():
    return rng.randrange(1, P.R)


def rand_point():
    return ed.mul(ed.GENERATOR, rng.randrange(1, P.S))


def measure(fn):
    """Counts attributable to fn alone: injection done first, then delta."""
    b = CircuitBuilder()
    pre = fn(b)          # returns a closure over pre-injected gadgets
    c0, v0 = b.num_constraints, b.num_private
    pre()
    assert b.is_satisfied(), "unsatisfied circuit"
    return b.num_constraints - c0, b.num_private - v0


# (name, expected_constraints, reference citation, builder)
ROWS = []


def row(name, expect, cite):
    def deco(fn):
        ROWS.append((name, expect, cite, fn))
        return fn
    return deco


@row("group_add var+var", 6, "group/src/add.rs Count::is(2,0,6,6)")
def _(b):
    g1 = CGroup.new(b, PRIVATE, rand_point())
    g2 = CGroup.new(b, PRIVATE, rand_point())
    return lambda: g1 + g2


@row("group_add var+const", 3, "group/src/add.rs Count::is(2,0,3,3)")
def _(b):
    g1 = CGroup.new(b, PRIVATE, rand_point())
    g2 = CGroup.constant(b, rand_point())
    return lambda: g1 + g2


@row("group_double", 5, "group/src/double.rs assert_scope!(1,0,5,5)")
def _(b):
    g1 = CGroup.new(b, PRIVATE, rand_point())
    return lambda: g1.double()


@row("group_ternary", 2, "group/src/ternary.rs (2 field ternaries)")
def _(b):
    g1 = CGroup.new(b, PRIVATE, rand_point())
    g2 = CGroup.new(b, PRIVATE, rand_point())
    c = CBool.new(b, PRIVATE, True)
    return lambda: g1.ternary(c, g2)


@row("group_inject (in-group)", 13, "group/src/lib.rs enforce_in_group: on-curve 3 + double 5 + enforce_double 5")
def _(b):
    return lambda: CGroup.new(b, PRIVATE, rand_point())


@row("group_is_equal", 5, "group equal: 2x field is_not_equal(2) + and(1)")
def _(b):
    g1 = CGroup.new(b, PRIVATE, rand_point())
    g2 = CGroup.new(b, PRIVATE, rand_point())
    return lambda: g1.is_equal(g2)


@row("scalar_to_bits_le", 503, "scalar/helpers/to_bits.rs check_to_bits_le(0,0,501,503)")
def _(b):
    s = CScalar.new(b, PRIVATE, rand_scalar())
    return lambda: s.to_bits_le()


@row("field_to_bits_le (canonical)", 507, "field to_bits: 253 bool + 1 recomp + comparator(R-1) + assert")
def _(b):
    f = CField.new(b, PRIVATE, rand_field())
    return lambda: f.to_bits_le()


@row("field_ternary", 1, "field/src/ternary.rs Count::is(0,0,1,1)")
def _(b):
    f1 = CField.new(b, PRIVATE, rand_field())
    f2 = CField.new(b, PRIVATE, rand_field())
    c = CBool.new(b, PRIVATE, False)
    return lambda: f1.ternary(c, f2)


@row("field_is_equal", 2, "field/src/equal.rs (2 constraints)")
def _(b):
    f1 = CField.new(b, PRIVATE, rand_field())
    f2 = CField.new(b, PRIVATE, rand_field())
    return lambda: f1.is_equal(f2)


@row("g_scalar_multiply", 1250, "network/src/v0.rs:145 fold; 250x(add 3 + ternary 2)")
def _(b):
    s = CScalar.new(b, PRIVATE, rand_scalar())
    s.to_bits_le()      # bits pre-derived (cost rows separate)
    return lambda: RG.g_scalar_multiply_gadget(b, s)


@row("group_mul var base x var scalar", 3252, "group/src/mul.rs check_mul_assign(750,0,3252,3252)")
def _(b):
    g = CGroup.new(b, PRIVATE, rand_point())
    s = CScalar.new(b, PRIVATE, rand_scalar())
    s.to_bits_le()
    return lambda: g.mul_scalar(s)


@row("hash_psd2 (1 input)", 265, "poseidon hash.rs pattern: rate-2 1 input")
def _(b):
    f = CField.new(b, PRIVATE, rand_field())
    return lambda: poseidon_gadget.hash_psd(b, 2, [f])


@row("hash_psd4 (2 inputs)", 340, "poseidon/hash.rs check_hash(Private,2)=340")
def _(b):
    fs = [CField.new(b, PRIVATE, rand_field()) for _ in range(2)]
    return lambda: poseidon_gadget.hash_psd(b, 4, fs)


@row("hash_psd8 (6 inputs)", 500, "poseidon rate-8 6 inputs (475+25)")
def _(b):
    fs = [CField.new(b, PRIVATE, rand_field()) for _ in range(6)]
    return lambda: poseidon_gadget.hash_psd(b, 8, fs)


@row("hash_to_scalar_psd4 (2 inputs)", 847, "poseidon/hash_to_scalar.rs check(Private,2)=847")
def _(b):
    fs = [CField.new(b, PRIVATE, rand_field()) for _ in range(2)]
    return lambda: RG.hash_to_scalar_gadget(b, 4, fs)


@row("compute_key to_address (sk_prf cached)", 1260, "compute_key/to_address.rs check_to_address(Private)=1260")
def _(b):
    pk_sig = CGroup.new(b, PRIVATE, rand_point())
    pr_sig = CGroup.new(b, PRIVATE, rand_point())
    fs = [pk_sig.x, pr_sig.x]
    sk_prf = RG.hash_to_scalar_gadget(b, 4, fs)

    def run():
        pk_prf = RG.g_scalar_multiply_gadget(b, sk_prf)
        return pk_sig + pr_sig + pk_prf
    return run


@row("signature_verify (2-field msg, post-inject)", 7789, "account/signature/verify.rs check_verify(Private)=7789")
def _(b):
    from snarkvm_tpu.console import account
    pk = account.PrivateKey.new(rng)
    addr_pt = pk.to_address()
    msg = [rand_field(), rand_field()]
    sig = account.Signature.sign(pk, msg, rng)

    # injection (outside the reference's measured scope)
    challenge = CScalar.new(b, PRIVATE, sig.challenge % P.S)
    response = CScalar.new(b, PRIVATE, sig.response % P.S)
    pk_sig = CGroup.new(b, PRIVATE, sig.compute_key.pk_sig)
    pr_sig = CGroup.new(b, PRIVATE, sig.compute_key.pr_sig)
    # ComputeKey::new computes sk_prf at injection (compute_key/from.rs)
    sk_prf = RG.hash_to_scalar_gadget(b, 4, [pk_sig.x, pr_sig.x])
    address = CGroup.new(b, PRIVATE, addr_pt)
    msg_g = [CField.new(b, PRIVATE, m) for m in msg]

    def run():
        g_nonce = (RG.g_scalar_multiply_gadget(b, response)
                   + pk_sig.mul_scalar(challenge))
        preimage = [g_nonce.x, pk_sig.x, pr_sig.x, address.x] + msg_g
        cand_challenge = RG.hash_to_scalar_gadget(b, 8, preimage)
        cand_addr = pk_sig + pr_sig + RG.g_scalar_multiply_gadget(b, sk_prf)
        ok = challenge.is_equal(cand_challenge) & address.is_equal(cand_addr)
        assert ok.value
        return ok
    return run


def main():
    total_delta = 0
    print(f"{'gadget':45s} {'ours':>7s} {'ref':>7s} {'delta':>6s}")
    for name, expect, cite, fn in ROWS:
        try:
            got, priv = measure(fn)
        except Exception as e:
            print(f"{name:45s} ERROR {type(e).__name__}: {e}")
            continue
        d = got - expect
        total_delta += abs(d)
        mark = "" if d == 0 else "  <-- "
        print(f"{name:45s} {got:7d} {expect:7d} {d:+6d}{mark}")
        if d != 0:
            print(f"{'':45s} ref: {cite}")
    print(f"\nsum |delta| = {total_delta}")


if __name__ == "__main__":
    main()
