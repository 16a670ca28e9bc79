"""Replicate the reference's Response::from_outputs count test
(circuit/program/src/response/from_outputs.rs:288 —
check_from_outputs(Private, 24849, 6, 13962, 13983)) with OUR gadgets:
5 outputs [constant struct, public struct, private struct, record,
external record], outputs injected OUTSIDE the measured scope.

This isolates the record OUTPUT arm's remaining -3c residual
(ROADMAP round-5: record input arm exact, output arm -3).

Usage: JAX_PLATFORMS=cpu python tools/compare_from_outputs.py
"""
import os
import random
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from snarkvm_tpu.params import bls12_377 as P
from snarkvm_tpu.console import network as N
from snarkvm_tpu.console.types import Plaintext, Literal, Identifier
from snarkvm_tpu.console.record import Record, Entry
from snarkvm_tpu.curves import edwards as ed
from snarkvm_tpu.circuit.builder import CircuitBuilder, PRIVATE
from snarkvm_tpu.circuit.types import CField, CInteger, CStruct
from snarkvm_tpu.circuit.record_gadget import RecordGadget
from snarkvm_tpu.circuit.response_gadget import (from_outputs_gadget,
                                                 plaintext_fields_gadget)

rng = random.Random(0xFE0)

REF = {"constraints": 13983, "private": 13962, "public": 6}


def main():
    tvk = rng.randrange(P.R)
    tcm = N.hash_psd(2, [tvk])
    index = 8                       # the record output's register locator
    randomizer = N.hash_to_scalar_psd(2, [tvk, index])
    nonce = N.g_scalar_multiply(randomizer)

    owner_pt = ed.mul(ed.GENERATOR, rng.randrange(1, P.S))

    def mk_record(nonce_pt):
        return Record(
            owner=owner_pt, owner_visibility="private",
            data=[(Identifier("token_amount"),
                   Entry("private", Plaintext("literal", Literal("u64", 100))))],
            nonce=nonce_pt)

    rec = mk_record(nonce)
    ext_rec = mk_record((0, 1))     # 0group

    b = CircuitBuilder()
    tvk_g = CField.new(b, PRIVATE, tvk)
    tcm_g = CField.new(b, PRIVATE, tcm)

    def inject_struct():
        lit = Literal("u128", 9876543210)
        g = CInteger.new(b, PRIVATE, lit.value, 128, False)
        pt = Plaintext("struct", [("token_amount", Plaintext("literal", lit))])
        cs = CStruct(b, [(Identifier("token_amount"), "u128", g)], pt)
        return plaintext_fields_gadget(b, cs, None)

    gads = [inject_struct(), inject_struct(), inject_struct(),
            RecordGadget.inject(b, rec), RecordGadget.inject(b, ext_rec)]

    output_types = [("constant", "amount"), ("public", "amount"),
                    ("private", "amount"), ("record", "token"),
                    ("external_record", "token")]
    req = SimpleNamespace(network_id=N.ID, program_id="test.aleo",
                          function_name="check", tvk=tvk)

    c0, v0, p0 = b.num_constraints, len(b.private), len(b.public)
    from_outputs_gadget(b, req, output_types, gads, 4, tvk_g, tcm_g,
                        output_registers=[5, 6, 7, 8, 9])
    dc = b.num_constraints - c0
    dv = len(b.private) - v0
    dp = len(b.public) - p0
    ok = b.is_satisfied()
    print(f"ours:      constraints={dc} private={dv} public={dp} "
          f"satisfied={ok}")
    print(f"reference: constraints={REF['constraints']} "
          f"private={REF['private']} public={REF['public']}")
    print(f"delta:     constraints{dc-REF['constraints']:+d} "
          f"private{dv-REF['private']:+d}")


if __name__ == "__main__":
    main()
