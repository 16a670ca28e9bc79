"""Deployment synthesis + certificates (CheckDeployment semantics)."""
import random

from snarkvm_tpu.polycommit import kzg
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import deploy as D

rng = random.Random(606)

PROGRAM = """
program poly.aleo;

function f1:
    input r0 as field.private;
    input r1 as field.private;
    mul r0 r1 into r2;
    add r2 r0 into r3;
    output r3 as field.private;

function f2:
    input r0 as field.public;
    square r0 into r1;
    inv r1 into r2;
    output r2 as field.private;
"""


def test_deploy_and_verify():
    stack = Stack(parse_program(PROGRAM))
    # srs=None: deploy auto-sizes to the FULL transition circuits
    dep = D.deploy(None, stack, rng, program_text=PROGRAM)
    srs = dep.srs
    assert len(dep.verifying_keys) == 2
    assert D.verify_deployment(srs, stack, dep, rng)
    # tampered vk id fails
    bad = D.Deployment(dep.program_id, dep.program_text, [
        (n, vk, cert) for n, vk, cert in dep.verifying_keys])
    from dataclasses import replace
    n0, vk0, c0 = bad.verifying_keys[0]
    import copy
    vk_bad = copy.deepcopy(vk0)
    vk_bad.circuit_commitments[0] = vk0.circuit_commitments[1]
    bad.verifying_keys[0] = (n0, vk_bad, c0)
    assert not D.verify_deployment(srs, stack, bad, rng)
