"""VM-level parity: run the reference's golden execute test cases
(synthesizer/tests/tests/process/execute/*.aleo) through our parser +
console interpreter and compare against the checked-in expectations."""
import os
import re

import pytest
import yaml

from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack, value_to_str
from snarkvm_tpu.synthesizer.interpreter import HaltError

TESTS = "/root/reference/synthesizer/tests/tests/process/execute"
EXPECT = "/root/reference/synthesizer/tests/expectations/process/execute"

SUPPORTED = ["abs", "absw", "add", "addw", "arrays", "casts", "group_operations",
             "hash_into_struct", "linalg", "lossy_casts", "sign_verify"]


def fmt_input(x):
    if isinstance(x, bool):
        return "true" if x else "false"
    return str(x)


def load_case(name):
    text = open(f"{TESTS}/{name}.aleo").read()
    m = re.match(r"\s*/\*(.*?)\*/", text, re.S)
    header = yaml.safe_load(m.group(1))
    expect = yaml.safe_load(open(f"{EXPECT}/{name}.out").read())
    return text, header.get("cases") or [], expect


@pytest.mark.parametrize("name", SUPPORTED)
def test_golden_execute(name):
    if not os.path.exists(f"{TESTS}/{name}.aleo"):
        pytest.skip("missing")
    text, cases, expect = load_case(name)
    prog = parse_program(text)
    stack = Stack(prog)
    expected_outputs = expect["outputs"]
    assert len(cases) == len(expected_outputs)
    for case, want in zip(cases, expected_outputs):
        fn = case["function"]
        inputs = [fmt_input(x) for x in case["inputs"]]
        try:
            outs = stack.evaluate_function(fn, inputs)
            got = [value_to_str(o) for o in outs]
        except HaltError:
            got = None
        if isinstance(want, str):
            # reference harness recorded a panic/halt for this case
            assert got is None, f"{name}/{fn}{inputs}: expected halt, got {got}"
        else:
            assert got is not None, f"{name}/{fn}{inputs}: unexpected halt"
            assert got == [str(w) for w in want], f"{name}/{fn}{inputs}"
