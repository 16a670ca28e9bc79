"""Reference parser golden corpora (VERDICT item 7):
synthesizer/tests/tests/parser/{instruction,command,program} against the
checked-in expectations (synthesizer/tests/expectations/parser/**).

Pass/fail verdicts are matched exactly. (The reference's *_fail.out
files embed Rust-nom error traces; those are nom-internal formatting —
parity here is the accept/reject verdict per line, which is the
protocol-relevant property.)
"""
import os
import re

import pytest

from snarkvm_tpu.synthesizer.parser_strict import (check_instruction,
                                                   check_command,
                                                   check_finalize_positions,
                                                   ParseError)
from snarkvm_tpu.synthesizer.program import parse_program

REF = "/root/reference/synthesizer/tests"
CORPUS = os.path.join(REF, "tests", "parser")
EXPECT = os.path.join(REF, "expectations", "parser")

pytestmark = pytest.mark.skipif(not os.path.isdir(CORPUS),
                                reason="reference corpus unavailable")


def _lines(path):
    with open(path) as f:
        return [ln for ln in (l.strip() for l in f) if ln]


def _check_lines(path, checker, expect_ok):
    for i, ln in enumerate(_lines(path)):
        try:
            checker(ln)
            ok = True
        except (ParseError, ValueError, AssertionError):
            ok = False
        assert ok == expect_ok, \
            f"{os.path.basename(path)}:{i + 1}: {ln!r} " \
            f"{'parsed' if ok else 'rejected'}, expected " \
            f"{'pass' if expect_ok else 'fail'}"


@pytest.mark.parametrize("name,expect_ok", [
    ("instruction_pass", True), ("instruction_fail", False),
    ("operand_pass", True), ("operand_fail", False),
])
def test_instruction_corpus(name, expect_ok):
    _check_lines(os.path.join(CORPUS, "instruction", f"{name}.aleo"),
                 check_instruction, expect_ok)


@pytest.mark.parametrize("name,expect_ok", [
    ("command_pass", True), ("command_fail", False),
])
def test_command_corpus(name, expect_ok):
    _check_lines(os.path.join(CORPUS, "command", f"{name}.aleo"),
                 check_command, expect_ok)


def _program_verdict(name):
    with open(os.path.join(EXPECT, "program", f"{name}.out")) as f:
        return "successfully parsed" in f.read()


def _strict_parse_program(text):
    """parse_program + per-line strict validation + finalize structural
    checks — the validation the reference runs while parsing."""
    prog = parse_program(text)
    # strict-check instruction/command lines inside executable bodies
    section = None
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith(("//", "program ", "import ")):
            continue
        m = re.match(r"(function|closure|finalize|struct|record|mapping)\b",
                     ln)
        if m:
            section = m.group(1)
            continue
        if section not in ("function", "closure", "finalize"):
            continue  # struct/record/mapping member declarations
        if re.match(r"(input|output|key|value)\s", ln):
            continue
        if not ln.endswith(";"):
            continue
        check_command(ln)
    # finalize structural checks
    for fin in getattr(prog, "finalizes", {}).values():
        cmds = []
        for inst in fin.commands:
            if inst.opcode == "position":
                cmds.append(("position", inst.operands[0]))
            elif inst.opcode in ("branch.eq", "branch.neq"):
                label = next((o[1] for o in inst.operands
                              if isinstance(o, tuple) and o[0] == "to"), None)
                cmds.append((inst.opcode, label))
            else:
                cmds.append((inst.opcode, None))
        check_finalize_positions(cmds)
    return prog


@pytest.mark.parametrize("name", [
    os.path.splitext(f)[0]
    for f in sorted(os.listdir(os.path.join(CORPUS, "program")))
    if f.endswith(".aleo")
])
def test_program_corpus(name):
    with open(os.path.join(CORPUS, "program", f"{name}.aleo")) as f:
        text = f.read()
    want_ok = _program_verdict(name)
    try:
        _strict_parse_program(text)
        ok = True
    except (ParseError, ValueError, AssertionError, KeyError):
        ok = False
    assert ok == want_ok, f"{name}: got {'pass' if ok else 'fail'}, " \
                          f"expected {'pass' if want_ok else 'fail'}"
