"""CLI package workflow (vm/cli + vm/package + vm/file): new/build/run,
with build artifacts in the reference wire formats (.avm bytecode,
VerifierFile = identifier + verifying key bytes)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "snarkvm_tpu.cli"] + args,
                          cwd=cwd, env=env, capture_output=True, text=True,
                          timeout=600)


@pytest.fixture(scope="module")
def package(tmp_path_factory):
    root = tmp_path_factory.mktemp("pkg")
    r = _cli(["new", "demo"], root)
    assert r.returncode == 0, r.stderr
    pkg = root / "demo"
    r = _cli(["build"], pkg)
    assert r.returncode == 0, r.stderr
    return pkg


def test_build_artifacts_wire_formats(package):
    from snarkvm_tpu.formats import program_io, varuna_io
    from snarkvm_tpu.formats.io import Reader
    from snarkvm_tpu.synthesizer.program import parse_program

    avm = (package / "build" / "main.avm").read_bytes()
    ast = program_io.parse_program_bytes(avm)
    assert ast.id == "demo.aleo"
    # bytecode -> canonical text -> synthesizer parser round-trips
    prog = parse_program(program_io.program_to_text(ast))
    assert "hello" in prog.functions
    # stable re-serialization
    assert program_io.program_to_bytes(ast) == avm

    vf = (package / "build" / "hello.verifier").read_bytes()
    r = Reader(vf)
    assert r.ident() == "hello"
    vk, _nv = varuna_io.read_verifying_key(r.read(r.remaining()))
    assert vk.circuit_info is not None or vk is not None


def test_run(package):
    r = _cli(["run", "hello", "3u32", "4u32"], package)
    assert r.returncode == 0, r.stderr
    assert "7u32" in r.stdout


def test_execute_full_transaction(package):
    """`execute` builds a complete fee-carrying transaction, verifies it
    through VM.check_transaction, and emits wire bytes that round-trip
    (vm/cli/commands/execute.rs + transaction bytes.rs)."""
    r = _cli(["execute", "hello", "3u32", "4u32", "--out", "tx.bin"],
             package)
    assert r.returncode == 0, r.stderr
    assert "output #0: 7u32" in r.stdout
    assert "fee" in r.stdout
    from snarkvm_tpu.formats.block_io import read_transaction
    from snarkvm_tpu.formats.io import Reader
    blob = (package / "tx.bin").read_bytes()
    tx = read_transaction(Reader(blob))
    assert tx.variant == 1                       # execute
    assert len(tx.execution.transitions) == 1
    assert tx.execution.proof is not None
    assert tx.fee is not None and tx.fee.proof is not None
    assert tx.fee.transition.function_name == "fee_public"
