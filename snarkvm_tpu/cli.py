"""snarkvm-tpu CLI: new / build / run / execute / clean (vm/cli mirror).

Package workflow (vm/package/mod.rs:50): a directory with program.json +
main.aleo + build/ artifacts (keys per function).

  python -m snarkvm_tpu.cli new <name>
  python -m snarkvm_tpu.cli build [--path DIR]
  python -m snarkvm_tpu.cli run <function> [inputs...] [--path DIR]
  python -m snarkvm_tpu.cli execute <function> [inputs...] [--path DIR]
  python -m snarkvm_tpu.cli clean [--path DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import shutil
import sys


TEMPLATE = """program {name}.aleo;

function hello:
    input r0 as u32.public;
    input r1 as u32.private;
    add r0 r1 into r2;
    output r2 as u32.private;
"""

MANIFEST = {
    "program": None,
    "version": "0.0.0",
    "description": "",
    "license": "MIT",
}


def _package_dir(args):
    return os.path.abspath(getattr(args, "path", ".") or ".")


def cmd_new(args):
    path = os.path.abspath(args.name)
    os.makedirs(path, exist_ok=False)
    manifest = dict(MANIFEST)
    manifest["program"] = f"{args.name}.aleo"
    with open(os.path.join(path, "program.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(path, "main.aleo"), "w") as f:
        f.write(TEMPLATE.format(name=args.name))
    # README scaffold (vm/file/README.md template analog)
    with open(os.path.join(path, "README.md"), "w") as f:
        f.write(f"# {args.name}.aleo\n\n"
                "## Build\n```\nsnarkvm-tpu build\n```\n\n"
                "## Run\n```\nsnarkvm-tpu run hello 3u32 4u32\n```\n\n"
                "## Execute (prove + verify)\n"
                "```\nsnarkvm-tpu execute hello 3u32 4u32\n```\n")
    print(f"✅ Created package '{args.name}' at {path}")


def _load_package(args):
    from .synthesizer.program import parse_program
    from .synthesizer.process import Stack

    path = _package_dir(args)
    text = open(os.path.join(path, "main.aleo")).read()
    prog = parse_program(text)
    return path, text, Stack(prog)


def is_build_required(path: str) -> bool:
    """Package staleness check (vm/package/mod.rs is_build_required):
    rebuild when build/main.avm is missing or older than main.aleo, or
    when the stored bytecode no longer matches the source program."""
    avm = os.path.join(path, "build", "main.avm")
    src = os.path.join(path, "main.aleo")
    if not os.path.exists(avm):
        return True
    if os.path.getmtime(avm) < os.path.getmtime(src):
        return True
    try:
        from .formats import program_io
        ast = program_io.program_from_text(open(src).read())
        return open(avm, "rb").read() != program_io.program_to_bytes(ast)
    except Exception:
        return True


def cmd_build(args):
    from .polycommit import kzg
    from .synthesizer import deploy as D
    from .formats import program_io, varuna_io
    from .formats.io import Writer

    path, text, stack = _load_package(args)
    if not getattr(args, "force", False) and not is_build_required(path):
        print(f"✅ '{stack.program.id}' is up to date (use --force to rebuild)")
        return
    build = os.path.join(path, "build")
    os.makedirs(build, exist_ok=True)
    rng = random.Random(0)
    # srs=None: deploy sizes a dev SRS to the largest FULL transition
    # circuit (request verify + body + response, the reference's only
    # deployment circuit shape)
    deployment = D.deploy(None, stack, rng, program_text=text)
    for fname, vk, cert in deployment.verifying_keys:
        # VerifierFile wire format (vm/file/verifier.rs:186): identifier
        # (u8 len + utf8) + the verifying key's reference byte form
        w = Writer()
        w.ident(fname)
        w.write(varuna_io.write_verifying_key(vk, None))
        with open(os.path.join(build, f"{fname}.verifier"), "wb") as f:
            f.write(w.getvalue())
        # certificates are deployment artifacts; keep them alongside
        with open(os.path.join(build, f"{fname}.certificate"), "wb") as f:
            pickle.dump(cert, f)
    # main.avm = the binary program format (vm/file/avm.rs; bytecode
    # identical to what deploy transactions embed)
    ast = program_io.program_from_text(text)
    with open(os.path.join(build, "main.avm"), "wb") as f:
        f.write(program_io.program_to_bytes(ast))
    print(f"✅ Built '{stack.program.id}' ({len(deployment.verifying_keys)} functions)")


def cmd_run(args):
    path, text, stack = _load_package(args)
    from .synthesizer.process import value_to_str

    outs = stack.evaluate_function(args.function, list(args.inputs))
    print(f"🚀 Executed '{stack.program.id}/{args.function}':")
    for i, out in enumerate(outs):
        print(f"  • output #{i}: {value_to_str(out)}")


def cmd_execute(args):
    """vm/cli/commands/execute.rs analog: build a COMPLETE execute
    transaction — body transitions (incl. cross-program call trees)
    proven with the full protocol circuit, plus a credits.aleo/fee_public
    transition bound to the execution id — verify it the way the chain
    would (VM.check_transaction: batched Varuna verify + fee binding +
    cost), and emit the wire bytes (--out FILE)."""
    from .polycommit import kzg
    from .console import account
    from .console.types import literal_to_str, Plaintext, literal_from_str
    from .synthesizer.vm import VM
    from .synthesizer.process import fn_input_types
    from .synthesizer.finalize import _key_of
    from .formats.tx_bridge import wire_execute_transaction
    from .utils.encoding import bech32m_encode

    path, text, stack0 = _load_package(args)
    rng = random.Random()
    sk = account.PrivateKey.new(rng)
    # dev SRS: large enough for the fee circuit (~2^14 constraints,
    # nz ~2^16) and typical package functions
    srs = kzg.test_srs(1 << 17)
    vm = VM(rng, srs=srs)
    if stack0.program.id != "credits.aleo":
        vm.process.deploy(text)
    stack = vm.process.get_stack(stack0.program.id)
    # fund the burner on the dev chain so the fee can be paid
    addr_str = bech32m_encode(
        "aleo", sk.to_address()[0].to_bytes(32, "little"))
    vm.store.mapping("credits.aleo", "account").insert(
        _key_of(literal_from_str(addr_str)),
        Plaintext.literal("u64", 1_000_000_000))
    types = fn_input_types(stack.program.functions[args.function])
    pending = vm.execute(sk, stack.program.id, args.function,
                         list(args.inputs), types, priority_fee=0)
    tx = pending.transaction
    # chain-side validation: proofs, fee<->execution binding, cost
    vm.check_transaction(pending)
    blob = wire_execute_transaction(tx)
    out_path = getattr(args, "out", None)
    if out_path:
        with open(out_path, "wb") as f:
            f.write(blob)
    print(f"✅ Executed '{stack.program.id}/{args.function}' — transaction "
          f"{tx.id() % (1 << 64):#x}… ({len(tx.transitions)} transition(s), "
          f"fee {tx.fee_amount} µcredits, {len(blob)} wire bytes"
          f"{', written to ' + out_path if out_path else ''}):")
    for i, out in enumerate(pending.outputs):
        try:
            print(f"  • output #{i}: {literal_to_str(out)}")
        except Exception:
            print(f"  • output #{i}: {out}")


def cmd_clean(args):
    path = _package_dir(args)
    build = os.path.join(path, "build")
    if os.path.isdir(build):
        shutil.rmtree(build)
    print("🧹 Cleaned the build directory")


def cmd_update(args):
    """vm/cli/commands/update.rs analog. The reference self-updates its
    binary from GitHub releases; a Python package updates through its
    package manager, so this reports the installed version and defers."""
    from . import __version__
    print(f"snarkvm-tpu {__version__}")
    if args.list:
        print("Self-update is managed by your package manager "
              "(e.g. `pip install -U snarkvm-tpu`); no release feed is "
              "queried from the CLI.")
    else:
        print("✅ Already up to date (self-update defers to the package manager)")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="snarkvm-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("new")
    p.add_argument("name")
    p.set_defaults(fn=cmd_new)

    for name, fn in (("build", cmd_build), ("clean", cmd_clean)):
        p = sub.add_parser(name)
        p.add_argument("--path", default=".")
        if name == "build":
            p.add_argument("--force", action="store_true",
                           help="rebuild even when artifacts are fresh")
        p.set_defaults(fn=fn)

    for name, fn in (("run", cmd_run), ("execute", cmd_execute)):
        p = sub.add_parser(name)
        p.add_argument("function")
        p.add_argument("inputs", nargs="*")
        p.add_argument("--path", default=".")
        if name == "execute":
            p.add_argument("--out", default=None,
                           help="write the wire-format transaction bytes")
        p.set_defaults(fn=fn)

    p = sub.add_parser("update")
    p.add_argument("--list", action="store_true",
                   help="list available releases")
    p.set_defaults(fn=cmd_update)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
