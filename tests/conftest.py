"""Test configuration: force a deterministic 8-virtual-device CPU mesh.

The ambient environment registers the axon TPU-tunnel PJRT plugin at
interpreter startup and sets jax_platforms="axon,cpu" via jax.config —
which overrides JAX_PLATFORMS from the environment. Unit tests must run
on CPU (fast eager/jit, 8 virtual devices for the sharding paths), so we
override the config explicitly before any backend initializes.
Benchmarks (bench.py) run on the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


# Files whose tests run proofs / heavy circuit synthesis — the slow tier.
# `pytest -m fast` (everything else) is the <2-min inner-loop tier;
# `pytest -m slow` is the long tier (VERDICT r4 #9).
_SLOW_FILES = {
    "test_circuit_gadgets_ext.py", "test_constraint_counts.py",
    "test_credits_parity.py", "test_credits_private_flows.py",
    "test_cross_program_proof.py", "test_deploy.py", "test_deploy_tx.py",
    "test_dround.py", "test_ec_pallas.py", "test_execute_prove.py",
    "test_inclusion.py", "test_inclusion_batch.py", "test_kzg.py",
    "test_ledger_advance.py", "test_msm_v2.py", "test_networks.py",
    "test_parallel.py", "test_protocol_circuit.py",
    "test_puzzle_synthesis.py", "test_quorum_blocks.py",
    "test_record_gadget.py", "test_records_e2e.py",
    "test_reference_artifacts.py", "test_rejected_tx.py",
    "test_rest_query.py", "test_run_prove.py",
    "test_sign_verify_gadget.py", "test_synthesizer_golden.py",
    "test_transfer_private.py", "test_varuna.py", "test_vm_golden.py",
    "test_vm_proofs.py", "test_keccak_gadget.py", "test_ledger.py",
    "test_bonding.py", "test_fees.py", "test_checkpoint_resume.py",
    "test_ec_msm.py", "test_ntt.py", "test_ntt_fused.py",
    "test_ntt_mxu.py", "test_dpoly.py", "test_fixed_base.py",
    "test_poseidon.py", "test_limb_fields.py", "test_cross_program.py",
    "test_vm.py", "test_finalize.py", "test_credits.py",
    "test_committer_key.py", "test_powers_of_g.py", "test_request_gadget.py",
    "test_integer_gadgets.py", "test_struct_gadget.py",
    "test_string_gadget.py", "test_srs_artifacts.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        fname = item.fspath.basename
        if fname in _SLOW_FILES:
            item.add_marker(_pytest.mark.slow)
        else:
            item.add_marker(_pytest.mark.fast)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: proof/synthesis-heavy tests")
    config.addinivalue_line("markers", "fast: <2-min inner-loop tier")
    # with pytest-xdist active (-n N), group tests by file: the
    # compile-heavy field/curve modules must not interleave across
    # workers. Bare pytest (or no xdist installed) is unaffected.
    if getattr(config.option, "numprocesses", None) and \
            getattr(config.option, "dist", "no") in ("no", "load"):
        config.option.dist = "loadfile"
