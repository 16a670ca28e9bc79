"""Test configuration: force a deterministic 8-virtual-device CPU mesh.

Kernels are written for TPU but are platform-portable JAX; tests validate
semantics on CPU (fast, deterministic) with 8 virtual devices so the
multi-chip sharding paths (snarkvm_tpu.parallel) are exercised without TPU
hardware. Benchmarks (bench.py) run on the real chip.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
