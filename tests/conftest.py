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


def pytest_configure(config):
    # with pytest-xdist active (-n N), group tests by file: the
    # compile-heavy field/curve modules must not interleave across
    # workers. Bare pytest (or no xdist installed) is unaffected.
    if getattr(config.option, "numprocesses", None) and \
            getattr(config.option, "dist", "no") in ("no", "load"):
        config.option.dist = "loadfile"
