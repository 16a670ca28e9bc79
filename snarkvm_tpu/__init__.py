"""snarkvm_tpu — a TPU-native zkSNARK framework with the capabilities of snarkVM.

Built from scratch on JAX/XLA/Pallas. See SURVEY.md for the blueprint.
"""
__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compile cache: the fused Mosaic EC kernels take
    minutes to compile on TPU (one-time); cache them across processes."""
    try:
        import jax

        # CPU-only processes (tests, the driver's virtual-mesh dryrun)
        # must NOT use the persistent cache: XLA:CPU AOT entries embed
        # host machine features and fail to load across hosts/flag sets,
        # spamming errors and recompiling anyway. The cache pays off on
        # TPU, where Mosaic kernel compiles take minutes.
        if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            return
        # A repo-committed cache (tpu_cache/) ships warm TPU executables
        # for the bench configs so a fresh driver run doesn't pay the
        # multi-minute cold Mosaic compiles (VERDICT r4 #3: "persist it
        # across driver runs"). Explicit SNARKVM_TPU_JAX_CACHE wins; the
        # committed cache is used when present; else the home-dir cache.
        repo_cache = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tpu_cache")
        path = _os.environ.get(
            "SNARKVM_TPU_JAX_CACHE",
            repo_cache if _os.path.isdir(repo_cache)
            else _os.path.expanduser("~/.cache/snarkvm_tpu_jax"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
