"""Utility subpackage."""


def enable_compilation_cache(path: str = "/tmp/rmem_tpu_jax_cache"):
    """Persistent XLA compilation cache — first compile of the big
    inference/training graphs is minutes on low-core hosts; repeats are
    free."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
