"""dfd_clip_tpu — TPU-native video deepfake-detection framework."""

import os

__version__ = "0.1.0"

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
# through the config API so `JAX_PLATFORMS=cpu python main.py ...` behaves as
# documented (tests/CI run on a virtual CPU mesh this way).
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    import jax

    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

# Persistent XLA compilation cache (first flagship compile is ~5 min on TPU;
# cached restarts skip it). Opt out with JAX_COMPILATION_CACHE_DIR="".
if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/dfd-clip/jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
