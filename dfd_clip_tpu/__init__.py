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
