"""gkr-msm-tpu: TPU-native GKR-MSM proving framework."""
import os as _os

import jax as _jax

# Persistent XLA compilation cache. NOTE: XLA:CPU AOT cache loading is
# unreliable (machine-feature mismatches -> SIGILL), so the cache is only
# enabled when explicitly requested via GKR_MSM_JAX_CACHE (recommended on
# TPU, where round-kernel shape compiles are expensive and AOT is stable).
_cache_dir = _os.environ.get("GKR_MSM_JAX_CACHE")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("GKR_MSM_JAX_CACHE_MIN", "0.3")),
        )
    except Exception:  # older jax without these flags
        pass
