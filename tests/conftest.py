import os

# Tests always run on a virtual 8-device CPU mesh (the shell environment
# forces JAX_PLATFORMS=axon — the tunneled TPU — which must not be touched
# from pytest; real-TPU runs use bench.py).  Pytest plugins (jaxtyping) may
# import jax before this file runs, so set the config directly too.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persist EVERY compile: deep eager circuits pay ~200ms XLA-CPU compile per
# primitive per level; the cache turns repeat runs (and repeat shapes across
# tests) into lookups.  Kept inside the repo so it survives /tmp cleanup.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
