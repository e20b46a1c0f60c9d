"""Tool bootstrap: repo-root import path + persistent XLA compile cache.

Run tools directly (``python tools/flagship.py``) from anywhere: the repo
root is inserted into ``sys.path`` at runtime, which — unlike exporting
``PYTHONPATH`` — does not disturb the site-path entries the TPU plugin
(axon) relies on.  The persistent compile cache turns repeat tool
invocations into cache lookups (first n15 compile is minutes; warm is
seconds).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
# 0.05, not 0.5: the deep eager circuits (bootstrap debug tools) issue
# hundreds of small per-op compiles; at 0.5 they fall below the persist
# threshold and every fresh process re-pays the whole sweep (~30-45 min
# per tool run on the 2-core host).
