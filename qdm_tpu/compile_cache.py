"""Persistent XLA compile cache shared by every bench/tool script.

/tmp is wiped between driver sessions (observed in round 3: a fresh
session cost a full cold recompile of the headline bench, 10-25 min
of remote-compile round trips through the axon tunnel), so the cache
lives inside the repo by default — it survives restarts and keeps the
driver's round-end bench.py run warm.

Override the location with QDM_JAX_CACHE; set it to the empty string
to disable caching entirely.
"""

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = os.path.join(_REPO, ".jax_cache")


def enable(path: str = None, min_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at a repo-local dir.

    Call before the first compile (import-time in bench scripts).
    min_secs: compiles faster than this are not cached (tests pass a
    lower threshold — tiny-model CPU compiles mostly finish under 1s).
    Returns the cache dir in use ('' if disabled).
    """
    import jax

    cache = path if path is not None else os.environ.get(
        "QDM_JAX_CACHE", DEFAULT)
    if not cache:
        return ""
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    return cache
