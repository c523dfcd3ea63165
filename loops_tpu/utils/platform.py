"""Platform selection helper.

Sandbox images may pre-import jax with a pinned platform (e.g. a
tunneled TPU) via sitecustomize, which makes ``JAX_PLATFORMS`` in the
environment ineffective. ``ensure_platform()`` honors the
``LOOPS_PLATFORM`` environment variable through the config API, which
still works as long as no backend has been initialized.
"""
from __future__ import annotations

import os


def ensure_platform(default: str | None = None) -> str:
    import jax

    want = os.environ.get("LOOPS_PLATFORM", default)
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    return jax.default_backend()


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5) -> str:
    """Turn on JAX's persistent (disk) compilation cache.

    The cache is keyed on the HLO fingerprint, so two *different*
    operator closures with identical bucketed shapes (and buffers
    riding as jit arguments, per the operator protocol) share one
    compiled executable — in-process, across processes, and across
    sweep resumes. This is what makes a 114-matrix x 5-schedule sweep
    compile-bound only on the *distinct shape buckets*, not on every
    (matrix, schedule) combo (the reference's per-arch launch_box
    trades the same way at build time, util/launch_box.hxx:176-214).
    """
    import jax

    if jax.default_backend() == "cpu":
        # CPU executables are AOT-compiled against exact host machine
        # features; reloading them on a different host (or after a
        # sandbox migration) trips XLA's feature-mismatch warnings for
        # no win — the cache only pays off for the slow Mosaic/TPU tier
        return ""
    path = path or os.environ.get(
        "LOOPS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "loops_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
