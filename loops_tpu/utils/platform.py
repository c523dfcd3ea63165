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
