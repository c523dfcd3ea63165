"""Memoized device queries (reference: util/device.hxx:25-131).

The reference caches cudaGetDeviceProperties because the ~1 ms query
would dominate small-matrix timings; the JAX analogs (device_kind,
memory stats, core counts) are cheaper but still worth one lookup per
process — and the memo gives a single seam for tests to fake a device.
"""
from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=None)
def _properties(device_id: int = 0) -> dict:
    import jax

    d = jax.devices()[device_id]
    stats = {}
    try:
        stats = dict(d.memory_stats() or {})
    except Exception:
        pass
    return {
        "platform": d.platform,
        "device_kind": getattr(d, "device_kind", "unknown"),
        "num_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "bytes_limit": stats.get("bytes_limit"),
        "bytes_in_use": stats.get("bytes_in_use"),
    }


def properties(device_id: int = 0) -> dict:
    return _properties(device_id)


def device_kind(device_id: int = 0) -> str:
    return properties(device_id)["device_kind"]


def num_devices() -> int:
    return properties()["num_devices"]


def clear_cache() -> None:
    _properties.cache_clear()
