"""Benes 3-stage routing of static [R, 128] permutations.

``benes_route(dest)`` factors each block's permutation into the three
in-VREG shuffle stages a TPU can execute (lane / sublane / lane
gathers) — see native/src/benes_route.cpp for the construction. The
native tier does the Euler-circuit edge coloring in C++; the Python
fallback implements the identical algorithm (slow — used only when no
compiler is available, e.g. sandboxed CI).

Gather conventions (match jnp.take_along_axis):
    a1[r, c]  = x[r, s1[r, c]]
    a2[r, c]  = a1[s2[r, c], c]
    out[r, l] = a2[r, s3[r, l]]
so ``out.flat[dest[e]] == x.flat[e]``.
"""
from __future__ import annotations

import numpy as np

LANES = 128


def _route_python(dest_block: np.ndarray, rows: int):
    """Reference implementation of the Euler-split edge coloring."""
    n = rows * LANES
    color = np.zeros(n, dtype=np.int32)
    d = dest_block

    def split(eids, D, base):
        if D == 1:
            color[eids] = base
            return
        # bipartite multigraph: left = source rows, right = dest rows
        nodes = 2 * rows
        inc = [[] for _ in range(nodes)]
        for slot, e in enumerate(eids):
            inc[e // LANES].append(slot)
            inc[rows + d[e] // LANES].append(slot)
        ptr = [0] * nodes
        used = np.zeros(len(eids), dtype=bool)
        half = np.zeros(len(eids), dtype=bool)
        for s0 in range(len(eids)):
            if used[s0]:
                continue
            circuit = []
            walk = [(eids[s0] // LANES, -1)]
            while walk:
                x, in_slot = walk[-1]
                found = -1
                while ptr[x] < len(inc[x]):
                    slot = inc[x][ptr[x]]
                    if not used[slot]:
                        found = slot
                        break
                    ptr[x] += 1
                if found < 0:
                    walk.pop()
                    if in_slot >= 0:
                        circuit.append(in_slot)
                else:
                    used[found] = True
                    e = eids[found]
                    u, v = e // LANES, rows + d[e] // LANES
                    walk.append((v if x == u else u, found))
            for k, slot in enumerate(circuit):
                half[slot] = bool(k & 1)
        split(eids[~half], D // 2, base)
        split(eids[half], D // 2, base + D // 2)

    split(np.arange(n, dtype=np.int64), LANES, 0)

    s1 = np.zeros(n, dtype=np.int32)
    s2 = np.zeros(n, dtype=np.int32)
    s3 = np.zeros(n, dtype=np.int32)
    e = np.arange(n)
    srow, slane = e // LANES, e % LANES
    drow, dlane = d // LANES, d % LANES
    s1[srow * LANES + color] = slane
    s2[drow * LANES + color] = srow
    s3[drow * LANES + dlane] = color
    return s1, s2, s3


def benes_route(dest: np.ndarray):
    """Route blocks of permutations.

    ``dest``: int array [n_blocks, rows*128]; each row a permutation of
    [0, rows*128) giving the destination flat position of every source
    flat position. Returns (s1, s2, s3), each [n_blocks, rows*128]
    int32 stage-index arrays.
    """
    dest = np.ascontiguousarray(dest, dtype=np.int32)
    if dest.ndim != 2:
        raise ValueError(f"dest must be 2-D, got shape {dest.shape}")
    nb, n = dest.shape
    if n % LANES:
        raise ValueError(f"block size {n} not a multiple of {LANES}")
    rows = n // LANES

    from loops_tpu.native.build import load_library
    lib = load_library()
    if lib is not None and hasattr(lib, "benes_route"):
        import ctypes
        s1 = np.empty((nb, n), dtype=np.int32)
        s2 = np.empty((nb, n), dtype=np.int32)
        s3 = np.empty((nb, n), dtype=np.int32)
        p = ctypes.POINTER(ctypes.c_int32)
        rc = lib.benes_route(
            ctypes.c_int64(nb), ctypes.c_int32(rows),
            dest.ctypes.data_as(p), s1.ctypes.data_as(p),
            s2.ctypes.data_as(p), s3.ctypes.data_as(p))
        if rc == 0:
            return s1, s2, s3
    out = [_route_python(dest[b], rows) for b in range(nb)]
    return tuple(np.stack([o[i] for o in out]) for i in range(3))


def apply_route(x: np.ndarray, s1, s2, s3):
    """Host-side simulation of the three gather stages (for tests)."""
    rows = x.shape[0]
    a1 = np.take_along_axis(x, s1.reshape(rows, LANES), axis=1)
    a2 = np.take_along_axis(a1, s2.reshape(rows, LANES), axis=0)
    return np.take_along_axis(a2, s3.reshape(rows, LANES), axis=1)
