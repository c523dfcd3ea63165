"""Isolate Mosaic-vs-interpret divergence in the v2 SpMV constructs.

Each probe is a tiny pallas_call exercising ONE suspicious construct;
run compiled on the TPU and compared against interpret mode.
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

S = 128
SUB = 4
LANES = 128
GS = 32  # GROUP * SUB


def run(name, kernel, out_shape, *args):
    got = pl.pallas_call(kernel, out_shape=out_shape,
                         interpret=False)(*args)
    want = pl.pallas_call(kernel, out_shape=out_shape,
                          interpret=True)(*args)
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, atol=1e-5)
    print(f"{name:40s} {'OK' if ok else 'DIVERGES'}"
          f"{'' if ok else f'  maxdiff={np.abs(got - want).max()}'}",
          flush=True)


rng = np.random.default_rng(0)

# 1. reshape a [S] row slice to (S, 1) and build a one-hot from it
idx_row = jnp.asarray(rng.integers(0, 16, size=(8, S)).astype(np.int32))


def k_reshape_s1(idx_ref, o_ref):
    v = idx_ref[0, :].reshape(S, 1)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (S, 16), 1) == v)
    o_ref[:] = oh.astype(jnp.float32)


run("row-slice reshape (S,1) + one-hot", k_reshape_s1,
    jax.ShapeDtypeStruct((S, 16), jnp.float32), idx_row)

# 2. [1, R] -> [R//128, 128] output reshape
R = 512
vec = jnp.asarray(rng.normal(size=(1, R)).astype(np.float32))


def k_out_reshape(v_ref, o_ref):
    o_ref[:] = v_ref[:].reshape(R // LANES, LANES)


run("[1,R] -> [R/128,128] reshape", k_out_reshape,
    jax.ShapeDtypeStruct((R // LANES, LANES), jnp.float32), vec)

# 3. sublane shift via pad+slice on [GS, LANES]
mat = jnp.asarray(rng.normal(size=(GS, LANES)).astype(np.float32))


def k_shift_sub(m_ref, o_ref):
    a = m_ref[:]
    o_ref[:] = jnp.pad(a, ((2, 0), (0, 0)))[:GS, :]


run("sublane shift pad+slice", k_shift_sub,
    jax.ShapeDtypeStruct((GS, LANES), jnp.float32), mat)

# 4. lane shift via pad+slice
def k_shift_lane(m_ref, o_ref):
    a = m_ref[:]
    o_ref[:] = jnp.pad(a, ((0, 0), (3, 0)))[:, :LANES]


run("lane shift pad+slice", k_shift_lane,
    jax.ShapeDtypeStruct((GS, LANES), jnp.float32), mat)

# 5. iota % SUB gating on sublane dim
def k_iota_mod(m_ref, o_ref):
    a = m_ref[:]
    sib = jax.lax.broadcasted_iota(jnp.int32, (GS, LANES), 0) % SUB
    o_ref[:] = jnp.where(sib >= 1, a, 0.0)


run("broadcasted_iota %SUB gate", k_iota_mod,
    jax.ShapeDtypeStruct((GS, LANES), jnp.float32), mat)

# 6. lane-broadcast of last lane: v[:, 127:128] -> (GS, LANES)
def k_lane_bcast(m_ref, o_ref):
    a = m_ref[:]
    o_ref[:] = jnp.broadcast_to(a[:, LANES - 1:LANES], (GS, LANES))


run("last-lane broadcast", k_lane_bcast,
    jax.ShapeDtypeStruct((GS, LANES), jnp.float32), mat)

# 7. dot_general contracting dim0 (SUB small) with 3-split
sc = jnp.asarray(rng.normal(size=(SUB, LANES)).astype(np.float32))
su = jnp.asarray((rng.integers(0, 2, size=(SUB, S))).astype(np.float32))


def k_dot0(a_ref, b_ref, o_ref):
    a, b = a_ref[:], b_ref[:]
    dims = (((0,), (0,)), ((), ()))
    o_ref[:] = jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32)


run("dot_general contract dim0 (SUBxLANES . SUBxS)", k_dot0,
    jax.ShapeDtypeStruct((LANES, S), jnp.float32), sc, su)

# 8. dynamic-base accumulation y[pl.ds(base,k), :] += v
y0 = jnp.zeros((16, LANES), jnp.float32)
v8 = jnp.asarray(rng.normal(size=(4, LANES)).astype(np.float32))
base = jnp.asarray([3], dtype=jnp.int32)


def k_dynbase(b_ref, v_ref, y_ref):
    y_ref[:] = jnp.zeros_like(y_ref)
    y_ref[pl.ds(b_ref[0], 4), :] += v_ref[:]


run("dynamic-base accumulate", k_dynbase,
    jax.ShapeDtypeStruct((16, LANES), jnp.float32), base, v8)
