"""Exact f32 gathers through default-precision MXU dots.

The MXU truncates f32 inputs to bf16 (8 mantissa bits). When the other
operand is a 0/1 one-hot, a dot is just a selection/sum, so splitting
the value operand into three bf16-representable terms (8+8+8 >= f32's
24 mantissa bits) and summing three dots reconstructs the f32 values
exactly (up to f32 addition rounding). Used by the SpMV extraction
kernels; costs 3 MXU passes instead of 1.
"""
from __future__ import annotations


def exact_onehot_dot(x, onehot):
    """x [M, K] f32, onehot [K, N] 0/1 f32 -> exact f32 [M, N]."""
    import jax.numpy as jnp

    h1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - h1
    h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    r2 = r1 - h2
    return (jnp.dot(h1, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(h2, onehot, preferred_element_type=jnp.float32)
            + jnp.dot(r2, onehot, preferred_element_type=jnp.float32))
