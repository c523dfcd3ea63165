"""SDDMM — sampled dense-dense matrix multiplication.

``out_nz = vals_nz * <A[row_nz, :], B[col_nz, :]>`` — the second half of
the GNN primitive pair (attention-style edge scoring). No reference
analog (the reference stops at SpMV/SpMM); required by the north star
(BASELINE.json config 3).

* CSR/COO — XLA gather-einsum over nonzeros (returns values in storage
  order, composable with the containers).
* BCSR — Pallas kernel: per stored block, ``A_rows @ B_cols^T`` on the
  MXU with feature-tile accumulation (ops/kernels/sddmm_bcsr.py).
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats import BCSR, COO, CSR

__all__ = ["sddmm", "SDDMMOperator"]


class SDDMMOperator:
    def __init__(self, mat, impl: str = "xla", block_f: int = 512):
        import jax

        self.mat = mat
        if isinstance(mat, BCSR) and impl == "pallas":
            from loops_tpu.ops.kernels.sddmm_bcsr import bcsr_sddmm_pallas
            fn = bcsr_sddmm_pallas(mat, block_f=block_f)
        elif isinstance(mat, CSR):
            fn = self._build_nz(mat.row_ids(), mat.indices, mat.vals)
        elif isinstance(mat, COO):
            fn = self._build_nz(mat.rows, mat.cols, mat.vals)
        elif isinstance(mat, BCSR):
            fn = self._build_bcsr_xla(mat)
        else:
            raise TypeError(f"sddmm: unsupported format {type(mat).__name__}")
        self._fn = jax.jit(fn)

    @staticmethod
    def _build_nz(rid_np, cid_np, vals_np):
        import jax.numpy as jnp

        rid = jnp.asarray(rid_np)
        cid = jnp.asarray(cid_np)
        vals = jnp.asarray(vals_np)

        def fn(A, B):
            dots = jnp.einsum("nf,nf->n", A[rid], B[cid])
            return vals * dots
        return fn

    @staticmethod
    def _build_bcsr_xla(bcsr: BCSR):
        import jax.numpy as jnp

        R, C = bcsr.block_shape
        brow = jnp.asarray(bcsr.block_row_ids())
        bcol = jnp.asarray(bcsr.block_cols)
        vals = jnp.asarray(bcsr.vals)
        rows, cols = bcsr.shape

        def fn(A, B):
            F = A.shape[1]
            Ap = jnp.zeros((bcsr.num_block_rows * R, F), A.dtype
                           ).at[:rows].set(A)
            Bp = jnp.zeros((bcsr.num_block_cols * C, F), B.dtype
                           ).at[:cols].set(B)
            Ab = Ap.reshape(-1, R, F)[brow]          # [nb, R, F]
            Bb = Bp.reshape(-1, C, F)[bcol]          # [nb, C, F]
            dots = jnp.einsum("brf,bcf->brc", Ab, Bb)
            return vals * dots
        return fn

    def __call__(self, A, B):
        import jax.numpy as jnp
        return self._fn(jnp.asarray(A), jnp.asarray(B))


def _op_cache(mat) -> dict:
    cache = getattr(mat, "_sddmm_ops", None)
    if cache is None:
        cache = {}
        object.__setattr__(mat, "_sddmm_ops", cache)
    return cache


def sddmm(mat, A, B, impl: str = "xla", block_f: int = 512):
    """Sampled products at the sparsity pattern of ``mat``.

    Returns per-nonzero values in the container's storage order (CSR/COO)
    or per-block dense payloads (BCSR).
    """
    key = (impl, block_f)
    cache = _op_cache(mat)
    if key not in cache:
        cache[key] = SDDMMOperator(mat, impl, block_f)
    return cache[key](A, B)
