"""Format advisor — preflight structure probes -> recommended container.

The reference ships per-format *guard* probes (``ell_t::max_nnz_per_row``,
reference: container/ell.hxx:91-102; ``dia_t::count_diagonals``,
container/dia.hxx:98-116) that protect against memory blow-up, but the
format choice itself is left to the user.  On TPU the choice is a
measured performance decision: CSR-family kernels are floored by the
per-index gather issue rate (~2.5 ns/index on v5e regardless of
locality — docs/concepts/tpu-performance.md §1), so a format that
replaces per-nonzero gathers with dense streamed reads (DIA diagonals,
BCSR R×C blocks on the MXU) wins exactly when its padding waste stays
under the gather-vs-stream break-even.

``advise(csr)`` runs all probes (each O(nnz), vectorized) and returns
per-format cost estimates from that two-constant model plus a gated
recommendation; ``choose_format(csr)`` returns just the format name.
This is the format-axis companion of ``schedule.choose_schedule`` (the
reference's best-of-3 oracle study, plots/data/heuristics.csv).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Measured on the tunneled v5e (scripts/tpu_gather_probe.py): one gather
# issue per index, independent of width up to 128 lanes.  Other
# generations issue faster but the *ratio* to their HBM rate is similar,
# so the break-evens below move little across chips.
GATHER_NS = 2.5

# Round-3 CSR SpMV cost: choose_schedule routes CSR through the
# sorted-gather Pallas kernel (ops/kernels/spmv_sorted.py), whose
# in-register shuffles replace the per-index issues — measured
# 1.12 ms at 4.39M nnz on v5e (bench r3) ≈ 0.26 ns/nnz.  ELL keeps the
# XLA-tier per-cell cost (its padded plane gathers don't sort).
# ``_csr_ns_per_nnz`` applies this only inside the sorted kernel's
# envelope; outside it (wide x past the resident cap, column-scattered
# chunk padding, f64 values) the kernel refuses and the operator falls
# back to the ~GATHER_NS XLA tier, so the estimate must too.
CSR_SORTED_NS = 0.26

# sorted-kernel envelope mirrors (ops/kernels/spmv_sorted.py defaults)
_SORTED_X_CAP_COLS = 8192 * 128     # x_sublanes_cap * LANES
_SORTED_SPAN_COLS = 768 * 128       # span_cap sublanes, in columns
_SORTED_PAD_CAP = 4.0
_SORTED_BLOCK_ATOMS = 8 * 8 * 128   # vregs_per_block * 8 * LANES


def _csr_ns_per_nnz(csr) -> float:
    """Per-nnz CSR SpMV estimate matching the kernel that will run:
    the sorted-gather rate inside its envelope, the XLA gather floor
    outside it (advisor must not recommend CSR over BCSR/DIA in the
    regimes where the fast kernel refuses)."""
    if np.dtype(csr.vals.dtype) == np.float64:
        return GATHER_NS            # pallas3 stages f32; f64 -> XLA tier
    if csr.cols > _SORTED_X_CAP_COLS:
        return GATHER_NS            # x exceeds the resident-x cap
    nnz = max(csr.nnz, 1)
    # chunk population if span_cap binds: atoms per (block, span window)
    k_eff = min(_SORTED_BLOCK_ATOMS, nnz)
    per_chunk = min(1024.0,
                    k_eff * _SORTED_SPAN_COLS / max(csr.cols, 1))
    pad = 1024.0 / max(per_chunk, 1e-9)
    if pad > _SORTED_PAD_CAP and pad * nnz > 1 << 20:
        return GATHER_NS            # column-scattered: pad_cap refusal
    return CSR_SORTED_NS

# BCSR break-even block fill measured end-to-end on v5e (grouped
# block-sparse Pallas kernel vs merge-path CSR at matched nnz); below
# this the dense-block stream costs more than the gathers it removes.
BCSR_MIN_FILL = 0.015

# ELL executes the same per-cell gathers as CSR *including padding*, so
# it only ever helps by removing plan overhead; cap the waste.  The cap
# doubles as the plan-overhead budget: recommending ELL over CSR is only
# coherent while the extra padded gathers (est_ms['ell']/est_ms['csr']
# <= ELL_MAX_WASTE) stay under the plan build/dispatch cost they save,
# which on v5e is worth ~25% of a single SpMV pass.
ELL_MAX_WASTE = 1.25

# DIA memory blow-up guard (the purpose of the reference's
# count_diagonals probe, dia.hxx:98-116): the stream model alone would
# pick DIA down to ~0.2% fill, but a 20x storage expansion also means a
# 20x conversion/build cost and per-diagonal kernel overhead the model
# doesn't carry, so require at least 5% dense-diagonal occupancy.
DIA_MIN_FILL = 0.05


@dataclass
class FormatAdvice:
    """Probe results + cost-model estimates for one input matrix."""

    rows: int
    cols: int
    nnz: int
    # probes
    bcsr_fill: float            # nnz / stored block cells at bcsr_block
    bcsr_block: tuple           # (R, C) probed (launch-box default)
    dia_fill: float             # nnz / (num_diagonals * rows)
    num_diagonals: int
    ell_waste: float            # rows * pitch / nnz
    ell_pitch: int
    # estimated single-pass SpMV cost per format, milliseconds
    est_ms: dict = field(default_factory=dict)
    recommended: str = "csr"
    why: str = ""


def _stream_ns_per_cell(hbm_gbps: float, itemsize: int = 4) -> float:
    return itemsize / hbm_gbps  # bytes / (GB/s) = ns


def probe_bcsr_fill(csr, block_rows: int = 8, block_cols: int = 128) -> float:
    """Fraction of stored-block cells that hold a nonzero (O(nnz log nnz)
    — np.unique sorts; the BCSR analog of the reference's preflight
    probes, which call out exactly this sort-vs-hash cost on power-law
    graphs, reference: container/dia.hxx:103-105)."""
    if csr.nnz == 0:
        return 0.0
    nbc = -(-csr.cols // block_cols)
    keys = (csr.row_ids().astype(np.int64) // block_rows) * nbc + (
        csr.indices.astype(np.int64) // block_cols)
    nblocks = len(np.unique(keys))
    return csr.nnz / float(nblocks * block_rows * block_cols)


def advise(csr, hbm_gbps: float | None = None,
           bcsr_block: tuple | None = None) -> FormatAdvice:
    """Probe ``csr`` and estimate per-format SpMV cost.

    Cost model (all constants measured, see module docstring):
      csr  ≈ nnz · GATHER_NS                      (issue-rate floor)
      ell  ≈ rows · pitch · GATHER_NS             (pads the gathers)
      dia  ≈ ndiag · rows · stream                (pure stream, no gather)
      bcsr ≈ nblocks · (GATHER_NS + R·C · stream) (one x-row issue/block)
    """
    from loops_tpu.formats.dia import DIA
    from loops_tpu.formats.ell import ELL

    if hbm_gbps is None:
        try:
            from loops_tpu.tuning.launch_box import launch_params
            params = launch_params()
            hbm_gbps = params.hbm_gbps
            if bcsr_block is None:
                bcsr_block = params.bcsr_block
        except Exception:  # no jax backend available (pure-host use)
            hbm_gbps = 819.0
    if bcsr_block is None:
        bcsr_block = (8, 128)
    R, C = bcsr_block
    stream = _stream_ns_per_cell(hbm_gbps)

    nnz = max(csr.nnz, 1)
    bcsr_fill = probe_bcsr_fill(csr, R, C)
    nblocks = nnz / max(bcsr_fill * R * C, 1e-12) if csr.nnz else 0.0
    ndiag = DIA.count_diagonals(csr)
    dia_cells = ndiag * max(csr.rows, 1)
    dia_fill = csr.nnz / max(dia_cells, 1)
    pitch = ELL.max_nnz_per_row(csr)
    ell_cells = max(csr.rows, 1) * pitch
    ell_waste = ell_cells / nnz

    est_ms = {
        "csr": nnz * _csr_ns_per_nnz(csr) * 1e-6,
        "ell": ell_cells * GATHER_NS * 1e-6,
        "dia": dia_cells * stream * 1e-6,
        "bcsr": nblocks * (GATHER_NS + R * C * stream) * 1e-6,
    }

    adv = FormatAdvice(csr.rows, csr.cols, csr.nnz, bcsr_fill,
                       (R, C), dia_fill, ndiag, ell_waste, pitch, est_ms)
    if csr.nnz == 0:
        adv.recommended, adv.why = "csr", "empty matrix"
        return adv

    # Gates first (measured break-evens), cost model as tie-break: the
    # model is a lower bound per format, so only trust it where the
    # measured gate already says the regime applies.
    candidates = {"csr": est_ms["csr"]}
    if dia_fill >= DIA_MIN_FILL and est_ms["dia"] < est_ms["csr"]:
        candidates["dia"] = est_ms["dia"]
    if bcsr_fill >= BCSR_MIN_FILL and est_ms["bcsr"] < est_ms["csr"]:
        candidates["bcsr"] = est_ms["bcsr"]
    best = min(candidates, key=candidates.get)
    if (best == "csr" and ell_waste <= ELL_MAX_WASTE
            and est_ms["ell"] <= est_ms["csr"] * 1.25):
        # plan-free static layout, within the 25% overhead budget —
        # with the sorted-gather CSR kernel this rarely fires anymore
        # (ELL's padded plane pays XLA-tier per-cell gathers)
        best = "ell"
    adv.recommended = best
    adv.why = {
        "csr": f"gather floor {est_ms['csr']:.3g} ms beats every dense "
               f"candidate (bcsr fill {bcsr_fill:.2%} < {BCSR_MIN_FILL:.1%},"
               f" dia {ndiag} diagonals)",
        "ell": f"near-uniform rows (waste {ell_waste:.2f}x): est_ms is "
               f"{ell_waste:.2f}x CSR's, but the plan-free static layout "
               "saves per-pass schedule build/dispatch overhead the cost "
               "model does not carry (budgeted at <=25% of a pass)",
        "dia": f"{ndiag} diagonals stream at {est_ms['dia']:.3g} ms vs "
               f"{est_ms['csr']:.3g} ms of gathers",
        "bcsr": f"block fill {bcsr_fill:.2%} >= {BCSR_MIN_FILL:.1%}: MXU "
                f"block stream {est_ms['bcsr']:.3g} ms vs "
                f"{est_ms['csr']:.3g} ms of gathers",
    }[best]
    return adv


def choose_format(csr, **kw) -> str:
    """Recommended container name for ``csr`` ('csr'/'ell'/'dia'/'bcsr')."""
    return advise(csr, **kw).recommended
