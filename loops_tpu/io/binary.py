"""Binary CSR cache format.

The reference *hints* at a ``.csr`` binary cache (util/filepath.hxx:33-35
recognizes the extension) but ships no reader/writer; we provide one, since
the 3-day SuiteSparse sweep was dominated by .mtx parsing (reference:
site/content/reproducing-results.md:22). Stored as a single ``.npz`` with
shape + the three CSR arrays.
"""
from __future__ import annotations

import numpy as np

from loops_tpu.formats import CSR

_MAGIC = "loops-tpu-csr-v1"


def save_csr(path, csr: CSR) -> None:
    np.savez(path, magic=_MAGIC, shape=np.asarray(csr.shape, np.int64),
             offsets=csr.offsets, indices=csr.indices, vals=csr.vals)


def load_csr(path) -> CSR:
    with np.load(path, allow_pickle=False) as z:
        if str(z["magic"]) != _MAGIC:
            raise ValueError(f"{path}: not a loops-tpu binary CSR file")
        return CSR(tuple(z["shape"]), z["offsets"], z["indices"], z["vals"])
