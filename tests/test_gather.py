"""gather1d: the TPU fast-path gather must match the plain gather."""
import numpy as np

from loops_tpu.ops.gather import gather1d
from loops_tpu.utils import generate


def test_gather1d_trick_matches_plain():
    rng = np.random.default_rng(0)
    x = rng.normal(size=1000).astype(np.float32)
    idx = rng.integers(0, 1000, size=(7, 53)).astype(np.int32)
    got = np.asarray(gather1d(x, idx, force_trick=True))
    assert np.array_equal(got, x[idx])


def test_gather1d_aligned_table():
    rng = np.random.default_rng(1)
    x = rng.normal(size=256).astype(np.float32)
    idx = rng.integers(0, 256, size=999).astype(np.int32)
    got = np.asarray(gather1d(x, idx, force_trick=True))
    assert np.array_equal(got, x[idx])


def test_gather1d_bf16():
    import jax.numpy as jnp
    x = jnp.arange(200, dtype=jnp.bfloat16)
    idx = np.arange(199, -1, -1)
    got = np.asarray(gather1d(x, idx, force_trick=True))
    assert np.array_equal(got, np.asarray(x)[idx])
