"""Launch-box resolution + timer/bench utilities."""
import numpy as np

from loops_tpu.tuning import LaunchParams, launch_params
from loops_tpu.tuning.launch_box import _FALLBACK, _TABLE
from loops_tpu.utils.bench import chained_ms, chained_ms_pair
from loops_tpu.utils.timer import Timer, time_fn


class FakeDevice:
    def __init__(self, kind, platform="tpu"):
        self.device_kind = kind
        self.platform = platform


def test_launch_params_first_match_wins():
    p = launch_params(FakeDevice("TPU v5 lite"))
    assert p.spmv_block == 8192 and p.hbm_gbps == 819.0
    p = launch_params(FakeDevice("TPU v5p"))
    assert p.hbm_gbps > 2000
    p = launch_params(FakeDevice("TPU v4"))
    assert p.hbm_gbps == 1228.0


def test_launch_params_fallback():
    assert launch_params(FakeDevice("TPU v99 hyperchip")) == _FALLBACK


def test_launch_params_cpu_backend():
    p = launch_params(FakeDevice("anything", platform="cpu"))
    assert p.spmv_block == 64  # tiny blocks exercise multi-block paths


def test_launch_params_resolves_current_device():
    assert isinstance(launch_params(), LaunchParams)


def test_timer_and_chained():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 1.5 + 1.0)
    x = jnp.ones((8, 128))
    t = Timer().start()
    y = f(x)
    assert t.stop(y) >= 0.0
    assert time_fn(f, x, iters=3) >= 0.0
    assert chained_ms(f, x, iters=4) >= 0.0

    g = jax.jit(lambda x: jnp.sum(x, axis=0))  # shape-changing
    assert chained_ms_pair(g, x, iters=4) >= 0.0


def test_compiled_counters_and_achieved():
    """XLA cost-analysis counters + achieved-rate derivation (the
    CUPTI-metrics analog, reference benchmarks/spmv/work_oriented.cu:
    37-44)."""
    import jax.numpy as jnp

    from loops_tpu.utils.counters import achieved, compiled_counters

    x = jnp.ones((256, 256))
    c = compiled_counters(lambda a, b: a @ b, x, x)
    if not c:  # backend without cost analysis: utility degrades to {}
        assert achieved(c, 1.0) == {}
        return
    assert c.get("flops", 0) >= 2 * 256**3 * 0.9
    a = achieved(c, 1.0, hbm_gbps=819.0, peak_tflops=197.0)
    assert 0 < a["hbm_utilization"] < 1
    assert 0 < a["mxu_utilization"] < 1
