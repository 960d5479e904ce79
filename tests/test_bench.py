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
