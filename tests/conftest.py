"""Pytest harness: force an 8-device virtual CPU mesh so every multi-chip
code path (shard_map / pjit over a Mesh) is exercised hermetically, the
standard JAX fake-multi-device strategy (SURVEY.md §4).

Must set the env vars *before* jax is imported anywhere.
"""

import os
import sys

# Force, don't setdefault: the dev image exports JAX_PLATFORMS=axon (the
# remote TPU tunnel), which would route every test compile through it at
# 30-60 s apiece. Tests must be hermetic on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test numerics deterministic and float32 (matmuls on CPU default to
# highest precision anyway; on TPU the library requests precision explicitly).
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The env var alone is NOT honored in this image (the axon TPU plugin wins
# over JAX_PLATFORMS); the config call is. Both are set for belt and braces.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def product_norm_oracle(ws):
    """np.linalg spectral norm of W_m^T @ ... @ W_1^T — the reference's
    product-Lipschitz formula (`VD/extract_features_construct_dataset.py:
    188-194`), kept independent of ops/spectral so it can serve as its
    oracle. Shared by the constraint/trainer/parallel suites."""
    prod = None
    for w in reversed([np.asarray(w) for w in ws]):
        prod = w.T if prod is None else prod @ w.T
    return np.linalg.norm(prod, ord=2)


def blobs_task(rng, n=512, d=16, k=4, noise=1.0, spread=3.0):
    """Separable-blobs classification task shared across suites."""
    means = rng.standard_normal((k, d)) * spread
    y = rng.integers(0, k, n).astype(np.int32)
    x = (means[y] + rng.standard_normal((n, d)) * noise).astype(np.float32)
    return x, y
