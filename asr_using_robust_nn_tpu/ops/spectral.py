"""On-device spectral-norm machinery for the constraint engine.

The reference pulls every Dense kernel to the host each batch and runs
`np.linalg.norm(w, ord=2)` / full SVDs (`Voice digit recogniton/
Constraints.py:24,83,88` — its acknowledged performance pathology, SURVEY.md
§3.3). Here the same quantities are computed *inside* the jitted train step
with power iteration, so the projection never leaves the device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["spectral_norm", "spectral_norm_with_state", "product_spectral_norm"]

_EPS = 1e-12


def _l2_normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v) + _EPS)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def spectral_norm(w: jnp.ndarray, n_iter: int = 32, u0: jnp.ndarray | None = None) -> jnp.ndarray:
    """Largest singular value of a 2-D matrix via power iteration.

    Replaces host-side `np.linalg.norm(w, ord=2)` (Constraints.py:24).
    Cold-start accurate to <1e-3 relative for the reference's well-conditioned
    dense kernels at n_iter=32; with a persistent `u0` a handful of iterations
    suffices (see `spectral_norm_with_state`).
    """
    sigma, _ = spectral_norm_with_state(w, u0, n_iter)
    return sigma


def spectral_norm_with_state(
    w: jnp.ndarray, u: jnp.ndarray | None = None, n_iter: int = 8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, u_next): power iteration with a persistent left vector.

    Carrying `u` across train steps (the weights move slowly) makes per-step
    convergence effectively instant — the GAN spectral-norm trick, applied
    here to the Lipschitz projection.
    """
    if u is None:
        key = jax.random.PRNGKey(w.shape[0] * 7919 + w.shape[1])
        u = jax.random.normal(key, (w.shape[0],), dtype=w.dtype)
    u = _l2_normalize(u)

    def body(_, u):
        v = _l2_normalize(w.T @ u)
        return _l2_normalize(w @ v)

    u = jax.lax.fori_loop(0, n_iter, body, u)
    v = _l2_normalize(w.T @ u)
    sigma = u @ (w @ v)
    return sigma, u


def product_spectral_norm_with_state(
    ws: list[jnp.ndarray],
    u: jnp.ndarray | None = None,
    n_iter: int = 64,
    eps: float = _EPS,
    matvec_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, u_next) for ||W_m^T @ ... @ W_1^T||_2 without materializing
    the product for the power steps (matvecs run right-to-left), with a
    persistent left vector like `spectral_norm_with_state`.

    Oracle semantics: `np.linalg.norm(W_m.T @ ... @ W_1.T, ord=2)` as in
    `Voice digit recogniton/Constraints.py:162-167` and
    `extract_features_construct_dataset.py:188-194`. `eps` is exposed
    because the constraint engine uses the reference's np.spacing(1)
    (docs/PARITY.md row 10).

    `matvec_dtype` (e.g. jnp.bfloat16): run the matvecs against a
    once-downcast copy of each kernel, accumulating in f32. The downcasts
    are loop-invariant, so XLA hoists them out of the power loop — HBM
    traffic for the in-step projection drops from 2*n_iter full-precision
    kernel reads to ONE f32 read + 2*n_iter half-width reads (VERDICT r3
    item 2: the power iteration re-reads every kernel in-step). The sigma
    estimate moves by O(1e-3) relative on these kernels — parity-gated by
    tests/test_constraints.py; the vector algebra (normalize, carry) stays
    f32 so the iteration itself cannot drift.
    """
    d_out = ws[-1].shape[1]  # product maps R^{d_out_last} <- ... actually rows
    if u is None:
        key = jax.random.PRNGKey(d_out * 31 + len(ws))
        u = jax.random.normal(key, (d_out,), dtype=ws[0].dtype)

    def nrm(v):
        return v / (jnp.linalg.norm(v) + eps)

    if matvec_dtype is not None:
        mws = [w.astype(matvec_dtype) for w in ws]

        def mv(w, x):
            return jax.lax.dot(
                w, x.astype(matvec_dtype),
                preferred_element_type=jnp.float32,
            )
    else:
        mws = ws

        def mv(w, x):
            return w @ x

    def apply(u):
        # P = W_m^T ... W_1^T, P: (d_out_m, d_in_1). P^T u then P v.
        x = u
        for w in reversed(mws):  # P^T = W_1 ... W_m
            x = mv(w, x)
        return x

    def apply_t(v):
        x = v
        for w in mws:
            x = mv(w.T, x)
        return x

    def body(_, u):
        v = nrm(apply(u))
        return nrm(apply_t(v))

    u = jax.lax.fori_loop(0, n_iter, body, nrm(u))
    v = nrm(apply(u))
    return u @ apply_t(v), u


def product_spectral_norm(
    ws: list[jnp.ndarray], n_iter: int = 64
) -> jnp.ndarray:
    """Scalar-only convenience wrapper over the stateful variant."""
    sigma, _ = product_spectral_norm_with_state(ws, n_iter=n_iter)
    return sigma
