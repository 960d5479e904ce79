"""The four Lipschitz constraint algorithms, as on-device projections.

The reference implements these as Keras callbacks that pull every Dense
kernel to the host each batch, run numpy SVDs, and push the scaled weights
back (`Voice digit recogniton/Constraints.py` — its own comment at :52 notes
"performance is pretty poor, no GPU usage"). Here each algorithm is a pure
function `(params, cstate) -> (params, cstate)` that the trainer fuses into
the jitted train step, with spectral norms computed by persistent-vector
power iteration (ops/spectral.py) instead of host SVD:

  1. make_norm_constraint        — per-layer: clamp w>=0, rescale each kernel
                                   to spectral norm rho^(1/m)
                                   (`Constraints.py:9-33`)
  2. make_custom_constraint      — the in-graph Keras Constraint: clamp w>=0,
                                   scale by rho/||w|| where ||.|| is the
                                   *Frobenius* norm — the reference's
                                   tf.norm(w, ord=2) on a 2-D tensor is
                                   Frobenius, an inconsistency vs the
                                   callbacks' true spectral norm, replicated
                                   here for parity (`Constraints.py:38-49`,
                                   SURVEY.md §2.3)
  3. make_fista_constraint       — FISTA proximal projection of each kernel
                                   so the whole-network product A.W.B has
                                   singular values <= rho
                                   (`Constraints.py:54-130`)
  4. make_simple_norm_constraint — scale every kernel by
                                   (rho/||W_m^T...W_1^T||_2)^(1/m)
                                   (`Constraints.py:135-189`)

All use eps = np.spacing(1) in norm divisions, as the reference does
(`Constraints.py:25,46,167`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import dense_kernels, set_dense_kernels
from ..ops.spectral import spectral_norm_with_state

_EPS = float(np.spacing(1.0))

__all__ = [
    "Constraint",
    "make_norm_constraint",
    "make_custom_constraint",
    "make_simple_norm_constraint",
    "make_fista_constraint",
]


@dataclasses.dataclass(frozen=True)
class Constraint:
    """A projection to run inside the train step after the Adam update —
    the same point in the schedule as the reference's on_batch_end
    callbacks (SURVEY.md §3.3)."""

    init: Callable  # params -> cstate
    apply: Callable  # (params, cstate) -> (params, cstate)


def _init_u_per_layer(params) -> dict:
    ws = dense_kernels(params)
    return {
        "u": [
            jax.random.normal(jax.random.PRNGKey(17 + i), (w.shape[0],), w.dtype)
            for i, w in enumerate(ws)
        ]
    }


def make_norm_constraint(rho: float, n_iter: int = 8) -> Constraint:
    """Algorithm 1 (`norm_constraint`, Constraints.py:9-33): after each batch
    w <- relu(w) * rho^(1/m) / (sigma(w) + eps) for every Dense kernel."""

    def apply(params, cstate):
        ws = dense_kernels(params)
        m = len(ws)
        new_ws, new_us = [], []
        for w, u in zip(ws, cstate["u"]):
            w = w * (w >= 0.0)
            sigma, u = spectral_norm_with_state(w, u, n_iter)
            new_ws.append(w * (rho ** (1.0 / m)) / (sigma + _EPS))
            new_us.append(u)
        return set_dense_kernels(params, new_ws), {"u": new_us}

    return Constraint(init=_init_u_per_layer, apply=apply)


def make_custom_constraint(rho: float) -> Constraint:
    """Algorithm (a) in-graph (`customConstraint`, Constraints.py:38-49):
    w <- relu(w) * rho / (||w||_F + eps). Frobenius by reference parity."""

    def apply(params, cstate):
        ws = []
        for w in dense_kernels(params):
            w = w * (w >= 0.0)
            ws.append(w * rho / (jnp.linalg.norm(w) + _EPS))
        return set_dense_kernels(params, ws), cstate

    return Constraint(init=lambda params: (), apply=apply)


def make_simple_norm_constraint(
    rho: float, affected_layers_indices: tuple[int, ...] = (),
    n_iter: int = 16, matvec_dtype=None, pi_backend: str = "auto",
) -> Constraint:
    """Algorithm 2 (`simple_norm_constraint`, Constraints.py:135-189):
    per layer, sigma = ||W_m^T ... W_1^T||_2 recomputed from the LIVE
    weights (earlier layers already rescaled this step — the reference's
    get_projection re-reads the mutated model each time, :143-149,158-169),
    then w_i <- w_i * (rho / (sigma + eps))^(1/m). Exponent is 1/m with
    m = total dense count even when only a subset is affected (`:167`).
    One application does NOT force sigma to rho; it converges there over
    batches, exactly like the reference's training dynamics.

    The product norm runs as power iteration with matvecs through the layer
    chain — never materializing the product — with a persistent vector.

    `matvec_dtype=jnp.bfloat16` runs those matvecs against once-downcast
    kernel copies (f32 accumulation): the projection's per-step HBM traffic
    drops ~2x at an O(1e-3)-relative sigma perturbation — the training
    dynamics converge sigma -> rho over batches either way (VERDICT r3
    item 2; parity-gated in tests/test_constraints.py).

    `pi_backend`: "pallas" runs the whole power iteration as ONE TPU
    kernel with every weight matrix VMEM-resident for the full dependent
    chain (ops/pallas_spectral.py); "xla" keeps the op-chain form; "auto"
    (default) currently resolves to "xla" everywhere — MEASURED NEGATIVE
    on v5e (paired A/B 2026-08-19/20, digit recipe, quiet window): the
    per-STEP pallas_call launch adds ~50 us/step over the ~100 us op
    chain it replaces — lean epoch 6.25 vs 4.68 ms/epoch, same window;
    landing sigma identical (0.1002 vs 0.1003 at rho=0.1). A
    VMEM-resident PI only pays off amortized inside an epoch-scope kernel
    (ops/pallas_train.py::_make_epoch_kernel: ~1.0 vs ~3.3 ms/epoch for
    the same chain). The pallas path honors `matvec_dtype` (bf16 matvecs
    iff it is bfloat16, f32 iff None); agreement with the XLA path is
    bf16-accumulation-order class, parity-gated in
    tests/test_constraints.py::TestPallasPI.
    """
    if pi_backend not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown pi_backend {pi_backend!r}")

    def _use_pallas():
        return pi_backend == "pallas"

    def init(params):
        w_last = dense_kernels(params)[-1]
        return {
            "u": jax.random.normal(
                jax.random.PRNGKey(23), (w_last.shape[1],), w_last.dtype
            )
        }

    def apply(params, cstate):
        from ..ops.spectral import product_spectral_norm_with_state

        ws = list(dense_kernels(params))
        m = len(ws)
        affected = (
            list(range(m))
            if not affected_layers_indices
            else sorted(affected_layers_indices, reverse=True)
        )
        # SEQUENTIAL semantics, exactly like the reference: each layer's
        # get_projection re-reads the LIVE model (`get_w_list`,
        # Constraints.py:143-149), i.e. sigma is recomputed from the
        # already-rescaled earlier layers before scaling the next one. One
        # application therefore does NOT force sigma(product) to rho; it
        # converges there over repeated batches. (The all-layers loop runs
        # in model order, :174-179; the affected-subset loop runs
        # reversed(range(...)), :181-189.)
        #
        # Because the product P = W_m^T...W_1^T is LINEAR in each kernel,
        # scaling layer i by f scales sigma(P) by exactly f — so the
        # reference's per-layer recompute collapses to ONE power iteration
        # followed by the exact scalar recurrence
        #   f_k = (rho / sigma_k)^(1/m),  sigma_{k+1} = sigma_k * f_k.
        if _use_pallas():
            from ..ops.pallas_spectral import product_spectral_norm_pallas

            sigma, u = product_spectral_norm_pallas(
                ws, cstate["u"], n_iter=n_iter, eps=_EPS,
                matvec_bf16=matvec_dtype is not None,
            )
        else:
            sigma, u = product_spectral_norm_with_state(
                ws, cstate["u"], n_iter=n_iter, eps=_EPS,
                matvec_dtype=matvec_dtype,
            )
        for i in affected:
            factor = (rho / (sigma + _EPS)) ** (1.0 / m)
            ws[i] = ws[i] * factor
            sigma = sigma * factor
        return set_dense_kernels(params, ws), {"u": u}

    # machine-readable identity: Trainer.fit's "auto" epoch backend uses
    # this to recognize the projection as the one the fused Pallas epoch
    # kernel implements in-kernel (ops/pallas_train.py — Adam -> NonNeg ->
    # this exact scalar recurrence), so the promotion never silently
    # changes which constraint runs. Attached only for a CONCRETE rho:
    # multi_run's rho-sweep re-invokes this factory on a TRACED per-run
    # rho, where float(rho) would raise and the Trainer promotion does
    # not apply anyway.
    if isinstance(rho, (int, float, np.integer, np.floating)):
        apply._asrtpu_kind = "simple_norm"
        apply._asrtpu_meta = {
            "rho": float(rho),
            "affected_all": not affected_layers_indices,
            "n_iter": int(n_iter),
        }
    return Constraint(init=init, apply=apply)


def make_fista_constraint(rho: float, nit: int = 2, alpha: float = 2.1) -> Constraint:
    """Algorithm 3 (`norm_constraint_FISTA`, Constraints.py:54-130): for each
    layer i, project W_i so the end-to-end product A @ W_i^T @ B has singular
    values <= rho, where A = W_m^T...W_{i+1}^T and B = W_{i-1}^T...W_1^T.

    FISTA dual iteration with the reference's exact recurrences (:69-94):
    momentum eta = i/(i+1+alpha), step gam = 1/(sigma(A)sigma(B)+eps)^2,
    singular-value clipping to [0, rho], early exit when
    ||w_new - w||_F < 30 and the singular excess < 0.01. SVDs run on device
    (the product matrices are small: (n_classes, d)); the early exit lives
    in a lax.while_loop so the step count stays data-dependent like the
    reference's Python `return` (:91-93).
    """

    def apply(params, cstate):
        # SEQUENTIAL like the reference: get_projection re-reads the live
        # model per layer (Constraints.py:99,124-130), so B for layer i is
        # built from the ALREADY-projected layers 0..i-1 while A still sees
        # the not-yet-projected later layers (model-order loop).
        ws = list(dense_kernels(params))
        m = len(ws)
        # A_i = W_m^T...W_{i+1}^T reads layers NOT yet projected in this
        # apply (their entry values — layer j is only overwritten at loop
        # step j > i), so the whole left-associated suffix chain can be
        # precomputed once: bit-identical results, O(m) matmuls instead of
        # O(m^2) inside the fused train step. B_i reads ALREADY-projected
        # layers and the reference accumulates it highest-index-first, so
        # an incremental prepend would change float association — B stays
        # rebuilt per layer to keep the literal-oracle match exact.
        suffix: list = [None] * m
        acc = None
        for j in range(m - 1, -1, -1):
            suffix[j] = acc
            acc = ws[j].T if acc is None else acc @ ws[j].T
        for i in range(m):
            # A = W_m^T...W_{i+1}^T: (n_out_m, out_i); B = W_{i-1}^T...W_1^T:
            # (in_i, in_1); identity at the chain ends (Constraints.py:96-120).
            a = suffix[i]
            if a is None:
                a = jnp.eye(ws[i].shape[1], dtype=ws[i].dtype)
            b = None
            for j in range(i - 1, -1, -1):
                t = ws[j].T
                b = t if b is None else b @ t
            if b is None:
                b = jnp.eye(ws[i].shape[0], dtype=ws[i].dtype)
            w_t = ws[i].T  # reference passes w.T (Constraints.py:121)
            w_new_t = _fista_project(w_t, a, b, rho, nit, alpha)
            ws[i] = w_new_t.T
        return set_dense_kernels(params, ws), cstate

    return Constraint(init=lambda params: (), apply=apply)


def _fista_project(w, a, b, rho, nit, alpha):
    """The Constraint_Fista inner loop (Constraints.py:69-94), jax-native."""
    sig_a = jnp.linalg.norm(a, ord=2)
    sig_b = jnp.linalg.norm(b, ord=2)
    gam = 1.0 / ((sig_a * sig_b + _EPS) ** 2)
    y0 = jnp.zeros((a.shape[0], b.shape[1]), dtype=w.dtype)

    def iteration(carry):
        i, y, yold, w_new, done = carry
        eta = i / (i + 1.0 + alpha)
        z = y + eta * (y - yold)
        yold_next = y
        w_cand = w - a.T @ z @ b.T
        w_cand = w_cand * (w_cand >= 0.0)
        t = a @ w_cand @ b
        s = jnp.linalg.svd(t, compute_uv=False)
        criterion = jnp.linalg.norm(w_cand - w)
        excess = jnp.where(s > rho, s - rho, 0.0)
        constraint = jnp.linalg.norm(excess)
        yt = z + gam * t
        u1, s1, v1 = jnp.linalg.svd(yt / gam, full_matrices=False)
        s1 = jnp.clip(s1, 0.0, rho)
        y_next = yt - gam * ((u1 * s1) @ v1)
        new_done = jnp.logical_and(criterion < 30.0, constraint < 0.01)
        return (i + 1.0, y_next, yold_next, w_cand, jnp.logical_or(done, new_done))

    def cond(carry):
        i, _, _, _, done = carry
        return jnp.logical_and(i < nit, jnp.logical_not(done))

    init = (jnp.asarray(0.0, w.dtype), y0, y0, w, jnp.asarray(False))
    _, _, _, w_new, _ = jax.lax.while_loop(cond, iteration, init)
    return w_new
