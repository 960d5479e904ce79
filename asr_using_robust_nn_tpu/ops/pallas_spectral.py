"""Pallas TPU kernel for the constraint engine's product power iteration.

The in-step projection (`constraints/engine.py::make_simple_norm_constraint`)
spends its time in sigma = ||W_m^T ... W_1^T||_2: 2*n_iter dependent
matvec CHAINS through all m kernels. As XLA ops each chain link is its own
tiny HLO (a (1,d)x(d,k) dot plus a normalize), and the 66-op dependent
sequence measured ~3.3 ms/epoch at the digit recipe — ~45% of the whole
lean fused epoch (paired A/B, v5e, 2026-08-19; see
docs/ARCHITECTURE.md roofline). The same iteration INSIDE one Pallas
kernel — every kernel VMEM-resident for the whole chain, one bf16
downcast, no per-link dispatch — measured ~1.0 ms/epoch as part of the
epoch-grid kernel ablation (ops/pallas_train.py::_make_epoch_kernel).
This module extracts exactly that: ONE pallas_call that reads the m
weight matrices once, runs the full power iteration in VMEM, and emits
(sigma, u_next).

Semantics: `ops/spectral.py::product_spectral_norm_with_state` with
`matvec_dtype=jnp.bfloat16` (the lean-variant configuration) — same
normalize epsilon, same iteration order, same persistent-u carry, bf16
matvecs with f32 accumulation and f32 vector algebra. Oracle for both:
`np.linalg.norm(W_m.T @ ... @ W_1.T, ord=2)` as the reference computes on
host per batch (`Voice digit recogniton/Constraints.py:162-167`).

Weight blocks are FULL-ARRAY (exempt from Mosaic's (8,128) tiling rule),
so the true unpadded shapes (880x1024 ... 64x10) pass through unchanged.
VMEM: f32 reads + bf16 copies of the digit stack ~ 10 MB — comfortable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["product_spectral_norm_pallas"]

_EPS = float(np.spacing(1.0))


def _pi_kernel(*refs, m: int, n_iter: int, eps: float, matvec_bf16: bool):
    u_ref = refs[0]
    w_refs = refs[1 : 1 + m]
    sigma_ref, u_out = refs[1 + m], refs[2 + m]

    cast = (lambda x: x.astype(jnp.bfloat16)) if matvec_bf16 else (lambda x: x)
    # one downcast per kernel invocation; the copies stay VMEM-resident
    # across the whole dependent chain (the entire point of the kernel)
    ws = [cast(w_refs[j][:]) for j in range(m)]

    def nrm(x):
        return x / (jnp.sqrt(jnp.sum(x * x)) + eps)

    def apply_pt(x):
        # P^T u = W_1 ... W_m u; row-vector form: x @ W_j^T, j = m..1
        for j in range(m - 1, -1, -1):
            x = jax.lax.dot_general(
                cast(x), ws[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return x

    def apply_p(x):
        # P v = W_m^T ... W_1^T v; row-vector form: x @ W_j, j = 1..m
        for j in range(m):
            x = jax.lax.dot(cast(x), ws[j],
                            preferred_element_type=jnp.float32)
        return x

    def body(_, u):
        v = nrm(apply_pt(u))
        return nrm(apply_p(v))

    u = jax.lax.fori_loop(0, n_iter, body, nrm(u_ref[:]))
    v = nrm(apply_pt(u))
    # (1, 1)-shaped store: Mosaic rejects scalar stores to VMEM
    sigma_ref[:] = jnp.sum(u * apply_p(v)).reshape(1, 1)
    u_out[:] = u


@functools.partial(
    jax.jit,
    static_argnames=("n_iter", "eps", "matvec_bf16", "interpret"),
)
def product_spectral_norm_pallas(
    ws, u, n_iter: int = 16, eps: float = _EPS,
    matvec_bf16: bool = True, interpret: bool = False,
):
    """(sigma, u_next) = power iteration for ||W_m^T...W_1^T||_2, one
    pallas_call, weights VMEM-resident for the whole chain.

    `ws`: list of f32 (d_in, d_out) kernels in model order; `u`: persistent
    left vector of shape (ws[-1].shape[1],). Drop-in for
    `product_spectral_norm_with_state(ws, u, n_iter, eps,
    matvec_dtype=bfloat16)` up to bf16 accumulation order (parity-gated in
    tests/test_constraints.py::TestPallasPI)."""
    m = len(ws)
    d_last = ws[-1].shape[1]
    kernel = functools.partial(
        _pi_kernel, m=m, n_iter=n_iter, eps=float(eps),
        matvec_bf16=matvec_bf16)
    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    u2 = u.astype(jnp.float32).reshape(1, d_last)
    ws32 = [w.astype(jnp.float32) for w in ws]
    sigma, u_next = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, d_last), jnp.float32),
        ),
        in_specs=[full(u2)] + [full(w) for w in ws32],
        out_specs=(
            pl.BlockSpec((1, 1), lambda: (0, 0)),
            pl.BlockSpec((1, d_last), lambda: (0, 0)),
        ),
        interpret=interpret,
    )(u2, *ws32)
    return sigma[0, 0], u_next[0]
