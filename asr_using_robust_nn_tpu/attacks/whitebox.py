"""White-box attacks in pure JAX: FGSM, PGD, JSMA, Carlini L2 / L-inf.

The reference drives these through ART's TensorFlowV2Classifier wrappers
(`Voice digit recogniton/attacks.py:493-693`); here each attack is a jitted,
vmapped gradient program on the model's logits function — no host round
trips inside the attack loops (SURVEY.md §3.5: "FGSM/PGD become vmap/jit
gradient loops").

API: every attack takes `logits_fn(x) -> logits` (a batched closure over
trained params, e.g. `lambda x: apply_mlp(cfg, params, state, x)[0]`),
the clean inputs, and labels. Attacks return adversarial examples with the
same shape/dtype.

Parity notes:
 - fgsm/pgd match ART semantics exactly (sign of the CE gradient; PGD
   defaults eps_step=0.1, max_iter=100, no random init, L-inf projection —
   ART's ProjectedGradientDescent defaults used at `attacks.py:657`).
 - jsma implements the canonical Papernot feature-pair saliency attack
   (theta, gamma as at `attacks.py:546`); ART picks random targets when no
   labels are given — pass `targets` or a `key` for the same behavior.
 - carlini_l2 implements the Carlini&Wagner L2 formulation (tanh
   reparameterization + binary search over c) with ART's default budgets
   (binary_search_steps=10, max_iter=10, lr=0.01, initial_const=0.01);
   ART's bespoke lr-halving schedule is replaced by Adam (documented
   divergence — the attack is optimization-based, not bit-reproducible).
 - carlini_linf follows the C&W L-inf variant with a shrinking tau bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

__all__ = ["fgsm", "pgd", "jsma", "carlini_l2", "carlini_linf"]


def _ce(logits, y):
    return -jnp.take_along_axis(
        jax.nn.log_softmax(logits, -1), y[:, None], axis=-1
    ).sum()


@functools.partial(jax.jit, static_argnames=("logits_fn",))
def fgsm(logits_fn, x, y, eps: float) -> jnp.ndarray:
    """x + eps * sign(grad_x CE) — FastGradientMethod, untargeted, no clip
    (`attacks.py:506-510`). eps is traced: one compile per sweep."""
    g = jax.grad(lambda xx: _ce(logits_fn(xx), y))(x)
    return x + eps * jnp.sign(g)


@functools.partial(jax.jit, static_argnames=("logits_fn", "max_iter"))
def pgd(
    logits_fn,
    x,
    y,
    eps: float,
    eps_step: float = 0.1,
    max_iter: int = 100,
) -> jnp.ndarray:
    """Projected gradient descent, L-inf ball of radius eps around x
    (ART ProjectedGradientDescent defaults, `attacks.py:647-661`).

    eps/eps_step are traced (not static): a 50-point eps sweep reuses ONE
    compiled 100-iteration program instead of compiling 50.

    Parity note: with the ART defaults the iterate can move at most
    eps_step * max_iter = 10 in L-inf, so the reference's eps grid
    (linspace(1, 30, 50), `attacks.py:648`) saturates above eps ~10 — the
    curve's right side is flat BY CONSTRUCTION in the reference too, since
    it passes only `eps` and inherits the same defaults. Replicated as-is;
    pass a larger eps_step for a sweep that actually reaches eps > 10."""

    def body(_, xa):
        g = jax.grad(lambda xx: _ce(logits_fn(xx), y))(xa)
        xa = xa + eps_step * jnp.sign(g)
        return x + jnp.clip(xa - x, -eps, eps)

    return jax.lax.fori_loop(0, max_iter, body, x)


def jsma(
    logits_fn,
    x,
    targets=None,
    theta: float = 10.0,
    gamma: float = 0.1,
    key=None,
    clip=None,
    max_iter: int | None = None,
) -> jnp.ndarray:
    """Jacobian Saliency Map Attack with feature pairs (SaliencyMapMethod,
    theta=10, gamma=0.1 at `attacks.py:546`). Targeted; `targets=None` draws
    random target classes (ART's behavior when y is omitted).

    Search-space semantics follow ART's SaliencyMapMethod: a feature is only
    removed from the candidate set when clipping pins it at the bound (for
    theta>0, at clip[1]); with `clip=None` — the reference wraps its models
    without clip_values (`attacks.py:540-547`) — features may be re-selected
    and bumped repeatedly. The gamma budget counts DISTINCT modified
    features: the loop continues while that fraction is <= gamma, so at most
    one pair can land past the budget, exactly like ART's while condition.
    `max_iter` caps the saliency loop (default 4x the pair budget) so a
    cycling pair can't spin forever; ART has no such cap but terminates in
    practice for the same reason this cap is rarely hit.
    """
    n_feat = x.shape[-1]
    logits0 = logits_fn(x)
    n_classes = logits0.shape[-1]
    if targets is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        preds = jnp.argmax(logits0, -1)
        shift = jax.random.randint(key, preds.shape, 1, n_classes)
        targets = (preds + shift) % n_classes
    budget = max(2, int(gamma * n_feat))
    if max_iter is None:
        max_iter = max(2 * budget, 8)

    def single(x0, t):
        def logits_single(xx):
            return logits_fn(xx[None, :])[0]

        def cond(carry):
            xa, used, search, i, done = carry
            return jnp.logical_and(i < max_iter, jnp.logical_not(done))

        def body(carry):
            xa, used, search, i, _ = carry
            jac = jax.jacrev(logits_single)(xa)  # (n_classes, n_feat)
            alpha = jac[t]
            beta = jac.sum(axis=0) - alpha
            # pair saliency: S(p,q) = -(a_p+a_q)*(b_p+b_q) where a_sum>0, b_sum<0
            a_pair = alpha[:, None] + alpha[None, :]
            b_pair = beta[:, None] + beta[None, :]
            valid = (
                (a_pair > 0)
                & (b_pair < 0)
                & search[:, None]
                & search[None, :]
                & (~jnp.eye(n_feat, dtype=bool))
            )
            score = jnp.where(valid, -a_pair * b_pair, -jnp.inf)
            flat = jnp.argmax(score)
            p, q = flat // n_feat, flat % n_feat
            any_valid = jnp.isfinite(score.reshape(-1)[flat])
            delta = jnp.zeros_like(xa).at[p].add(theta).at[q].add(theta)
            xa_new = jnp.where(any_valid, xa + delta, xa)
            if clip is not None:
                xa_new = jnp.clip(xa_new, clip[0], clip[1])
                # drop features pinned at the bound from the search space
                # (ART removes indices where the clip value was reached)
                bound = clip[1] if theta > 0 else clip[0]
                search = search & jnp.where(
                    any_valid, xa_new != bound, search
                )
            used = jnp.where(
                any_valid, used.at[p].set(True).at[q].set(True), used
            )
            hit = jnp.argmax(logits_single(xa_new)) == t
            over_budget = jnp.sum(used) > budget
            done = hit | jnp.logical_not(any_valid) | over_budget
            return (xa_new, used, search, i + 1, done)

        # ART excludes features already AT the bound from the search domain
        # up front (SaliencyMapMethod: x >= clip_max for theta > 0), so a
        # clipped-to-no-op pair can never be selected or consume the gamma
        # budget
        search0 = jnp.ones((n_feat,), bool)
        if clip is not None:
            bound = clip[1] if theta > 0 else clip[0]
            search0 = x0 != bound
        init = (x0, jnp.zeros((n_feat,), bool), search0, 0,
                jnp.asarray(False))
        xa, _, _, _, _ = jax.lax.while_loop(cond, body, init)
        return xa

    return jax.vmap(single)(x, targets)


def _cw_objective(logits, t, confidence, targeted):
    """f(x) from Carlini&Wagner: max(Z_true - max_other + conf, 0) for
    untargeted (push away from the true class)."""
    onehot = jax.nn.one_hot(t, logits.shape[-1])
    z_t = jnp.sum(logits * onehot, -1)
    z_other = jnp.max(logits - onehot * 1e9, -1)
    if targeted:
        return jnp.maximum(z_other - z_t + confidence, 0.0)
    return jnp.maximum(z_t - z_other + confidence, 0.0)


def carlini_l2(
    logits_fn,
    x,
    y,
    confidence: float = 0.0,
    learning_rate: float = 0.01,
    binary_search_steps: int = 10,
    max_iter: int = 10,
    initial_const: float = 0.01,
    clip=None,
) -> jnp.ndarray:
    """Carlini&Wagner L2 (CarliniL2Method, `attacks.py:606-622`): minimize
    ||delta||^2 + c*f(x+delta) in tanh space, binary search over c. `clip`
    defaults to the per-batch (min, max) like ART does without clip_values.
    """
    if clip is None:
        clip = (float(jnp.min(x)), float(jnp.max(x)))
    lo, hi = clip
    span, mid = (hi - lo) / 2.0, (hi + lo) / 2.0
    x_c = jnp.clip(x, lo + 1e-6, hi - 1e-6)
    w0 = jnp.arctanh((x_c - mid) / (span + 1e-9) * 0.999999)

    def attack_at_c(c):
        # c: (B,) per-sample constant
        opt = optax.adam(learning_rate)

        def to_x(w):
            return jnp.tanh(w) * span + mid

        def obj(w):
            xa = to_x(w)
            l2 = jnp.sum((xa - x) ** 2, axis=-1)
            f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
            return jnp.sum(l2 + c * f)

        def body(carry, _):
            w, opt_state, best_x, best_l2 = carry
            g = jax.grad(obj)(w)
            updates, opt_state = opt.update(g, opt_state)
            w = optax.apply_updates(w, updates)
            xa = to_x(w)
            f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
            l2 = jnp.sum((xa - x) ** 2, axis=-1)
            better = (f <= 0.0) & (l2 < best_l2)
            best_x = jnp.where(better[:, None], xa, best_x)
            best_l2 = jnp.where(better, l2, best_l2)
            return (w, opt_state, best_x, best_l2), None

        init = (w0, opt.init(w0), x, jnp.full((x.shape[0],), jnp.inf))
        (w, _, best_x, best_l2), _ = jax.lax.scan(
            body, init, None, length=max_iter
        )
        success = jnp.isfinite(best_l2)
        # failed samples keep the final iterate (ART returns best found)
        final_x = jnp.where(success[:, None], best_x, to_x(w))
        return final_x, success

    c_lo = jnp.zeros((x.shape[0],))
    c_hi = jnp.full((x.shape[0],), 1e10)
    c = jnp.full((x.shape[0],), initial_const)
    best_overall = x
    found = jnp.zeros((x.shape[0],), bool)
    for _ in range(binary_search_steps):
        xa, success = attack_at_c(c)
        best_overall = jnp.where(
            (success & ~found)[:, None]
            | (
                success
                & (jnp.sum((xa - x) ** 2, -1) < jnp.sum((best_overall - x) ** 2, -1))
            )[:, None],
            xa,
            best_overall,
        )
        found = found | success
        c_hi = jnp.where(success, c, c_hi)
        c_lo = jnp.where(success, c_lo, c)
        c = jnp.where(
            c_hi < 1e9, (c_lo + c_hi) / 2.0, c * 10.0
        )
    return best_overall


def carlini_linf(
    logits_fn,
    x,
    y,
    confidence: float = 0.0,
    learning_rate: float = 0.01,
    max_iter: int = 100,
    initial_tau: float | None = None,
    tau_decrease: float = 0.9,
    tau_steps: int = 6,
    const: float = 1.0,
) -> jnp.ndarray:
    """Carlini&Wagner L-inf variant (CarliniLInfMethod, `attacks.py:571-587`):
    minimize c*f(x+delta) + sum(max(|delta| - tau, 0)) with tau shrinking
    geometrically — the penalty formulation from the C&W paper section VI."""
    span = float(jnp.max(x) - jnp.min(x) + 1e-9)
    tau = initial_tau if initial_tau is not None else span / 10.0
    best = x
    best_linf = jnp.full((x.shape[0],), jnp.inf)
    found = jnp.zeros((x.shape[0],), bool)
    delta = jnp.zeros_like(x)
    for _ in range(tau_steps):
        opt = optax.adam(learning_rate)

        def obj(d, tau=tau):
            xa = x + d
            f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
            excess = jnp.maximum(jnp.abs(d) - tau, 0.0).sum(-1)
            return jnp.sum(const * f + excess)

        opt_state = opt.init(delta)

        def body(carry, _):
            d, opt_state = carry
            g = jax.grad(obj)(d)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(d, updates), opt_state), None

        (delta, _), _ = jax.lax.scan(body, (delta, opt_state), None, length=max_iter)
        xa = x + delta
        f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
        linf = jnp.max(jnp.abs(delta), -1)
        success = (f <= 0.0) & (linf <= tau * 1.01)
        # keep the SMALLEST successful perturbation as tau shrinks (the
        # whole point of the schedule), not just the first success
        better = success & (linf < best_linf)
        best = jnp.where(better[:, None], xa, best)
        best_linf = jnp.where(better, linf, best_linf)
        found = found | success
        tau *= tau_decrease
    # unfound samples return the final iterate
    best = jnp.where(found[:, None], best, x + delta)
    return best
