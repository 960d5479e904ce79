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
   (binary_search_steps=10, max_iter=10, lr=0.01, initial_const=0.01).
   optimizer="art" (the DEFAULT) follows ART's bespoke per-sample
   lr-halving/doubling line search, evaluated as a batched candidate
   ladder (docs/PARITY.md); optimizer="adam" keeps the round-2 Adam
   variant as the documented-divergence alternative.
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


def _jsma_select_pair(alpha, beta, search, k_cand):
    """-> (p, q, any_valid): argmax of the Papernot pair saliency
    S(p,q) = -(a_p+a_q)*(b_p+b_q) over valid pairs (a_sum>0, b_sum<0,
    p != q, both in `search`) — EXACT over all pairs when k_cand is None,
    else a heuristic over the union of top-k-by-alpha and
    top-k-by-(-beta) candidates (covers the ends of the (alpha, -beta)
    Pareto front, may miss pairs strictly in its interior)."""
    n_feat = alpha.shape[0]
    if k_cand is None:
        cand = jnp.arange(n_feat)
    else:
        a_m = jnp.where(search, alpha, -jnp.inf)
        c_m = jnp.where(search, -beta, -jnp.inf)
        _, ia = jax.lax.top_k(a_m, k_cand)
        _, ic = jax.lax.top_k(c_m, k_cand)
        cand = jnp.concatenate([ia, ic])  # (2k,) may repeat; masked below
    ac, bc, sc = alpha[cand], beta[cand], search[cand]
    a_pair = ac[:, None] + ac[None, :]
    b_pair = bc[:, None] + bc[None, :]
    valid = (
        (a_pair > 0)
        & (b_pair < 0)
        & sc[:, None]
        & sc[None, :]
        & (cand[:, None] != cand[None, :])
    )
    score = jnp.where(valid, -a_pair * b_pair, -jnp.inf)
    m = cand.shape[0]
    flat = jnp.argmax(score)
    any_valid = jnp.isfinite(score.reshape(-1)[flat])
    return cand[flat // m], cand[flat % m], any_valid


def _jsma_select_pair_tiled(alpha, beta, search, tile: int = 128):
    """EXACT pair argmax at any dim without the (n, n) matrix: a lax.scan
    over row tiles scores (tile x n) blocks and carries the running best —
    the full 2020-dim speaker saliency map streams through
    ceil(n/tile) blocks of tile*n entries instead of materializing 4.1M
    (VERDICT r3 item 6). Tie-breaking matches the dense search exactly
    (first maximum in row-major order: strict `>` across tiles keeps the
    earliest tile's max; argmax within a tile picks the earliest entry).
    Returns (p, q, any_valid) identical to `_jsma_select_pair(..., None)`.
    """
    n = alpha.shape[0]
    n_pad = -(-n // tile) * tile
    a = jnp.pad(alpha, (0, n_pad - n))
    b = jnp.pad(beta, (0, n_pad - n))
    s = jnp.pad(search, (0, n_pad - n))  # False-padded: never valid
    idx = jnp.arange(n_pad)

    def body(carry, start):
        best_score, best_p, best_q = carry
        ap = jax.lax.dynamic_slice(a, (start,), (tile,))
        bp = jax.lax.dynamic_slice(b, (start,), (tile,))
        sp = jax.lax.dynamic_slice(s, (start,), (tile,))
        pi = start + jnp.arange(tile)
        a_pair = ap[:, None] + a[None, :]
        b_pair = bp[:, None] + b[None, :]
        valid = (
            (a_pair > 0)
            & (b_pair < 0)
            & sp[:, None]
            & s[None, :]
            & (pi[:, None] != idx[None, :])
        )
        score = jnp.where(valid, -a_pair * b_pair, -jnp.inf)
        flat = jnp.argmax(score)
        sc = score.reshape(-1)[flat]
        p, q = pi[flat // n_pad], idx[flat % n_pad]
        better = sc > best_score
        return (jnp.where(better, sc, best_score),
                jnp.where(better, p, best_p),
                jnp.where(better, q, best_q)), None

    init = (jnp.float32(-jnp.inf), jnp.int32(0), jnp.int32(0))
    (best_score, best_p, best_q), _ = jax.lax.scan(
        body, init, jnp.arange(0, n_pad, tile)
    )
    return best_p, best_q, jnp.isfinite(best_score)


def jsma(
    logits_fn,
    x,
    targets=None,
    theta: float = 10.0,
    gamma: float = 0.1,
    key=None,
    clip=None,
    max_iter: int | None = None,
    k_candidates: int | None = None,
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

    Pair selection: `k_candidates=None` (default) is EXACT at EVERY dim
    (VERDICT r3 item 6) — a dense (n, n) argmax for n_feat <= 1024 (the
    880-dim digit task), and the blockwise streamed argmax
    `_jsma_select_pair_tiled` above that (the 2020-dim speaker task scores
    tile x n blocks under a lax.scan instead of materializing the 4.1M-entry
    matrix; identical result including row-major tie-breaking). Passing an
    explicit k_candidates < n_feat opts IN to the round-3 top-k heuristic
    (union of top-k by alpha and top-k by -beta — covers the ENDS of the
    (alpha, -beta) Pareto front but provably misses pairs strictly in its
    interior, see tests/test_attacks.py::TestJSMATopK); k_candidates >=
    n_feat routes back to the exact dense search.
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
    if k_candidates is None:
        k_cand = None  # exact at every dim: dense <=1024, tiled above
    else:
        k_cand = None if k_candidates >= n_feat else k_candidates

    def select_pair(alpha, beta, search):
        if k_cand is None and n_feat > 1024:
            return _jsma_select_pair_tiled(alpha, beta, search)
        return _jsma_select_pair(alpha, beta, search, k_cand)

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
            # pair saliency: S(p,q) = -(a_p+a_q)*(b_p+b_q), a_sum>0, b_sum<0
            p, q, any_valid = select_pair(alpha, beta, search)
            delta = jnp.zeros_like(xa).at[p].add(theta).at[q].add(theta)
            xa_new = jnp.where(any_valid, xa + delta, xa)
            if clip is not None:
                xa_new = jnp.clip(xa_new, clip[0], clip[1])
                # drop features pinned at the bound from the search space
                # (ART removes indices where x >= clip_max for theta > 0,
                # resp. x <= clip_min — inequality, not exact equality)
                at_bound = (
                    xa_new >= clip[1] if theta > 0 else xa_new <= clip[0]
                )
                search = search & jnp.where(any_valid, ~at_bound, search)
            used = jnp.where(
                any_valid, used.at[p].set(True).at[q].set(True), used
            )
            hit = jnp.argmax(logits_single(xa_new)) == t
            over_budget = jnp.sum(used) > budget
            done = hit | jnp.logical_not(any_valid) | over_budget
            return (xa_new, used, search, i + 1, done)

        # ART excludes features already at-or-past the bound from the search
        # domain up front (SaliencyMapMethod: x >= clip_max for theta > 0,
        # resp. x <= clip_min), so a clipped-to-no-op pair can never be
        # selected or consume the gamma budget. Inputs strictly outside the
        # clip range are excluded too (inequality, not exact equality).
        search0 = jnp.ones((n_feat,), bool)
        if clip is not None:
            search0 = x0 < clip[1] if theta > 0 else x0 > clip[0]
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


def _art_line_search_step(obj_per, w, lr, loss_now, direction,
                          max_halving, max_doubling):
    """One ART-semantics adaptive-lr update, vectorized over samples AND
    candidate step sizes.

    ART's CarliniL2Method replaces Adam with a bespoke per-sample line
    search each iteration (SURVEY ref `VD/attacks.py:606-622` reaches it):
      halving:  try lr; while loss >= previous, halve (up to max_halving);
      doubling: if the UNhalved lr already improved, keep doubling while
                each doubling improves on the last (up to max_doubling);
      no-move:  if nothing improves, stay put and carry the collapsed lr.
    Sequential on host in ART; here the whole candidate ladder
    lr * 2^k, k in [-(max_halving-1) .. max_doubling], is evaluated as ONE
    widened batched forward and the SAME accept rule is applied per sample —
    identical trajectory, TPU-shaped (documented divergence: candidates
    past the accept point are computed and discarded, not skipped).

    obj_per(w) -> per-sample objective (B,). Returns (w_new, lr_new).
    """
    n_half = max(max_halving - 1, 0)
    ks = jnp.arange(-n_half, max_doubling + 1, dtype=jnp.float32)
    cand_lr = lr[None, :] * (2.0 ** ks)[:, None]               # (K, B)
    wc = w[None] + cand_lr[..., None] * direction[None]        # (K, B, D)
    # vmap over the candidate axis: XLA fuses the K forwards into one
    # widened batch (the whole ladder costs one (K*B)-row model call)
    obj_c = jax.vmap(obj_per)(wc)                              # (K, B)
    improved = obj_c < loss_now[None, :]                       # (K, B)

    i0 = n_half  # index of the un-scaled lr candidate
    base_ok = improved[i0]
    # doubling chain: largest k such that every doubling up to k improved
    # on its predecessor (ART doubles only while it keeps getting better)
    dbl_better = obj_c[i0 + 1:] < obj_c[i0:-1] if max_doubling > 0 else (
        jnp.zeros((0, w.shape[0]), bool))
    chain = jnp.cumprod(dbl_better & improved[i0 + 1:], axis=0).astype(bool)
    n_dbl = jnp.sum(chain, axis=0)                             # (B,)
    pick_dbl = i0 + n_dbl
    # halving: first improving candidate walking lr, lr/2, ... (row i0
    # downward) — ART stops at the first improvement
    halv_rows = improved[i0::-1]                               # lr, lr/2, ..
    first_halv = jnp.argmax(halv_rows, axis=0)                 # (B,)
    any_halv = jnp.any(halv_rows, axis=0)
    pick_halv = i0 - first_halv
    pick = jnp.where(base_ok, pick_dbl, pick_halv)             # (B,)
    accept = base_ok | any_halv

    bidx = jnp.arange(w.shape[0])
    w_new = jnp.where(accept[:, None], wc[pick, bidx], w)
    # accepted lr persists; total failure carries the fully halved lr
    lr_new = jnp.where(accept, cand_lr[pick, bidx],
                       lr / (2.0 ** max(max_halving, 1)))
    return w_new, lr_new


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "binary_search_steps", "max_iter",
                     "optimizer", "max_halving", "max_doubling"),
)
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
    optimizer: str = "art",
    max_halving: int = 5,
    max_doubling: int = 5,
) -> jnp.ndarray:
    """Carlini&Wagner L2 (CarliniL2Method, `attacks.py:606-622`): minimize
    ||delta||^2 + c*f(x+delta) in tanh space, binary search over c. `clip`
    defaults to the per-batch (min, max) like ART does without clip_values.

    optimizer='art' (default) uses ART's adaptive-lr line search with
    max_halving/max_doubling (ART's defaults are 5/5) — the schedule the
    reference's numbers were produced with; optimizer='adam' keeps the
    C&W-paper-style Adam loop. The ENTIRE attack — all binary-search steps,
    all iterations, the line-search ladder — is ONE jitted program
    (`lax.scan` over c-steps and iterations): a confidence sweep
    (linspace(1,300,3), `attacks.py:607`) traces once and reuses the
    executable for every point (VERDICT r2 item 5).
    """
    b = x.shape[0]
    if clip is None:
        lo, hi = jnp.min(x), jnp.max(x)  # traced, not host floats
    else:
        lo, hi = clip
    span, mid = (hi - lo) / 2.0, (hi + lo) / 2.0
    x_c = jnp.clip(x, lo + 1e-6, hi - 1e-6)
    w0 = jnp.arctanh((x_c - mid) / (span + 1e-9) * 0.999999)

    def to_x(w):
        return jnp.tanh(w) * span + mid

    def obj_per(w, c):
        xa = to_x(w)
        l2 = jnp.sum((xa - x) ** 2, axis=-1)
        f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
        return l2 + c * f

    def attack_at_c(c):
        """(B,) per-sample constants -> (best_x, success) after max_iter."""

        def track(w, best_x, best_l2):
            xa = to_x(w)
            f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
            l2 = jnp.sum((xa - x) ** 2, axis=-1)
            better = (f <= 0.0) & (l2 < best_l2)
            return (jnp.where(better[:, None], xa, best_x),
                    jnp.where(better, l2, best_l2))

        if optimizer == "adam":
            opt = optax.adam(learning_rate)

            def body(carry, _):
                w, opt_state, best_x, best_l2 = carry
                g = jax.grad(lambda ww: jnp.sum(obj_per(ww, c)))(w)
                updates, opt_state = opt.update(g, opt_state)
                w = optax.apply_updates(w, updates)
                best_x, best_l2 = track(w, best_x, best_l2)
                return (w, opt_state, best_x, best_l2), None

            init = (w0, opt.init(w0), x, jnp.full((b,), jnp.inf))
            (w, _, best_x, best_l2), _ = jax.lax.scan(
                body, init, None, length=max_iter
            )
        else:  # 'art' line search

            def body(carry, _):
                w, lr, best_x, best_l2 = carry
                # one forward for BOTH the per-sample losses and (via the
                # pullback with an all-ones cotangent — obj_per is
                # row-separable) the per-sample gradients
                loss_now, pull = jax.vjp(lambda ww: obj_per(ww, c), w)
                (g,) = pull(jnp.ones_like(loss_now))
                w, lr = _art_line_search_step(
                    lambda ww: obj_per(ww, c), w, lr, loss_now, -g,
                    max_halving, max_doubling,
                )
                best_x, best_l2 = track(w, best_x, best_l2)
                return (w, lr, best_x, best_l2), None

            init = (w0, jnp.full((b,), learning_rate), x,
                    jnp.full((b,), jnp.inf))
            (w, _, best_x, best_l2), _ = jax.lax.scan(
                body, init, None, length=max_iter
            )
        success = jnp.isfinite(best_l2)
        final_x = jnp.where(success[:, None], best_x, to_x(w))
        return final_x, success, best_l2

    def bss_body(carry, _):
        c_lo, c_hi, c, best_overall, found = carry
        xa, success, _ = attack_at_c(c)
        better = (
            (success & ~found)
            | (success
               & (jnp.sum((xa - x) ** 2, -1)
                  < jnp.sum((best_overall - x) ** 2, -1)))
        )
        best_overall = jnp.where(better[:, None], xa, best_overall)
        found = found | success
        c_hi = jnp.where(success, c, c_hi)
        c_lo = jnp.where(success, c_lo, c)
        c = jnp.where(c_hi < 1e9, (c_lo + c_hi) / 2.0, c * 10.0)
        return (c_lo, c_hi, c, best_overall, found), None

    init = (jnp.zeros((b,)), jnp.full((b,), 1e10),
            jnp.full((b,), initial_const), x, jnp.zeros((b,), bool))
    (_, _, _, best_overall, _), _ = jax.lax.scan(
        bss_body, init, None, length=binary_search_steps
    )
    return best_overall


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "max_iter", "tau_steps", "optimizer",
                     "max_halving", "max_doubling"),
)
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
    optimizer: str = "adam",
    max_halving: int = 5,
    max_doubling: int = 5,
) -> jnp.ndarray:
    """Carlini&Wagner L-inf variant (CarliniLInfMethod, `attacks.py:571-587`):
    minimize c*f(x+delta) + sum(max(|delta| - tau, 0)) with tau shrinking
    geometrically — the penalty formulation from the C&W paper section VI.

    One jitted program: the tau schedule is a `lax.scan` over tau_steps
    (each containing a scan over max_iter), so a confidence sweep compiles
    once and reuses the executable per point (VERDICT r2 item 5);
    optimizer='art' swaps Adam for the ART-style per-sample lr line search
    (`_art_line_search_step`)."""
    b = x.shape[0]
    span = jnp.max(x) - jnp.min(x) + 1e-9
    tau0 = (jnp.float32(initial_tau) if initial_tau is not None
            else span / 10.0)

    def obj_per(d, tau):
        xa = x + d
        f = _cw_objective(logits_fn(xa), y, confidence, targeted=False)
        excess = jnp.maximum(jnp.abs(d) - tau, 0.0).sum(-1)
        return const * f + excess

    def tau_body(carry, _):
        delta, tau, best, best_linf, found = carry

        if optimizer == "adam":
            opt = optax.adam(learning_rate)

            def body(inner, _):
                d, opt_state = inner
                g = jax.grad(lambda dd: jnp.sum(obj_per(dd, tau)))(d)
                updates, opt_state = opt.update(g, opt_state)
                return (optax.apply_updates(d, updates), opt_state), None

            (delta, _), _ = jax.lax.scan(
                body, (delta, opt.init(delta)), None, length=max_iter
            )
        else:  # 'art'

            def body(inner, _):
                d, lr = inner
                # per-sample losses + gradients in one forward (row-
                # separable objective, all-ones cotangent pullback)
                loss_now, pull = jax.vjp(lambda dd: obj_per(dd, tau), d)
                (g,) = pull(jnp.ones_like(loss_now))
                d, lr = _art_line_search_step(
                    lambda dd: obj_per(dd, tau), d, lr, loss_now, -g,
                    max_halving, max_doubling,
                )
                return (d, lr), None

            (delta, _), _ = jax.lax.scan(
                body, (delta, jnp.full((b,), learning_rate)), None,
                length=max_iter,
            )

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
        return (delta, tau * tau_decrease, best, best_linf, found), None

    init = (jnp.zeros_like(x), tau0, x, jnp.full((b,), jnp.inf),
            jnp.zeros((b,), bool))
    (delta, _, best, _, found), _ = jax.lax.scan(
        tau_body, init, None, length=tau_steps
    )
    # unfound samples return the final iterate
    return jnp.where(found[:, None], best, x + delta)
