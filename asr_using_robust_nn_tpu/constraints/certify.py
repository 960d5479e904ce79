"""Certified robustness from the sound Lipschitz bound.

The reference argues for Lipschitz-constrained networks EMPIRICALLY — by
plotting accuracy under attack sweeps (`Voice digit
recogniton/attacks.py:359-366`). Its Lipschitz analyzers
(`VD/extract_features_construct_dataset.py:154-196`) print the constant but
never close the loop into a guarantee. This module does: combining the
certificate-grade BN-inclusive bound (`get_lipschitz_sound`) with per-example
logit margins yields a *provable* lower bound on accuracy under ANY attack
inside a norm ball — the classical global-Lipschitz margin certificate
(Hein & Andriushchenko 2017; Tsuzuku et al. 2018, "Lipschitz-margin
training").

Math: let f be the logit map with global L2->L2 Lipschitz constant <= L, and
let x be classified as y with runner-up margin m(x) = f_y(x) - max_{j!=y}
f_j(x) > 0. Each pairwise gap g_j = f_y - f_j = <e_y - e_j, f(.)> is
(sqrt(2) L)-Lipschitz because ||e_y - e_j||_2 = sqrt(2), so no perturbation
with ||delta||_2 < m(x) / (sqrt(2) L) can make any g_j cross zero:

    radius_2(x) = m(x) / (sqrt(2) * L).

For L-inf attacks (FGSM/PGD) the ball {||delta||_inf <= eps} is contained in
{||delta||_2 <= eps * sqrt(d)}, giving radius_inf(x) = radius_2(x) / sqrt(d)
— loose at d = 880/2020 but sound.

Everything runs on device in one jitted program: margins are one batched
forward; L is a handful of per-layer SVDs (get_lipschitz_sound). The
certificate is *anytime-valid*: it holds for every attack, including ones
not implemented here, which is exactly what the empirical sweeps cannot
claim. Certified accuracy at eps is a LOWER bound on (and is tested against)
every empirical attack curve at the same eps.

Caveat spelled out in the round-1 robustness studies (docs/results_*): with
BatchNorm in the trunk, `rho`-constrained kernels do NOT imply a small sound
constant — the gamma/sqrt(var) gains multiply in. Certified accuracy is
therefore only nontrivial for models whose END-TO-END bound is small (e.g.
trained with strong simple_norm rho or without BN); for typical reference
recipes the certified curve collapses at tiny eps. That is an honest
property of the method, reported as-is, not a bug.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import MLPConfig, apply_mlp
from .lipschitz import get_lipschitz_sound

__all__ = [
    "certified_radii",
    "certified_accuracy_curve",
    "certify_sweep",
    "CertifyResult",
]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _radii_program(cfg: MLPConfig, params, state, x, y):
    logits, _ = apply_mlp(cfg, params, state, x, train=False)
    lip = get_lipschitz_sound(cfg, params, state)
    y = y.astype(jnp.int32)
    own = jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]
    runner_up = jnp.max(
        jnp.where(
            jax.nn.one_hot(y, logits.shape[1], dtype=bool), -jnp.inf, logits
        ),
        axis=1,
    )
    margin = own - runner_up
    correct = margin > 0  # argmax == y, ties resolved pessimistically
    radii = jnp.maximum(margin, 0.0) / (jnp.sqrt(2.0) * lip)
    return radii, correct, lip


def certified_radii(cfg: MLPConfig, params, state, x, y):
    """Per-example certified L2 radii on the model's input space.

    Returns (radii, correct, lipschitz_bound): radii[i] is the largest
    PROVEN-safe L2 perturbation norm for example i (0.0 when misclassified),
    correct[i] is clean correctness, lipschitz_bound the sound end-to-end
    constant used. Inputs must be in the space the model consumes (i.e.
    standardized features when the model was trained on them — the
    certificate is relative to that space, exactly like the white-box
    attacks, `attacks/whitebox.py`).
    """
    radii, correct, lip = _radii_program(
        cfg, params, state,
        jnp.asarray(x, jnp.float32), jnp.asarray(y),
    )
    return np.asarray(radii), np.asarray(correct), float(lip)


def certified_accuracy_curve(
    radii, correct, eps_grid, norm: str = "l2", d: int | None = None
):
    """Fraction of examples PROVABLY correct under any attack of strength
    eps, per eps in `eps_grid`.

    norm='l2' certifies {||delta||_2 <= eps}; norm='linf' certifies
    {||delta||_inf <= eps} via the sqrt(d) containment (requires `d`, the
    input dimension). At eps == 0 this equals clean accuracy.
    """
    radii = np.asarray(radii, np.float64)
    correct = np.asarray(correct, bool)
    if norm == "linf":
        if d is None:
            raise ValueError("norm='linf' needs d (input dimension)")
        radii = radii / np.sqrt(float(d))
    elif norm != "l2":
        raise ValueError(f"norm must be 'l2' or 'linf', got {norm!r}")
    eps = np.asarray(list(eps_grid), np.float64)
    # strict > except at eps=0, where clean correctness is the certificate
    return np.array(
        [float(np.mean(correct & ((radii > e) | (e == 0.0)))) for e in eps]
    )


@dataclasses.dataclass
class CertifyResult:
    """Certified-accuracy curves for the constrained/unconstrained pair —
    the provable counterpart of `attacks/sweeps.py::SweepResult`."""

    norm: str
    strengths: np.ndarray
    certified_constrained: np.ndarray
    certified_unconstrained: np.ndarray
    lipschitz_constrained: float
    lipschitz_unconstrained: float
    radius_stats_constrained: dict
    radius_stats_unconstrained: dict

    def as_dict(self):
        return {
            "norm": self.norm,
            "strengths": np.asarray(self.strengths).tolist(),
            "certified_constrained": self.certified_constrained.tolist(),
            "certified_unconstrained": self.certified_unconstrained.tolist(),
            "lipschitz_sound_constrained": self.lipschitz_constrained,
            "lipschitz_sound_unconstrained": self.lipschitz_unconstrained,
            "radius_stats_constrained": self.radius_stats_constrained,
            "radius_stats_unconstrained": self.radius_stats_unconstrained,
        }

    def plot(self, ax=None, title=None):
        """Reference comparison-plot style (`attacks.py:359-366`), dashed to
        mark these as certified LOWER bounds, not attack measurements."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.plot(self.strengths, self.certified_constrained, "r--",
                label="Constrained Model (certified)")
        ax.plot(self.strengths, self.certified_unconstrained, "b--",
                label="Unconstrained model (certified)")
        ax.legend()
        ax.set_title(title or f"Certified accuracy vs {self.norm} strength")
        ax.set_xlabel("Strength")
        ax.set_ylabel("Certified accuracy (lower bound)")
        return ax


def _radius_stats(radii, correct):
    r = np.asarray(radii)[np.asarray(correct, bool)]
    if r.size == 0:
        return {"n_correct": 0}
    return {
        "n_correct": int(r.size),
        "mean": float(r.mean()),
        "median": float(np.median(r)),
        "max": float(r.max()),
    }


def certify_sweep(
    cfg_c: MLPConfig, pc, sc,
    cfg_u: MLPConfig, pu, su,
    x, y, eps_grid, norm: str = "l2",
) -> CertifyResult:
    """Certified curves for a model pair on one (already standardized)
    feature set — the guarantee-side twin of `whitebox_sweep`."""
    rc, cc, lc = certified_radii(cfg_c, pc, sc, x, y)
    ru, cu, lu = certified_radii(cfg_u, pu, su, x, y)
    d = int(np.asarray(x).shape[1])
    return CertifyResult(
        norm=norm,
        strengths=np.asarray(list(eps_grid), np.float64),
        certified_constrained=certified_accuracy_curve(
            rc, cc, eps_grid, norm=norm, d=d),
        certified_unconstrained=certified_accuracy_curve(
            ru, cu, eps_grid, norm=norm, d=d),
        lipschitz_constrained=lc,
        lipschitz_unconstrained=lu,
        radius_stats_constrained=_radius_stats(rc, cc),
        radius_stats_unconstrained=_radius_stats(ru, cu),
    )
