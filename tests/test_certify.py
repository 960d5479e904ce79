"""constraints/certify.py: the margin/Lipschitz certificate.

Oracles, strongest first:
  1. A pure LINEAR model, where the exact minimal flip radius is computable
     in closed form (min_j margin_j / ||w_y - w_j||_2) and the sound bound
     is exactly sigma_max(W) — the certificate must lower-bound the truth
     and the truth must be attainable by the analytic worst-case direction.
  2. Certified-implies-unbreakable: on a nonlinear BN model, NO attack
     within a certified radius may flip the prediction (FGSM/PGD at the
     certified L-inf budget, random L2 probes at 0.99 radius).
  3. Curve semantics: eps=0 equals clean accuracy, monotone nonincreasing,
     linf curve <= l2 curve, certified curve <= any empirical attack curve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_using_robust_nn_tpu.attacks.whitebox import fgsm, pgd
from asr_using_robust_nn_tpu.constraints.certify import (
    CertifyResult,
    certified_accuracy_curve,
    certified_radii,
    certify_sweep,
)
from asr_using_robust_nn_tpu.constraints.lipschitz import get_lipschitz_sound
from asr_using_robust_nn_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp


def _linear_cfg(d=8, c=4):
    return MLPConfig(in_dim=d, n_classes=c, hidden=(), batch_norm=False,
                     dropout=())


def _mlp_cfg(d=12, c=5):
    return MLPConfig(in_dim=d, n_classes=c, hidden=(16, 8),
                     batch_norm=True, dropout=(0.0, 0.0))


def _logits_fn(cfg, params, state):
    def f(x):
        return apply_mlp(cfg, params, state, x, train=False)[0]

    return f


class TestLinearOracle:
    """hidden=() -> logits = x @ W + b: everything is exact."""

    def setup_method(self):
        self.cfg = _linear_cfg()
        self.params, self.state = init_mlp(self.cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        self.x = rng.standard_normal((64, self.cfg.in_dim)).astype(np.float32)
        logits = np.asarray(
            _logits_fn(self.cfg, self.params, self.state)(self.x))
        self.y = logits.argmax(1).astype(np.int32)  # all "correct" by def
        self.W = np.asarray(self.params["layers"][0]["w"])  # (d, c)

    def test_sound_bound_is_sigma_max(self):
        lip = float(get_lipschitz_sound(self.cfg, self.params, self.state))
        sigma = np.linalg.svd(self.W, compute_uv=False)[0]
        assert lip == pytest.approx(float(sigma), rel=1e-5)

    def _exact_radii(self):
        """Closed form: the nearest decision boundary of a linear classifier
        from x is min_j (f_y - f_j) / ||w_y - w_j||_2."""
        logits = self.x @ self.W + np.asarray(self.params["layers"][0]["b"])
        out = np.empty(len(self.x))
        for i, y in enumerate(self.y):
            gaps = logits[i, y] - np.delete(logits[i], y)
            dirs = np.linalg.norm(
                self.W[:, [y] * (self.W.shape[1] - 1)]
                - np.delete(self.W, y, axis=1), axis=0)
            out[i] = np.min(gaps / dirs)
        return out

    def test_certificate_lower_bounds_exact_radius(self):
        radii, correct, _ = certified_radii(
            self.cfg, self.params, self.state, self.x, self.y)
        assert correct.all()
        exact = self._exact_radii()
        assert (radii <= exact + 1e-5).all()
        assert (radii > 0).all()
        # and it is not vacuous: within 2x of exact on this well-conditioned
        # problem (sqrt(2)*sigma_max vs ||w_y - w_j||)
        assert (radii >= exact / 25.0).all()

    def test_exact_radius_is_attainable(self):
        """Perturbing along the worst-case direction with norm just above
        the EXACT radius flips (or ties) the prediction — so the exact
        radius really is the boundary the certificate must stay inside."""
        logits = self.x @ self.W + np.asarray(self.params["layers"][0]["b"])
        i = 0
        y = self.y[i]
        gaps = logits[i, y] - np.delete(logits[i], y)
        others = np.delete(np.arange(self.cfg.n_classes), y)
        dirs = self.W[:, others] - self.W[:, [y] * len(others)]  # (d, c-1)
        norms = np.linalg.norm(dirs, axis=0)
        j = np.argmin(gaps / norms)
        r_exact = gaps[j] / norms[j]
        delta = dirs[:, j] / norms[j] * (r_exact * (1 + 1e-4))
        new_logits = (self.x[i] + delta) @ self.W + np.asarray(
            self.params["layers"][0]["b"])
        assert new_logits[others[j]] >= new_logits[y] - 1e-5

    def test_misclassified_gets_zero_radius(self):
        y_wrong = (self.y + 1) % self.cfg.n_classes
        radii, correct, _ = certified_radii(
            self.cfg, self.params, self.state, self.x, y_wrong)
        assert not correct.any()
        assert (radii == 0).all()


class TestCertifiedImpliesUnbreakable:
    """On a nonlinear BN model: no attack within the certified ball flips."""

    def setup_method(self):
        self.cfg = _mlp_cfg()
        self.params, self.state = init_mlp(self.cfg, jax.random.PRNGKey(2))
        rng = np.random.default_rng(3)
        self.x = rng.standard_normal((24, self.cfg.in_dim)).astype(np.float32)
        self.logits_fn = _logits_fn(self.cfg, self.params, self.state)
        self.y = np.asarray(self.logits_fn(self.x)).argmax(1).astype(np.int32)
        self.radii, self.correct, self.lip = certified_radii(
            self.cfg, self.params, self.state, self.x, self.y)

    def test_fgsm_and_pgd_cannot_flip_within_certificate(self):
        d = self.cfg.in_dim
        for i in range(len(self.x)):
            if self.radii[i] <= 0:
                continue
            eps_inf = 0.98 * self.radii[i] / np.sqrt(d)
            xi = jnp.asarray(self.x[i: i + 1])
            yi = jnp.asarray(self.y[i: i + 1])
            adv_f = fgsm(self.logits_fn, xi, yi, eps_inf)
            adv_p = pgd(self.logits_fn, xi, yi, eps_inf,
                        eps_step=eps_inf / 4, max_iter=20)
            for adv in (adv_f, adv_p):
                assert np.linalg.norm(np.asarray(adv - xi)) <= self.radii[i]
                assert int(np.asarray(self.logits_fn(adv)).argmax()) == \
                    self.y[i]

    def test_random_l2_probes_cannot_flip(self):
        rng = np.random.default_rng(4)
        for i in range(len(self.x)):
            if self.radii[i] <= 0:
                continue
            dirs = rng.standard_normal((8, self.cfg.in_dim))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            probes = self.x[i] + 0.99 * self.radii[i] * dirs
            preds = np.asarray(
                self.logits_fn(jnp.asarray(probes, jnp.float32))).argmax(1)
            assert (preds == self.y[i]).all()


class TestCurves:
    def setup_method(self):
        self.cfg = _mlp_cfg()
        self.params, self.state = init_mlp(self.cfg, jax.random.PRNGKey(5))
        rng = np.random.default_rng(6)
        self.x = rng.standard_normal((40, self.cfg.in_dim)).astype(np.float32)
        logits = np.asarray(_logits_fn(self.cfg, self.params, self.state)(
            self.x))
        # half true labels, half wrong: clean accuracy strictly inside (0,1)
        self.y = logits.argmax(1).astype(np.int32)
        self.y[::2] = (self.y[::2] + 1) % self.cfg.n_classes
        self.radii, self.correct, _ = certified_radii(
            self.cfg, self.params, self.state, self.x, self.y)

    def test_eps_zero_is_clean_accuracy(self):
        curve = certified_accuracy_curve(self.radii, self.correct, [0.0])
        assert curve[0] == pytest.approx(float(self.correct.mean()))

    def test_monotone_and_linf_below_l2(self):
        eps = np.linspace(0, float(self.radii.max()) * 1.5, 12)
        l2 = certified_accuracy_curve(self.radii, self.correct, eps)
        linf = certified_accuracy_curve(self.radii, self.correct, eps,
                                        norm="linf", d=self.cfg.in_dim)
        assert (np.diff(l2) <= 1e-12).all()
        assert (linf <= l2 + 1e-12).all()
        assert l2[-1] < l2[0]  # the grid actually exercises decay

    def test_linf_needs_d_and_bad_norm_rejected(self):
        with pytest.raises(ValueError):
            certified_accuracy_curve(self.radii, self.correct, [0.1],
                                     norm="linf")
        with pytest.raises(ValueError):
            certified_accuracy_curve(self.radii, self.correct, [0.1],
                                     norm="l1")

    def test_certified_never_exceeds_empirical_fgsm(self):
        """Soundness against a live attack: at every eps, the certified
        (provable) accuracy must lower-bound the measured FGSM accuracy."""
        logits_fn = _logits_fn(self.cfg, self.params, self.state)
        d = self.cfg.in_dim
        eps_grid = np.linspace(0, float(self.radii.max()) / np.sqrt(d), 6)
        cert = certified_accuracy_curve(self.radii, self.correct, eps_grid,
                                        norm="linf", d=d)
        for e, c in zip(eps_grid, cert):
            adv = fgsm(logits_fn, jnp.asarray(self.x), jnp.asarray(self.y),
                       float(e))
            emp = float((np.asarray(logits_fn(adv)).argmax(1) ==
                         self.y).mean())
            assert c <= emp + 1e-12


class TestSweep:
    def test_certify_sweep_shapes_and_dict(self):
        cfg_c = _mlp_cfg()
        cfg_u = MLPConfig(in_dim=12, n_classes=5, hidden=(16, 8),
                          batch_norm=False, dropout=(0.0, 0.0))
        pc, sc = init_mlp(cfg_c, jax.random.PRNGKey(7))
        pu, su = init_mlp(cfg_u, jax.random.PRNGKey(8))
        rng = np.random.default_rng(9)
        x = rng.standard_normal((16, 12)).astype(np.float32)
        y = rng.integers(0, 5, 16).astype(np.int32)
        eps = [0.0, 0.01, 0.1]
        res = certify_sweep(cfg_c, pc, sc, cfg_u, pu, su, x, y, eps)
        assert isinstance(res, CertifyResult)
        d = res.as_dict()
        assert len(d["certified_constrained"]) == 3
        assert len(d["certified_unconstrained"]) == 3
        assert d["lipschitz_sound_constrained"] > 0
        assert d["radius_stats_unconstrained"]["n_correct"] >= 0
        assert d["norm"] == "l2"
