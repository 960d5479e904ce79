"""Multi-run (fused ensemble) training: per-run equivalence with the
single-run trainers, exact freeze semantics, rho sweeps, and runs-axis
sharding over the virtual 8-device mesh.

The contract under test: `train/multi_run.py` vmaps the SAME epoch program
the single-run device-resident path jits (train/epoch_scan.py), with
Trainer.fit's exact per-seed key derivation — so run r of a fused
multi-run must match a solo run of seed r up to f32 batched-GEMM rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_using_robust_nn_tpu.constraints.engine import (
    make_fista_constraint,
    make_simple_norm_constraint,
)
from asr_using_robust_nn_tpu.models.mlp import MLPConfig, init_mlp
from asr_using_robust_nn_tpu.parallel.mesh import pad_to_multiple
from asr_using_robust_nn_tpu.train.epoch_scan import build_epoch_fn
from asr_using_robust_nn_tpu.train.multi_run import (
    build_multi_run_epoch_fn,
    build_multi_run_eval_fn,
    fit_multi_run,
    init_multi_run_state,
)
from asr_using_robust_nn_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    adam_optimizer,
)

CFG = MLPConfig(in_dim=24, n_classes=4, hidden=(16, 8), dropout=(0.1, 0.0),
                nonneg=True)
BS = 64
OPT = adam_optimizer(1e-3)
CON = make_simple_norm_constraint(rho=1.0)
_shared = {}


def shared_mfn():
    """One vmapped 2-epoch program shared across tests (XLA CPU compiles
    dominate this file's runtime; same callable + same shapes = one
    compile)."""
    if "mfn" not in _shared:
        _shared["mfn"] = build_multi_run_epoch_fn(
            CFG, OPT, CON.apply, batch_size=BS, epochs_per_call=2)
    return _shared["mfn"]


def _toy_data(n, n_val, in_dim=24, n_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    y = rng.integers(0, n_classes, n).astype(np.int32)
    x[np.arange(n), y] += 2.0  # learnable signal
    xv = rng.standard_normal((n_val, in_dim)).astype(np.float32)
    yv = rng.integers(0, n_classes, n_val).astype(np.int32)
    xv[np.arange(n_val), yv] += 2.0
    return x, y, xv, yv


def _solo_keys(seed):
    """Trainer.fit's key derivation (trainer.py fit(): PRNGKey -> split ->
    fold_in(977) -> split)."""
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    kp, kd = jax.random.split(jax.random.fold_in(key, 977))
    return k0, kp, kd


def _fold(keys, i):
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, i)


def _run_leaf(tree, r):
    return jax.tree.map(lambda a: np.asarray(a)[r], tree)


class TestMultiRunEquivalence:
    def test_per_run_matches_single_run_epoch(self):
        """Each lane of the vmapped epoch == the single-run jitted epoch for
        that seed (same constraint, dropout, shuffle), to f32 tolerance."""
        x, y, _, _ = _toy_data(300, 8)
        d, n_true = pad_to_multiple(x, BS)
        l, _ = pad_to_multiple(y, BS)
        opt, con = OPT, CON
        seeds = [3, 7, 11]
        params, state, opt_state, cstate, kp, kd = init_multi_run_state(
            CFG, opt, seeds, con.init)
        mfn = shared_mfn()
        act = jnp.ones((3,), bool)
        p2, s2, o2, c2, ml, ma = mfn(params, state, opt_state, cstate, d, l,
                                     _fold(kp, 0), _fold(kd, 0), act, None,
                                     n_true)
        sfn = build_epoch_fn(CFG, opt, con.apply, batch_size=BS,
                             epochs_per_call=2)
        for r, seed in enumerate(seeds):
            k0, kp1, kd1 = _solo_keys(seed)
            p1, s1 = init_mlp(CFG, k0)
            p1b, s1b, _, _, l1, a1 = sfn(
                p1, s1, opt.init(p1), con.init(p1), d, l,
                jax.random.fold_in(kp1, 0), jax.random.fold_in(kd1, 0),
                n_true)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), b, rtol=2e-5, atol=2e-6),
                p1b, _run_leaf(p2, r))
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), b, rtol=2e-5, atol=2e-6),
                s1b, _run_leaf(s2, r))
            np.testing.assert_allclose(float(l1), float(ml[r]), rtol=1e-5)
            np.testing.assert_allclose(float(a1), float(ma[r]), atol=1e-6)

    def test_rho_sweep_matches_fixed_rho_runs(self):
        """constraint_factory + traced per-run rhos == separate fixed-rho
        constraints (the reference selects rho by editing code,
        train_constraints.py:100-102 — here it is one program)."""
        x, y, _, _ = _toy_data(300, 8)
        d, n_true = pad_to_multiple(x, BS)
        l, _ = pad_to_multiple(y, BS)
        opt = adam_optimizer(1e-3)
        rhos = [0.5, 1.0, 2.0]
        seeds = [5, 5, 5]
        st = init_multi_run_state(CFG, opt, seeds, CON.init)
        mfn = build_multi_run_epoch_fn(
            CFG, opt, constraint_factory=make_simple_norm_constraint,
            batch_size=BS, epochs_per_call=2)
        p2, *_ = mfn(*jax.tree.map(jnp.copy, st[:4]), d, l, _fold(st[4], 0),
                     _fold(st[5], 0), jnp.ones((3,), bool),
                     jnp.asarray(rhos, jnp.float32), n_true)
        # lane 1 (rho=1.0) must equal the fixed-closure rho=1.0 program
        # (shared_mfn) on the same seed — traced rho == baked-in rho
        pf, *_ = shared_mfn()(*st[:4], d, l, _fold(st[4], 0), _fold(st[5], 0),
                              jnp.ones((3,), bool), None, n_true)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a)[1], np.asarray(b)[1], rtol=2e-5, atol=2e-6),
            p2, pf)
        # different rho lanes genuinely diverge
        w = np.asarray(p2["layers"][0]["w"])
        assert not np.allclose(w[0], w[1]) and not np.allclose(w[1], w[2])

    def test_fista_factory_traced_rho(self):
        """FISTA's rho enters as singular-value clip bounds — it must also
        trace (one compiled program for a rho grid)."""
        x, y, _, _ = _toy_data(128, 8)
        d, n_true = pad_to_multiple(x, BS)
        l, _ = pad_to_multiple(y, BS)
        opt = adam_optimizer(1e-3)
        # nit=2 minimum: FISTA's first iteration is always an identity
        # update (z=0 -> w_cand=w); the reference's thesis setting is nit=2
        fista = lambda rho: make_fista_constraint(rho, nit=2)  # noqa: E731
        params, state, opt_state, cstate, kp, kd = init_multi_run_state(
            CFG, opt, [1, 1], fista(1.0).init)
        mfn = build_multi_run_epoch_fn(CFG, opt, constraint_factory=fista,
                                       batch_size=BS)
        # rho=1e-3 forces the singular-value clip to bind; rho=100 leaves
        # FISTA's early exit to fire (projection inactive) — the lanes must
        # diverge
        p2, *_ = mfn(params, state, opt_state, cstate, d, l, _fold(kp, 0),
                     _fold(kd, 0), jnp.ones((2,), bool),
                     jnp.asarray([1e-3, 100.0], jnp.float32), n_true)
        w0 = np.asarray(p2["layers"][0]["w"])
        assert np.isfinite(w0).all()
        assert not np.allclose(w0[0], w0[1])  # different rho -> different fit


class TestFreezeSemantics:
    def test_inactive_run_fully_frozen(self):
        """active=False lanes keep params, BN state, opt state, and cstate
        bit-identical; active lanes keep training."""
        x, y, _, _ = _toy_data(300, 8)
        d, n_true = pad_to_multiple(x, BS)
        l, _ = pad_to_multiple(y, BS)
        st = init_multi_run_state(CFG, OPT, [3, 7, 11], CON.init)
        params, state, opt_state, cstate, kp, kd = st
        mfn = shared_mfn()
        act = jnp.asarray([True, False, True])
        out = mfn(jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state),
                  jax.tree.map(jnp.copy, opt_state),
                  jax.tree.map(jnp.copy, cstate), d, l, _fold(kp, 0),
                  _fold(kd, 0), act, None, n_true)
        for old, new in zip((params, state, opt_state, cstate), out[:4]):
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a)[1], np.asarray(b)[1]), old, new)
        assert not np.array_equal(
            np.asarray(out[0]["layers"][0]["w"])[0],
            np.asarray(params["layers"][0]["w"])[0])


class TestFitMultiRun:
    def test_matches_trainer_fit_per_seed(self):
        """fit_multi_run == a loop of Trainer.fit(device_resident=True),
        per seed: best_val_loss, epochs_run, val history."""
        x, y, xv, yv = _toy_data(300, 80)
        con = make_simple_norm_constraint(rho=1.0)
        seeds = [3, 7]
        tcfg = TrainConfig(batch_size=BS, epochs=8, patience=6,
                           device_resident=True, epochs_per_dispatch=2)
        res = fit_multi_run(CFG, tcfg, x, y, xv, yv, seeds,
                            constraint=con.apply, constraint_init=con.init)
        p0, _ = init_mlp(CFG, jax.random.PRNGKey(0))
        for r, seed in enumerate(seeds):
            tr = Trainer(
                CFG,
                TrainConfig(batch_size=BS, epochs=8, patience=6,
                            device_resident=True, epochs_per_dispatch=2,
                            seed=seed),
                constraint=con.apply, constraint_state=con.init(p0))
            out = tr.fit(x, y, xv, yv)
            np.testing.assert_allclose(res["best_val_loss"][r],
                                       out["best_val_loss"], rtol=3e-4)
            assert res["epochs_run"][r] == out["epochs_run"]
            np.testing.assert_allclose(
                res["history"]["val_loss"][:, r],
                np.asarray(out["history"]["val_loss"]), rtol=3e-4)

    def test_early_stopping_per_run(self):
        """Runs stop at different chunks; frozen runs' val rows repeat
        exactly and their best snapshot is retained from before the
        freeze."""
        x, y, xv, yv = _toy_data(300, 80)
        # random val labels: val_loss deteriorates as the train set is fit,
        # so patience=2 fires — at a different chunk per seed
        yv = np.random.default_rng(1).permutation(yv)
        con = make_simple_norm_constraint(rho=1.0)
        tcfg = TrainConfig(batch_size=BS, epochs=30, patience=2,
                           device_resident=True, epochs_per_dispatch=1)
        res = fit_multi_run(CFG, tcfg, x, y, xv, yv, [3, 7, 11],
                            constraint=con.apply, constraint_init=con.init)
        er = res["epochs_run"]
        assert (er < 30).all(), er  # patience fired for every run
        vh = res["history"]["val_loss"]
        for r in range(3):
            stop_chunk = int(er[r])  # epochs_per_dispatch=1 -> chunk idx
            frozen = vh[stop_chunk:, r]
            if len(frozen) > 1:
                # frozen rows repeat the frozen value bit-for-bit
                assert np.all(frozen == frozen[0])
            # best val is the min of the run's live val history
            np.testing.assert_allclose(res["best_val_loss"][r],
                                       vh[:stop_chunk, r].min(), rtol=1e-6)

    def test_rho_grid_fit(self):
        """seeds x rhos paired grid trains in one fused program and the
        stronger constraint yields a smaller Lipschitz product."""
        from asr_using_robust_nn_tpu.constraints.lipschitz import (
            get_norms,
            get_upper_lipschitz,
        )

        x, y, xv, yv = _toy_data(300, 80)
        tcfg = TrainConfig(batch_size=BS, epochs=8, patience=8,
                           device_resident=True, epochs_per_dispatch=4)
        res = fit_multi_run(
            CFG, tcfg, x, y, xv, yv, [3, 3], rhos=[0.1, 10.0],
            constraint_factory=make_simple_norm_constraint)
        lips = [
            float(get_upper_lipschitz(get_norms(_run_leaf(res["params"], r))))
            for r in range(2)
        ]
        assert lips[0] < lips[1], lips

    def test_validation_errors(self):
        x, y, xv, yv = _toy_data(64, 8)
        tcfg = TrainConfig(batch_size=BS, epochs=2, device_resident=True)
        with pytest.raises(ValueError, match="non-empty validation"):
            fit_multi_run(CFG, tcfg, x, y, x[:0], y[:0], [0, 1])
        with pytest.raises(ValueError, match="go together"):
            fit_multi_run(CFG, tcfg, x, y, xv, yv, [0, 1],
                          constraint_factory=make_simple_norm_constraint)
        con = make_simple_norm_constraint(1.0)
        with pytest.raises(ValueError, match="either constraint or"):
            fit_multi_run(CFG, tcfg, x, y, xv, yv, [0, 1],
                          constraint=con.apply,
                          constraint_factory=make_simple_norm_constraint,
                          rhos=[1.0, 2.0])
        with pytest.raises(ValueError, match="one entry per run"):
            fit_multi_run(CFG, tcfg, x, y, xv, yv, [0, 1],
                          constraint_factory=make_simple_norm_constraint,
                          rhos=[1.0])


class TestMultiRunMesh:
    def test_runs_axis_sharded_equals_unsharded(self):
        """8 runs sharded over the 8-device mesh == unsharded fused run
        (ensemble parallelism: zero collectives on the train path)."""
        x, y, xv, yv = _toy_data(300, 80)
        con = make_simple_norm_constraint(rho=1.0)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("runs",))
        tcfg = TrainConfig(batch_size=BS, epochs=3, patience=6,
                           device_resident=True, epochs_per_dispatch=3)
        seeds = list(range(8))
        kw = dict(constraint=con.apply, constraint_init=con.init)
        res_m = fit_multi_run(CFG, tcfg, x, y, xv, yv, seeds, mesh=mesh, **kw)
        res_u = fit_multi_run(CFG, tcfg, x, y, xv, yv, seeds, **kw)
        np.testing.assert_allclose(res_m["best_val_loss"],
                                   res_u["best_val_loss"], rtol=3e-4)
        assert (res_m["epochs_run"] == res_u["epochs_run"]).all()

    def test_runs_not_divisible_raises(self):
        x, y, xv, yv = _toy_data(128, 8)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("runs",))
        tcfg = TrainConfig(batch_size=BS, epochs=2, device_resident=True)
        con = make_simple_norm_constraint(1.0)
        with pytest.raises(ValueError, match="divide across"):
            fit_multi_run(CFG, tcfg, x, y, xv, yv, [0, 1, 2],
                          constraint=con.apply, constraint_init=con.init,
                          mesh=mesh)


class TestFusedMultiRun:
    """Round-5: the Pallas epoch-grid kernel gains a runs axis via
    lax.scan (`build_multi_run_fused_epoch_fn`) — each run's epoch is one
    pallas_call with that run's state VMEM-resident (interpret mode
    here; TPU timing in bench.py `multi_run_epoch_ms_by_variant`)."""

    def _spec(self):
        from asr_using_robust_nn_tpu.ops.pallas_train import FusedStepSpec

        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        nonneg=True, dropout=(0.0, 0.0))
        return FusedStepSpec(cfg=cfg, batch=64, rho=0.5, pi_iters=8,
                             interpret=True)

    def _data(self, rng):
        from conftest import blobs_task

        x, y = blobs_task(rng, n=128, d=20, k=4)
        return x, y

    def test_each_run_matches_solo_fused_epoch(self, rng):
        from asr_using_robust_nn_tpu.ops.pallas_train import (
            build_fused_epoch_fn, pack_state, pad_features)
        from asr_using_robust_nn_tpu.train.multi_run import (
            build_multi_run_fused_epoch_fn, init_multi_run_fused_state)

        spec = self._spec()
        x, y = self._data(rng)
        data = pad_features(spec, x)
        lab = jnp.asarray(y)
        seeds = [3, 9]
        fstates, kps, kds = init_multi_run_fused_state(spec, seeds)
        mr = build_multi_run_fused_epoch_fn(spec, epochs_per_call=2,
                                            reshuffle_inner=False)
        fs2, losses, accs = mr(fstates, data, lab, kps, kds, None,
                               n_true=128)

        ep = build_fused_epoch_fn(spec, epochs_per_call=2,
                                  reshuffle_inner=False)
        for r, s in enumerate(seeds):
            key = jax.random.PRNGKey(s)
            key, k0 = jax.random.split(key)
            params, state = init_mlp(spec.cfg, k0)
            kp, kd = jax.random.split(jax.random.fold_in(key, 977))
            fs_solo, loss_s, acc_s = ep(pack_state(spec, params, state),
                                        data, lab, kp, kd, n_true=128)
            np.testing.assert_allclose(float(losses[r]), float(loss_s),
                                       rtol=0, atol=1e-5)
            np.testing.assert_allclose(float(accs[r]), float(acc_s),
                                       rtol=0, atol=1e-6)
            for a, b in zip(jax.tree.leaves(
                    jax.tree.map(lambda t, _r=r: t[_r], fs2)),
                    jax.tree.leaves(fs_solo)):
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(b, np.float32),
                                           rtol=0, atol=1e-5)

    def test_active_mask_freezes_exactly(self, rng):
        from asr_using_robust_nn_tpu.train.multi_run import (
            build_multi_run_fused_epoch_fn, init_multi_run_fused_state)
        from asr_using_robust_nn_tpu.ops.pallas_train import pad_features

        spec = self._spec()
        x, y = self._data(rng)
        data = pad_features(spec, x)
        lab = jnp.asarray(y)
        fstates, kps, kds = init_multi_run_fused_state(spec, [3, 9])
        # snapshot BEFORE the call: mr donates fstates
        frozen_before = jax.tree.map(
            lambda t: np.asarray(t[1], np.float32), fstates)
        active_before = jax.tree.map(
            lambda t: np.asarray(t[0], np.float32), fstates)
        mr = build_multi_run_fused_epoch_fn(spec, epochs_per_call=1,
                                            reshuffle_inner=False)
        act = jnp.asarray(np.array([True, False]))
        fs2, _, _ = mr(fstates, data, lab, kps, kds, act, n_true=128)
        # run 1 frozen bit-exactly; run 0 actually moved
        for a, b in zip(jax.tree.leaves(jax.tree.map(
                lambda t: np.asarray(t[1], np.float32), fs2)),
                jax.tree.leaves(frozen_before)):
            np.testing.assert_array_equal(a, b)
        moved = any(
            not np.array_equal(np.asarray(a[0], np.float32), b)
            for a, b in zip(jax.tree.leaves(fs2)[:4],
                            jax.tree.leaves(active_before)[:4]))
        assert moved

    def test_fit_multi_run_pallas_matches_solo_trainer(self, rng):
        """fit_multi_run(epoch_backend='pallas') run r == a solo
        Trainer.fit(seed=seeds[r], epoch_backend='pallas') — same kernel,
        same key derivation, same chunked early stopping."""
        from asr_using_robust_nn_tpu.train.trainer import Trainer

        x, y = self._data(rng)
        vx, vy = x[:64], y[:64]
        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        nonneg=True, dropout=(0.0, 0.0))
        tcfg = TrainConfig(batch_size=64, epochs=4, patience=4,
                           epochs_per_dispatch=2, device_resident=True,
                           epoch_backend="pallas", pallas_interpret=True)
        seeds = [3, 9]
        con = make_simple_norm_constraint(0.5, n_iter=8)
        res = fit_multi_run(cfg, tcfg, x, y, vx, vy, seeds,
                            constraint=con.apply, constraint_init=con.init,
                            epoch_backend="pallas")
        assert res["best_params"]["layers"][0]["w"].shape[0] == 2
        for r, s in enumerate(seeds):
            p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
            tr = Trainer(cfg, TrainConfig(
                batch_size=64, epochs=4, patience=4, seed=s,
                epochs_per_dispatch=2, device_resident=True,
                epoch_backend="pallas", pallas_interpret=True),
                constraint=con.apply, constraint_state=con.init(p0))
            solo = tr.fit(x, y, vx, vy)
            np.testing.assert_allclose(
                res["history"]["val_loss"][:, r],
                np.asarray(solo["history"]["val_loss"]), rtol=0, atol=1e-6)
            for a, b in zip(
                    jax.tree.leaves(jax.tree.map(lambda t, _r=r: t[_r],
                                                 res["best_params"])),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 solo["best_params"]))):
                np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
        # opt_state resumes: structure matches the optimizer template
        from asr_using_robust_nn_tpu.train.multi_run import _make_optimizer
        opt = _make_optimizer(tcfg)
        one = jax.tree.map(lambda t: t[0], res["best_opt_state"])
        p_one = jax.tree.map(lambda t: t[0], res["best_params"])
        assert jax.tree.structure(one) == \
            jax.tree.structure(opt.init(p_one))

    def test_fit_multi_run_pallas_refuses_unsupported(self, rng):
        x, y = self._data(rng)
        tcfg = TrainConfig(batch_size=64, epochs=2, patience=2)
        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        dropout=(0.0, 0.0))
        con = make_simple_norm_constraint(0.5, affected_layers_indices=(0,))
        with pytest.raises(ValueError, match="pallas"):
            fit_multi_run(cfg, tcfg, x, y, x[:64], y[:64], [0, 1],
                          constraint=con.apply, constraint_init=con.init,
                          epoch_backend="pallas")
