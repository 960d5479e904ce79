"""ops/pallas_train.py: the fused Pallas train-step kernel, in interpret
mode on CPU (the real-TPU validation runs in the verify drive and bench).

Oracle: the XLA Trainer.train_step with the identical recipe. The kernel's
Dense matmuls run bf16-with-f32-accumulation and activations are stored
bf16 for the backward pass, so value tolerances are at the bf16 class
(~1e-2 relative on updates whose gradients are near zero); trajectory
tests check convergence + constraint landing instead of bitwise equality.
Dropout uses the TPU hardware PRNG and cannot run in interpret mode —
dropout tests live in the TPU drive."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
from asr_using_robust_nn_tpu.models.mlp import (
    MLPConfig,
    dense_kernels,
    init_mlp,
)
from asr_using_robust_nn_tpu.ops.pallas_train import (
    FusedStepSpec,
    build_fused_epoch_fn,
    build_fused_step,
    pack_state,
    pad_features,
    unpack_params,
)
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer

from conftest import blobs_task, product_norm_oracle


def small_spec(rho=0.5, **cfg_kw):
    defaults = dict(in_dim=20, n_classes=4, hidden=(32, 16), nonneg=True,
                    dropout=(0.0, 0.0))
    defaults.update(cfg_kw)
    cfg = MLPConfig(**defaults)
    return FusedStepSpec(cfg=cfg, batch=64, rho=rho, pi_iters=8,
                         interpret=True)


def xla_trainer(spec):
    con = (make_simple_norm_constraint(spec.rho, n_iter=spec.pi_iters)
           if spec.rho is not None else None)
    params, state = init_mlp(spec.cfg, jax.random.PRNGKey(0))
    tr = Trainer(spec.cfg, TrainConfig(batch_size=spec.batch),
                 constraint=con.apply if con else None,
                 constraint_state=con.init(params) if con else None)
    return tr, con, params, state


class TestFusedStep:
    def test_one_step_matches_xla(self, rng):
        spec = small_spec()
        tr, con, params, state = xla_trainer(spec)
        fstate = pack_state(spec, params, state)
        step = build_fused_step(spec)
        x = rng.standard_normal((64, 20)).astype(np.float32)
        y = jnp.asarray(rng.integers(0, 4, 64).astype(np.int32))
        w = jnp.ones((64,), jnp.float32)
        fs2, loss_p, acc_p = step(fstate, pad_features(spec, x), y, w,
                                  jnp.int32(7))
        o = tr.optimizer.init(params)
        p2, s2, _, _, loss_x, acc_x = tr.train_step(
            jax.tree.map(jnp.array, params), jax.tree.map(jnp.array, state),
            o, con.init(params), jnp.asarray(x), y, jax.random.PRNGKey(1))
        assert abs(float(loss_p) - float(loss_x)) < 5e-3
        assert abs(float(acc_p) - float(acc_x)) < 1e-6
        pp, ss = unpack_params(spec, fs2)
        for a, b in zip(pp["layers"], p2["layers"]):
            # one Adam step moves each weight by ~lr; bf16 grad noise can
            # flip near-zero gradients -> tolerance of two step sizes
            np.testing.assert_allclose(np.asarray(a["w"]),
                                       np.asarray(b["w"]), atol=2.5e-3)
        np.testing.assert_allclose(
            np.asarray(ss["layers"][0]["mean"]),
            np.asarray(s2["layers"][0]["mean"]), atol=1e-4)

    def test_row_weights_mask_padded_rows(self, rng):
        """A batch with 16 zero-weighted garbage rows must produce the
        same loss/update as the 48-row batch alone (BN moments, CCE, and
        gradients all row-masked — epoch_scan semantics)."""
        spec = small_spec()
        _, _, params, state = xla_trainer(spec)
        step = build_fused_step(spec)
        x = rng.standard_normal((64, 20)).astype(np.float32)
        x[48:] = 1e3  # poison rows
        y = rng.integers(0, 4, 64).astype(np.int32)
        w = np.ones((64,), np.float32)
        w[48:] = 0.0
        fs = pack_state(spec, params, state)
        fs2, loss, acc = step(fs, pad_features(spec, x), jnp.asarray(y),
                              jnp.asarray(w), jnp.int32(3))
        # same true rows, tiled to fill the batch, all weight 1/0 pattern
        x2 = np.concatenate([x[:48], x[:16]], 0)
        w2 = np.concatenate([np.ones(48), np.zeros(16)]).astype(np.float32)
        y2 = np.concatenate([y[:48], y[:16]]).astype(np.int32)
        fs = pack_state(spec, params, state)
        fs3, loss3, acc3 = step(fs, pad_features(spec, x2),
                                jnp.asarray(y2), jnp.asarray(w2),
                                jnp.int32(3))
        assert abs(float(loss) - float(loss3)) < 1e-5
        pp2 = unpack_params(spec, fs2)[0]
        pp3 = unpack_params(spec, fs3)[0]
        for a, b in zip(pp2["layers"], pp3["layers"]):
            np.testing.assert_allclose(np.asarray(a["w"]),
                                       np.asarray(b["w"]), atol=1e-4)

    def test_trajectory_and_constraint(self, rng):
        """30 steps: loss falls, the product norm lands at rho in BOTH the
        kernel and the XLA path, final weights stay within the bf16 drift
        envelope of the oracle trajectory."""
        x, y = blobs_task(rng, n=256, d=20, k=4)
        spec = small_spec()
        tr, con, params, state = xla_trainer(spec)
        fstate = pack_state(spec, params, state)
        step = build_fused_step(spec)
        o = tr.optimizer.init(params)
        p2 = jax.tree.map(jnp.array, params)
        s2 = jax.tree.map(jnp.array, state)
        c2 = con.init(params)
        losses = []
        for it in range(30):
            i0 = (it * 64) % 192
            xb, yb = x[i0:i0 + 64], jnp.asarray(y[i0:i0 + 64], jnp.int32)
            w = jnp.ones((64,), jnp.float32)
            fstate, lp, _ = step(fstate, pad_features(spec, xb), yb, w,
                                 jnp.int32(it))
            p2, s2, o, c2, lx, _ = tr.train_step(
                p2, s2, o, c2, jnp.asarray(xb), yb, jax.random.PRNGKey(it))
            losses.append((float(lp), float(lx)))
        assert losses[-1][0] < losses[0][0] * 0.7
        pp, _ = unpack_params(spec, fstate)
        assert product_norm_oracle(dense_kernels(pp)) <= spec.rho * 1.06
        assert product_norm_oracle(dense_kernels(p2)) <= spec.rho * 1.06
        # trajectories stay close in loss (bf16 drift, not divergence)
        assert abs(losses[-1][0] - losses[-1][1]) < 0.15

    def test_unconstrained_no_bn(self, rng):
        """speaker_unconstrained trunk shape: no BN, no constraint."""
        spec = FusedStepSpec(
            cfg=MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                          batch_norm=False, dropout=(0.0, 0.0)),
            batch=64, rho=None, interpret=True)
        _, _, params, state = xla_trainer(spec)
        step = build_fused_step(spec)
        x, y = blobs_task(rng, n=64, d=20, k=4)
        fs = pack_state(spec, params, state)
        losses = []
        for it in range(10):
            fs, loss, _ = step(fs, pad_features(spec, x),
                               jnp.asarray(y, jnp.int32),
                               jnp.ones((64,), jnp.float32), jnp.int32(it))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        # scales stay 1 without a constraint
        np.testing.assert_allclose(np.asarray(fs["scales"]), 1.0)

    def test_fused_epoch_fn(self, rng):
        """The epoch wrapper (XLA shuffle-gather + scan of fused steps)
        trains the blobs task to high accuracy."""
        x, y = blobs_task(rng, n=256, d=20, k=4)
        spec = small_spec(rho=None)
        spec = FusedStepSpec(cfg=spec.cfg, batch=64, rho=None,
                             interpret=True)
        _, _, params, state = xla_trainer(spec)
        fs = pack_state(spec, params, state)
        epoch = build_fused_epoch_fn(spec, epochs_per_call=2)
        data = pad_features(spec, x)
        lab = jnp.asarray(y, jnp.int32)
        for e in range(12):
            fs, loss, acc = epoch(fs, data, lab,
                                  jax.random.PRNGKey(1),
                                  jax.random.fold_in(jax.random.PRNGKey(2),
                                                     e), n_true=256)
        assert float(acc) > 0.9


class TestEpochGridKernel:
    """The grid epoch kernel (whole epoch = ONE pallas_call, weights
    resident across steps) must match the scan-of-step-kernels path
    exactly: same math, only the residency changes (eager vs deferred
    constraint scaling is algebraically the same multiply)."""

    def test_grid_equals_scan_steps(self, rng):
        x, y = blobs_task(rng, n=128, d=20, k=4)
        spec = small_spec()  # rho=0.5, nonneg, BN, dropout 0
        _, _, params, state = xla_trainer(spec)
        data = pad_features(spec, x)
        lab = jnp.asarray(y, jnp.int32)
        outs = {}
        for name, scan in [("grid", False), ("steps", True)]:
            ep = build_fused_epoch_fn(spec, epochs_per_call=1,
                                      scan_steps=scan)
            fs = pack_state(spec, params, state)
            fs, loss, acc = ep(fs, data, lab, jax.random.PRNGKey(1),
                               jax.random.PRNGKey(2), n_true=128)
            pp, ss = unpack_params(spec, fs)
            outs[name] = (np.asarray(loss), np.asarray(acc), pp, ss,
                          jax.tree.map(np.asarray, fs["mw"]))
        # tolerances: the two paths compute identical math, but the
        # full-matrix vs row-tiled dW GEMMs accumulate bf16 products in
        # different codegen orders, and early Adam amplifies O(1e-7)
        # gradient noise to a full +-lr flip wherever |g| is near zero
        # (update ~ sign(g) at t=1) — hence one epoch (2 steps) and
        # step-size-scale tolerances, not bitwise equality
        np.testing.assert_allclose(outs["grid"][0], outs["steps"][0],
                                   atol=5e-4)
        np.testing.assert_allclose(outs["grid"][1], outs["steps"][1],
                                   atol=1e-6)
        for a, b in zip(outs["grid"][2]["layers"],
                        outs["steps"][2]["layers"]):
            np.testing.assert_allclose(np.asarray(a["w"]),
                                       np.asarray(b["w"]), atol=2.5e-3)
            np.testing.assert_allclose(np.asarray(a["b"]),
                                       np.asarray(b["b"]), atol=2.5e-3)
        for a, b in zip(jax.tree.leaves(outs["grid"][4]),
                        jax.tree.leaves(outs["steps"][4])):
            np.testing.assert_allclose(a, b, atol=1e-3)
        # BN running stats too
        np.testing.assert_allclose(
            np.asarray(outs["grid"][3]["layers"][0]["mean"]),
            np.asarray(outs["steps"][3]["layers"][0]["mean"]), atol=1e-4)

    def test_grid_count_and_ragged_rows(self, rng):
        """Padded rows masked; Adam count advances by n_batches/epoch."""
        x, y = blobs_task(rng, n=100, d=20, k=4)  # 100 -> pad to 128
        spec = small_spec(rho=None)
        _, _, params, state = xla_trainer(spec)
        data = pad_features(spec, np.concatenate(
            [x, np.full((28, 20), 7.0, np.float32)]))
        lab = jnp.asarray(np.concatenate([y, np.zeros(28, np.int64)]),
                          jnp.int32)
        ep = build_fused_epoch_fn(spec, epochs_per_call=1)
        fs = pack_state(spec, params, state)
        for e in range(3):
            fs, loss, acc = ep(fs, data, lab, jax.random.PRNGKey(1),
                               jax.random.fold_in(jax.random.PRNGKey(2), e),
                               n_true=100)
        assert int(fs["count"][0]) == 6  # 2 batches x 3 epochs
        assert np.isfinite(float(loss))


class TestUnpackOptState:
    def test_structure_and_values(self, rng):
        """unpack_opt_state returns adam_optimizer's exact pytree structure
        with the kernel's moments/count, so fused-epoch checkpoints resume
        the Adam trajectory (round-5 pallas-epoch promotion)."""
        from asr_using_robust_nn_tpu.ops.pallas_train import unpack_opt_state

        x, y = blobs_task(rng, n=128, d=20, k=4)
        spec = small_spec()
        tr, con, params, state = xla_trainer(spec)
        ep = build_fused_epoch_fn(spec, epochs_per_call=2)
        fs = pack_state(spec, params, state)
        fs, _, _ = ep(fs, pad_features(spec, x), jnp.asarray(y),
                      jax.random.PRNGKey(1), jax.random.PRNGKey(2),
                      n_true=128)
        p2, s2 = unpack_params(spec, fs)
        o2 = unpack_opt_state(spec, fs, tr.optimizer, p2)
        template = tr.optimizer.init(p2)
        assert jax.tree.structure(o2) == jax.tree.structure(template)
        for a, b in zip(jax.tree.leaves(o2), jax.tree.leaves(template)):
            assert a.shape == b.shape and a.dtype == b.dtype
        # count: 2 batches x 2 epochs; moments non-zero after real steps
        flat = jax.tree.leaves(o2)
        counts = [a for a in flat if a.ndim == 0]
        assert any(int(c) == 4 for c in counts)
        mu_w = o2[0].mu["layers"][0]["w"] if hasattr(o2[0], "mu") else None
        assert mu_w is not None and float(jnp.abs(mu_w).max()) > 0

    def test_resume_continues_trajectory(self, rng):
        """A fused-epoch run checkpointed via unpack_* then resumed on the
        XLA trainer continues without an optimizer restart artifact: the
        resumed step must match an XLA step taken from the same
        (params, opt_state) point."""
        from asr_using_robust_nn_tpu.ops.pallas_train import unpack_opt_state

        x, y = blobs_task(rng, n=128, d=20, k=4)
        spec = small_spec()
        tr, con, params, state = xla_trainer(spec)
        ep = build_fused_epoch_fn(spec, epochs_per_call=4)
        fs = pack_state(spec, params, state)
        fs, _, _ = ep(fs, pad_features(spec, x), jnp.asarray(y),
                      jax.random.PRNGKey(1), jax.random.PRNGKey(2),
                      n_true=128)
        p2, s2 = unpack_params(spec, fs)
        o2 = unpack_opt_state(spec, fs, tr.optimizer, p2)
        cs = {"u": fs["u"][0, :spec.dims[-1]]}
        # one XLA step from the unpacked point: count must advance from 8
        p3, s3, o3, _, loss, _ = tr.train_step(
            p2, s2, o2, cs, jnp.asarray(x[:64]), jnp.asarray(y[:64]),
            jax.random.PRNGKey(3))
        counts = [a for a in jax.tree.leaves(o3) if a.ndim == 0]
        assert any(int(c) == 9 for c in counts)
        assert np.isfinite(float(loss))


class TestTrainerPallasBackend:
    """Round-5 promotion: TrainConfig.epoch_backend routes the device-
    resident fit through the fused epoch-grid kernel."""

    def _fit(self, rng, backend, seed=0, epochs=14):
        x, y = blobs_task(rng, n=128, d=20, k=4)
        vx, vy = x[:64], y[:64]
        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        nonneg=True, dropout=(0.0, 0.0))
        con = make_simple_norm_constraint(0.5, n_iter=8)
        params, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        tr = Trainer(cfg, TrainConfig(
            batch_size=64, epochs=epochs, patience=epochs, seed=seed,
            device_resident=True, epoch_backend=backend,
            pallas_interpret=(backend == "pallas")),
            constraint=con.apply, constraint_state=con.init(params))
        return tr, tr.fit(x, y, vx, vy)

    def test_pallas_fit_trains_and_matches_xla_class(self, rng):
        tr_p, rp = self._fit(rng, "pallas")
        rng2 = np.random.default_rng(0)
        tr_x, rx = self._fit(rng2, "xla")
        assert len(rp["history"]["loss"]) == len(rx["history"]["loss"])
        # same recipe, same data, bf16-class kernel: trajectories track
        # (probed 2026-08-20: 0.703 vs 0.719 at 12 epochs; the nonneg+
        # constrained recipe converges slowly on blobs, so this checks
        # backend agreement, not task mastery)
        assert rp["history"]["val_acc"][-1] > 0.4
        assert abs(rp["history"]["val_acc"][-1]
                   - rx["history"]["val_acc"][-1]) < 0.15
        # constraint landed: product spectral norm <= rho-ish on both
        sig_p = product_norm_oracle(
            [np.asarray(w) for w in dense_kernels(rp["best_params"])])
        assert sig_p < 0.5 * 1.5
        # opt_state in the result has the optimizer's structure (resume)
        template = tr_p.optimizer.init(rp["params"])
        assert jax.tree.structure(rp["opt_state"]) == \
            jax.tree.structure(template)

    def test_auto_stays_xla_on_cpu(self, rng):
        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        dropout=(0.0, 0.0))
        tr = Trainer(cfg, TrainConfig(batch_size=64, device_resident=True,
                                      epoch_backend="auto"))
        assert tr._resolve_epoch_backend(mesh=None, fresh_opt=True) is False

    def test_pallas_refuses_unsupported(self, rng):
        from asr_using_robust_nn_tpu.constraints import make_norm_constraint

        cfg = MLPConfig(in_dim=20, n_classes=4, hidden=(32, 16),
                        dropout=(0.0, 0.0))
        con = make_norm_constraint(0.5)  # not the kernel's projection
        tr = Trainer(cfg, TrainConfig(batch_size=64, device_resident=True,
                                      epoch_backend="pallas"),
                     constraint=con.apply)
        with pytest.raises(ValueError, match="simple_norm"):
            tr._resolve_epoch_backend(mesh=None, fresh_opt=True)
        # resumed Adam trajectory cannot pack into zeroed moments
        con2 = make_simple_norm_constraint(0.5)
        tr2 = Trainer(cfg, TrainConfig(batch_size=64, device_resident=True,
                                       epoch_backend="pallas"),
                      constraint=con2.apply)
        with pytest.raises(ValueError, match="fresh"):
            tr2._resolve_epoch_backend(mesh=None, fresh_opt=False)
