"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_using_robust_nn_tpu.models.mlp import MLPConfig, init_mlp
from asr_using_robust_nn_tpu.parallel import (
    DataParallelTrainer,
    data_mesh,
    psum_train_step,
)
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer, adam_optimizer

from conftest import blobs_task as task
from conftest import product_norm_oracle


def cfg(**kw):
    base = dict(in_dim=16, n_classes=4, hidden=(32, 16), dropout=(0.0, 0.0))
    base.update(kw)
    return MLPConfig(**base)


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8
        mesh = data_mesh()
        assert mesh.devices.size == 8

    def test_submesh(self):
        mesh = data_mesh(4)
        assert mesh.devices.size == 4


class TestDataParallelTrainer:
    def test_matches_single_device_losses(self, rng):
        """Same seed, same data -> GSPMD losses track single-device losses
        (identical math; tiny float reduction-order drift allowed)."""
        x, y = task(rng)
        c = cfg()
        tcfg = TrainConfig(batch_size=64, epochs=3, patience=100, seed=0)
        single = Trainer(c, tcfg)
        res_s = single.fit(x[:384], y[:384], x[384:], y[384:])
        mesh = data_mesh()
        dp = DataParallelTrainer(c, mesh, tcfg)
        res_p = dp.fit(x[:384], y[:384], x[384:], y[384:])
        np.testing.assert_allclose(
            res_s["history"]["loss"], res_p["history"]["loss"], rtol=2e-3
        )
        np.testing.assert_allclose(
            res_s["history"]["val_acc"], res_p["history"]["val_acc"], atol=0.02
        )

    def test_ragged_batch_masking(self, rng):
        """Batch size 50 on 8 devices: padding rows must not leak into
        loss/accuracy."""
        x, y = task(rng, n=110)
        c = cfg()
        mesh = data_mesh()
        dp = DataParallelTrainer(c, mesh, TrainConfig(batch_size=50, epochs=2,
                                                      patience=100, seed=0))
        res = dp.fit(x[:100], y[:100], x[100:], y[100:])
        assert np.isfinite(res["history"]["loss"]).all()
        # eval on odd-size set equals manual accuracy
        probs = dp.predict(res["params"], res["state"], x[100:])
        _, acc = dp.evaluate(res["params"], res["state"], x[100:], y[100:])
        manual = float(np.mean(np.argmax(probs, -1) == y[100:]))
        assert abs(acc - manual) < 1e-6

    def test_constrained_dp_training(self, rng):
        from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
        from asr_using_robust_nn_tpu.models.mlp import dense_kernels

        x, y = task(rng, n=256)
        c = cfg(nonneg=True)
        con = make_simple_norm_constraint(0.5, n_iter=32)
        p0, _ = init_mlp(c, jax.random.PRNGKey(0))
        mesh = data_mesh()
        dp = DataParallelTrainer(
            c, mesh, TrainConfig(batch_size=64, epochs=2, patience=100),
            constraint=con.apply, constraint_state=con.init(p0),
        )
        res = dp.fit(x[:192], y[:192], x[192:], y[192:])
        assert product_norm_oracle(dense_kernels(res["params"])) <= 0.55


class TestPsumVariant:
    def test_explicit_collectives_match_gspmd(self, rng):
        x, y = task(rng, n=256)
        c = cfg(batch_norm=False)
        mesh = data_mesh()
        opt = adam_optimizer(1e-3)
        step = psum_train_step(c, opt, mesh)
        params, state = init_mlp(c, jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        xb, yb = jnp.asarray(x[:64]), jnp.asarray(y[:64])
        params2, _, _, loss, acc = step(params, state, opt_state, xb, yb,
                                        jax.random.PRNGKey(1))
        # oracle: same step single-device
        single = Trainer(c, TrainConfig(batch_size=64))
        p0, s0 = init_mlp(c, jax.random.PRNGKey(0))
        o0 = single.optimizer.init(p0)
        p1, _, _, _, loss_s, acc_s = single.train_step(
            p0, s0, o0, None, xb, yb, jax.random.PRNGKey(1)
        )
        np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(params2["layers"][0]["w"]),
            np.asarray(p1["layers"][0]["w"]),
            atol=1e-5,
        )

    def test_bn_model_rejected(self):
        mesh = data_mesh()
        with pytest.raises(ValueError):
            psum_train_step(cfg(batch_norm=True), adam_optimizer(), mesh)


class TestDeviceResidentDP:
    def test_sharded_epoch_scan(self, rng):
        """device_resident + mesh: one fused SPMD epoch program; quality
        matches the single-device device-resident run."""
        x, y = task(rng, n=512)
        c = cfg()
        tcfg = dict(batch_size=64, epochs=15, patience=50, seed=0)
        single = Trainer(c, TrainConfig(device_resident=True, **tcfg))
        res_s = single.fit(x[:384], y[:384], x[384:], y[384:])
        dp = DataParallelTrainer(
            c, data_mesh(), TrainConfig(device_resident=True, **tcfg)
        )
        res_p = dp.fit(x[:384], y[:384], x[384:], y[384:])
        assert res_p["history"]["val_acc"][-1] > 0.85
        assert abs(res_p["history"]["val_acc"][-1]
                   - res_s["history"]["val_acc"][-1]) < 0.1

    def test_indivisible_batch_rejected(self, rng):
        x, y = task(rng, n=64)
        with pytest.raises(ValueError):
            DataParallelTrainer(
                cfg(), data_mesh(),
                TrainConfig(batch_size=50, epochs=1, device_resident=True),
            ).fit(x[:48], y[:48], x[48:], y[48:])


class TestShardedFrontend:
    def test_mfcc_shards_over_mesh(self, rng):
        """The fused MFCC is pure: jitting it with a batch-sharded input
        runs SPMD over the mesh and matches the single-device result."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from asr_using_robust_nn_tpu.ops.mfcc_xla import (
            FrontendConfig,
            mfcc_xla_batch,
        )

        cfg = FrontendConfig.digit()
        waves = (rng.standard_normal((16, 22050)) * 0.1).astype(np.float32)
        want = np.asarray(mfcc_xla_batch(waves, cfg))
        mesh = data_mesh()
        sharded = jax.device_put(waves, NamedSharding(mesh, P("data")))
        got = np.asarray(mfcc_xla_batch(sharded, cfg))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestTensorParallel:
    """parallel/tensor_parallel.py — 2-D ('data','model') mesh, Megatron
    alternation expressed as GSPMD placements; math must equal the
    single-device trainer."""

    def _mesh(self, n_data=4, n_model=2):
        from asr_using_robust_nn_tpu.parallel import tp_mesh

        return tp_mesh(n_data, n_model)

    def test_specs_alternate(self):
        from jax.sharding import PartitionSpec as P

        from asr_using_robust_nn_tpu.parallel import mlp_tp_specs

        p_specs, s_specs = mlp_tp_specs(cfg())
        ls = p_specs["layers"]
        assert ls[0]["w"] == P(None, "model")      # column-parallel
        assert ls[0]["gamma"] == P("model")        # BN shards with features
        assert ls[1]["w"] == P("model", None)      # row-parallel
        assert ls[1]["b"] == P()
        assert ls[2]["w"] == P(None, None)         # head input replicated
        assert s_specs["layers"][0]["var"] == P("model")

    def test_default_digit_config_is_shardable(self):
        from asr_using_robust_nn_tpu.parallel.tensor_parallel import (
            _check_divisible,
        )

        for n_model in (2, 4, 8):
            _check_divisible(MLPConfig.digit_constrained(), n_model)
            _check_divisible(MLPConfig.speaker_unconstrained(), n_model)

    def test_indivisible_dim_rejected(self):
        from asr_using_robust_nn_tpu.parallel import TensorParallelTrainer

        with pytest.raises(ValueError):
            TensorParallelTrainer(
                cfg(hidden=(30, 16)), self._mesh(2, 4),
                TrainConfig(batch_size=8),
            )

    def test_device_resident_rejected(self):
        """Round-3 review: build_epoch_fn would replicate the TP-sharded
        buffers on its 1-D-mesh assumption — the TP trainer must refuse
        device_resident rather than silently train unsharded."""
        from asr_using_robust_nn_tpu.parallel import TensorParallelTrainer

        with pytest.raises(NotImplementedError, match="device_resident"):
            TensorParallelTrainer(
                cfg(), self._mesh(2, 4),
                TrainConfig(batch_size=8, device_resident=True),
            )

    def test_step_matches_single_device(self, rng):
        """One constrained TP train step == the single-device step (same
        init/batch/rng), and the updated kernels KEEP their TP shardings."""
        from asr_using_robust_nn_tpu.constraints import (
            make_simple_norm_constraint,
        )
        from asr_using_robust_nn_tpu.parallel import TensorParallelTrainer

        x, y = task(rng, n=64)
        c = cfg(nonneg=True)
        p0, _ = init_mlp(c, jax.random.PRNGKey(0))
        con = make_simple_norm_constraint(0.5, n_iter=8)
        tcfg = TrainConfig(batch_size=64, epochs=1, seed=0)
        tp = TensorParallelTrainer(
            c, self._mesh(), tcfg,
            constraint=con.apply, constraint_state=con.init(p0),
        )
        params, state, opt_state, cstate = tp.make_train_state(
            jax.random.PRNGKey(0)
        )
        assert params["layers"][0]["w"].sharding.spec == (
            jax.sharding.PartitionSpec(None, "model")
        )
        xb, yb = tp.place_batch(x, y)
        out = tp.train_step(params, state, opt_state, cstate, xb, yb,
                            jax.random.PRNGKey(1))
        loss = float(out[4])

        single = Trainer(c, tcfg, constraint=con.apply,
                         constraint_state=con.init(p0))
        sp, ss = init_mlp(c, jax.random.PRNGKey(0))
        s_out = single.train_step(
            sp, ss, single.optimizer.init(sp), con.init(sp),
            jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(1),
        )
        np.testing.assert_allclose(loss, float(s_out[4]), rtol=1e-5)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(out[0]["layers"][i]["w"]),
                np.asarray(s_out[0]["layers"][i]["w"]),
                atol=1e-5,
            )
        # updated params keep their TP placement (no silent resharding;
        # trailing None is normalized away by jax)
        P = jax.sharding.PartitionSpec
        assert out[0]["layers"][1]["w"].sharding.spec in (
            P("model"), P("model", None)
        )

    def test_multi_step_training_converges(self, rng):
        from asr_using_robust_nn_tpu.parallel import TensorParallelTrainer

        x, y = task(rng, n=256)
        c = cfg()
        tp = TensorParallelTrainer(c, self._mesh(), TrainConfig(batch_size=64))
        params, state, opt_state, cstate = tp.make_train_state()
        losses = []
        for e in range(6):
            for i in range(0, 256, 64):
                xb, yb = tp.place_batch(x[i:i+64], y[i:i+64])
                params, state, opt_state, cstate, loss, acc = tp.train_step(
                    params, state, opt_state, cstate, xb, yb,
                    jax.random.fold_in(jax.random.PRNGKey(2), e * 4 + i),
                )
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert float(acc) > 0.8


class TestTensorParallelFit:
    """ADVICE r2 item 1: tp.fit() must route through the TP placements —
    previously it fell back to the base trainer's unsharded path."""

    def test_fit_trains_sharded(self, rng):
        from asr_using_robust_nn_tpu.parallel import (
            TensorParallelTrainer, tp_mesh,
        )

        x, y = task(rng, n=256)
        c = cfg()
        tp = TensorParallelTrainer(
            c, tp_mesh(4, 2), TrainConfig(batch_size=64, epochs=4,
                                          patience=100, seed=0),
        )
        res = tp.fit(x[:192], y[:192], x[192:], y[192:])
        # final params carry the TP shardings (column-parallel layer 0)
        P = jax.sharding.PartitionSpec
        w0 = res["params"]["layers"][0]["w"]
        assert w0.sharding.spec == P(None, "model"), w0.sharding
        assert res["history"]["loss"][-1] < res["history"]["loss"][0]
        # and matches the single-device trainer's math (same seed/data;
        # deterministic shuffle from TrainConfig.seed)
        single = Trainer(c, TrainConfig(batch_size=64, epochs=4,
                                        patience=100, seed=0))
        s_res = single.fit(x[:192], y[:192], x[192:], y[192:])
        np.testing.assert_allclose(
            res["history"]["loss"], s_res["history"]["loss"], rtol=1e-4)

    def test_fit_warm_start_trains_sharded(self, rng):
        """Round-3 review: fit(params=..., state=...) previously fell into
        the base trainer's else-branch and trained UNSHARDED despite the
        mesh — _adopt_train_state must re-place caller trees with the TP
        shardings (and copy them: the jitted step donates its inputs)."""
        from asr_using_robust_nn_tpu.parallel import (
            TensorParallelTrainer, tp_mesh,
        )

        x, y = task(rng, n=256)
        c = cfg()
        tp = TensorParallelTrainer(
            c, tp_mesh(4, 2), TrainConfig(batch_size=64, epochs=2,
                                          patience=100, seed=0),
        )
        res = tp.fit(x[:192], y[:192], x[192:], y[192:])
        P = jax.sharding.PartitionSpec
        p_a, _, _, _ = tp._adopt_train_state(res["params"], res["state"])
        assert p_a["layers"][0]["w"].sharding.spec == P(None, "model")
        res2 = tp.fit(x[:192], y[:192], x[192:], y[192:],
                      params=res["params"], state=res["state"])
        w0 = res2["params"]["layers"][0]["w"]
        assert w0.sharding.spec == P(None, "model"), w0.sharding
        assert np.isfinite(res2["history"]["loss"]).all()
        # the caller's trees survived both adoptions (defensive copies)
        assert np.isfinite(
            np.asarray(res["params"]["layers"][0]["w"])).all()

    def test_fit_ragged_final_batch(self, rng):
        """A train split not divisible by the data-axis size must still fit
        (the ragged tail is replicated, not sharded)."""
        from asr_using_robust_nn_tpu.parallel import (
            TensorParallelTrainer, tp_mesh,
        )

        x, y = task(rng, n=150)  # 2 full 64-batches + ragged 22
        c = cfg()
        tp = TensorParallelTrainer(
            c, tp_mesh(4, 2), TrainConfig(batch_size=64, epochs=2,
                                          patience=100, seed=0),
        )
        res = tp.fit(x[:150], y[:150], x[:32], y[:32])
        assert np.isfinite(res["history"]["loss"]).all()

    def test_fit_survives_premesh_replicated_cstate(self, rng):
        """Round-3 review: jax.device_put ALIASES an array whose sharding
        already matches, and the donating train step then deletes the
        caller-owned constraint_state — _place_cstate must copy first.
        Two consecutive fits with a mesh-replicated cstate must both run
        and leave self.constraint_state readable."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from asr_using_robust_nn_tpu.constraints import (
            make_simple_norm_constraint,
        )
        from asr_using_robust_nn_tpu.parallel import (
            TensorParallelTrainer, tp_mesh,
        )

        x, y = task(rng, n=256)
        c = cfg(nonneg=True)
        con = make_simple_norm_constraint(0.5, n_iter=8)
        p0, _ = init_mlp(c, jax.random.PRNGKey(0))
        mesh = tp_mesh(4, 2)
        cstate = jax.device_put(con.init(p0), NamedSharding(mesh, P()))
        tp = TensorParallelTrainer(
            c, mesh, TrainConfig(batch_size=64, epochs=1, patience=100,
                                 seed=0),
            constraint=con.apply, constraint_state=cstate,
        )
        tp.fit(x[:192], y[:192], x[192:], y[192:])
        tp.fit(x[:192], y[:192], x[192:], y[192:])
        # the trainer's own cstate survived both donating runs
        jax.tree.map(np.asarray, tp.constraint_state)
