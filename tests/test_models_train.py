"""Model family + trainer tests: Keras forward parity, BN semantics,
training smoke (loss decreases, early stopping, checkpointing, h5 interop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_using_robust_nn_tpu.models.mlp import (
    MLPConfig,
    apply_mlp,
    dense_kernels,
    init_mlp,
    predict_probs,
)
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer
from asr_using_robust_nn_tpu.train.checkpoints import export_h5, import_keras_h5

from conftest import blobs_task, product_norm_oracle


def small_cfg(**kw):
    defaults = dict(
        in_dim=16, n_classes=4, hidden=(32, 16), dropout=(0.0, 0.0)
    )
    defaults.update(kw)
    return MLPConfig(**defaults)


def synthetic_task(rng, n=512, in_dim=16, n_classes=4):
    """Linearly separable-ish blobs (shared generator in conftest)."""
    return blobs_task(rng, n=n, d=in_dim, k=n_classes)


class TestModel:
    def test_shapes_all_variants(self, rng):
        x880 = rng.standard_normal((3, 880)).astype(np.float32)
        x2020 = rng.standard_normal((3, 2020)).astype(np.float32)
        for cfg, x in [
            (MLPConfig.digit_unconstrained(), x880),
            (MLPConfig.digit_constrained(), x880),
            (MLPConfig.speaker_unconstrained(), x2020),
            (MLPConfig.speaker_constrained(), x2020),
        ]:
            params, state = init_mlp(cfg, jax.random.PRNGKey(0))
            logits, _ = apply_mlp(cfg, params, state, x)
            assert logits.shape == (3, cfg.n_classes)
            assert len(dense_kernels(params)) == 6

    def test_param_count_digit(self):
        # ~1.65 M trainable weights (SURVEY.md §6 model size row)
        cfg = MLPConfig.digit_unconstrained()
        params, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        n = sum(int(np.prod(v.shape)) for p in params["layers"] for v in p.values())
        assert 1_600_000 < n < 1_800_000

    def test_dropout_only_in_train(self, rng):
        cfg = small_cfg(dropout=(0.5, 0.5))
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        x = rng.standard_normal((8, 16)).astype(np.float32)
        e1, _ = apply_mlp(cfg, params, state, x, train=False)
        e2, _ = apply_mlp(cfg, params, state, x, train=False)
        np.testing.assert_array_equal(e1, e2)
        t1, _ = apply_mlp(cfg, params, state, x, train=True, rng=jax.random.PRNGKey(1))
        t2, _ = apply_mlp(cfg, params, state, x, train=True, rng=jax.random.PRNGKey(2))
        assert not np.allclose(t1, t2)

    def test_bn_updates_moving_stats(self, rng):
        cfg = small_cfg()
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        x = (rng.standard_normal((64, 16)) * 5 + 2).astype(np.float32)
        _, new_state = apply_mlp(cfg, params, state, x, train=True,
                                 rng=jax.random.PRNGKey(0))
        # moving stats moved toward batch stats by (1 - 0.99)
        assert not np.allclose(new_state["layers"][0]["mean"],
                               state["layers"][0]["mean"])
        delta = np.abs(np.asarray(new_state["layers"][0]["mean"])).max()
        assert 0 < delta < 1.0  # only 1% of the batch mean

    def test_softmax_head(self, rng):
        cfg = small_cfg()
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        probs = predict_probs(cfg, params, state,
                              rng.standard_normal((5, 16)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


class TestKerasParity:
    """Build the reference's exact Keras graph, copy weights into our
    pytree, and compare eval-mode forward outputs."""

    @pytest.mark.filterwarnings("ignore")
    def test_forward_matches_keras(self, rng):
        tf = pytest.importorskip("tensorflow")
        from tensorflow.keras.layers import BatchNormalization, Dense, Dropout, Input
        from tensorflow.keras.models import Model

        inp = Input((16,))
        h = Dense(32, activation="relu")(inp)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        h = Dense(16, activation="relu")(h)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        out = Dense(4, activation="softmax")(h)
        km = Model(inp, out)

        cfg = small_cfg(dropout=(0.4, 0.4))
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        dense_i = bn_i = 0
        for layer in km.layers:
            w = layer.get_weights()
            if "dense" in layer.name:
                params["layers"][dense_i]["w"] = jnp.asarray(w[0])
                params["layers"][dense_i]["b"] = jnp.asarray(w[1])
                dense_i += 1
            elif "batch_normalization" in layer.name:
                params["layers"][bn_i]["gamma"] = jnp.asarray(w[0])
                params["layers"][bn_i]["beta"] = jnp.asarray(w[1])
                state["layers"][bn_i]["mean"] = jnp.asarray(w[2])
                state["layers"][bn_i]["var"] = jnp.asarray(w[3])
                bn_i += 1

        x = rng.standard_normal((32, 16)).astype(np.float32)
        want = km(x, training=False).numpy()
        got = np.asarray(predict_probs(cfg, params, state, x))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestTrainer:
    def test_loss_decreases_and_early_stops(self, rng):
        x, y = synthetic_task(rng)
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=200, patience=10, seed=0))
        res = tr.fit(x[:400], y[:400], x[400:], y[400:])
        assert res["history"]["loss"][-1] < res["history"]["loss"][0] * 0.5
        assert res["history"]["val_acc"][-1] > 0.8
        assert res["epochs_run"] <= 200

    def test_early_stopping_fires_on_plateau(self, rng):
        """Patience must actually stop training: a tiny train split with
        label-noised validation overfits immediately, so val_loss stops
        improving and the Keras-semantics wait>=patience break fires well
        before the epoch cap."""
        x, y = synthetic_task(rng, n=80)
        yv = y[40:].copy()
        yv = (yv + 1 + rng.integers(0, 3, len(yv))) % 4  # wrong-ish labels
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=16, epochs=500, patience=5,
                                      seed=0))
        res = tr.fit(x[:40], y[:40], x[40:], yv)
        assert res["epochs_run"] < 500
        # best checkpoint is from the pre-plateau epoch, not the last
        assert len(res["history"]["val_loss"]) == res["epochs_run"]

    def test_nonneg_constraint_enforced(self, rng):
        x, y = synthetic_task(rng, n=256)
        cfg = small_cfg(nonneg=True, batch_norm=True)
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=3, patience=100))
        res = tr.fit(x[:200], y[:200], x[200:], y[200:])
        for w in dense_kernels(res["params"]):
            assert float(jnp.min(w)) >= 0.0

    def test_evaluate_predict_consistency(self, rng):
        x, y = synthetic_task(rng, n=128)
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=32, epochs=2, patience=100))
        res = tr.fit(x[:96], y[:96], x[96:], y[96:])
        probs = tr.predict(res["params"], res["state"], x[96:])
        _, acc = tr.evaluate(res["params"], res["state"], x[96:], y[96:])
        manual_acc = float(np.mean(np.argmax(probs, -1) == y[96:]))
        assert abs(acc - manual_acc) < 1e-6

    def test_orbax_checkpoint_roundtrip(self, tmp_path, rng):
        x, y = synthetic_task(rng, n=128)
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=32, epochs=3, patience=100))
        res = tr.fit(x[:96], y[:96], x[96:], y[96:], checkpoint_dir=tmp_path / "ck")
        from asr_using_robust_nn_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(tmp_path / "ck")
        # restore with a FRESH template (different values from what was
        # saved) so a load that just echoes its template is caught
        fp, fs = init_mlp(cfg, jax.random.PRNGKey(99))
        tr2 = Trainer(cfg, TrainConfig(batch_size=32, epochs=1))
        tree, meta = mgr.load_best(
            {"params": fp, "state": fs,
             "opt_state": tr2.optimizer.init(fp)}
        )
        assert not np.allclose(np.asarray(fp["layers"][0]["w"]),
                               np.asarray(tree["params"]["layers"][0]["w"]))
        assert "val_loss" in meta
        np.testing.assert_allclose(
            np.asarray(tree["params"]["layers"][0]["w"]),
            np.asarray(res["best_params"]["layers"][0]["w"]),
        )

    def test_resume_does_not_clobber_better_best(self, tmp_path, rng):
        """Round-3 review: a resumed fit seeded with the checkpoint's
        stored val_loss must NOT overwrite a better saved best checkpoint
        with its own (worse) first epochs; and the restored optimizer
        state must be adoptable (optax structure intact)."""
        x, y = synthetic_task(rng, n=160)
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=32, epochs=8, patience=100))
        res = tr.fit(x[:96], y[:96], x[96:], y[96:],
                     checkpoint_dir=tmp_path / "ck")
        from asr_using_robust_nn_tpu.train.checkpoints import (
            CheckpointManager)

        mgr = CheckpointManager(tmp_path / "ck")
        _, meta0 = mgr.load_best()
        best0 = meta0["val_loss"]
        assert abs(best0 - res["best_val_loss"]) < 1e-6
        # resume exactly as the CLI does: warm params/state/opt_state +
        # stored best val seed, 1 epoch
        tr2 = Trainer(cfg, TrainConfig(batch_size=32, epochs=1,
                                       patience=100))
        ex_p, ex_s, ex_o, _ = tr2._init_train_state(jax.random.PRNGKey(0))
        example = jax.tree.map(np.asarray, {"params": ex_p, "state": ex_s,
                                            "opt_state": ex_o})
        tree, meta = mgr.load_best(example)
        res2 = tr2.fit(x[:96], y[:96], x[96:], y[96:],
                       params=tree["params"], state=tree["state"],
                       opt_state=tree["opt_state"],
                       initial_best_val=meta["val_loss"],
                       checkpoint_dir=tmp_path / "ck")
        _, meta2 = mgr.load_best()
        # the stored best only improves (or stays) across the resume
        assert meta2["val_loss"] <= best0 + 1e-9
        assert res2["best_val_loss"] <= best0 + 1e-9
        # NON-VACUOUS variant (the resumed epoch above may legitimately
        # improve): seed an unbeatable best — the saved checkpoint and the
        # returned best_params must be the WARM-START weights untouched,
        # not the final post-epoch params paired with the seeded loss
        tree3, _ = mgr.load_best(example)
        w0 = np.asarray(tree3["params"]["layers"][0]["w"]).copy()
        tr3 = Trainer(cfg, TrainConfig(batch_size=32, epochs=1,
                                       patience=100))
        res3 = tr3.fit(x[:96], y[:96], x[96:], y[96:],
                       params=tree3["params"], state=tree3["state"],
                       opt_state=tree3["opt_state"],
                       initial_best_val=0.0,
                       checkpoint_dir=tmp_path / "ck")
        assert res3["best_val_loss"] == 0.0
        np.testing.assert_array_equal(
            np.asarray(res3["best_params"]["layers"][0]["w"]), w0)
        _, meta3 = mgr.load_best()
        assert meta3["val_loss"] == meta2["val_loss"]  # never overwritten

    def test_fit_rejects_empty_validation(self, rng):
        x, y = synthetic_task(rng, n=64)
        tr = Trainer(small_cfg(), TrainConfig(batch_size=32, epochs=1))
        with pytest.raises(ValueError, match="validation"):
            tr.fit(x, y, x[:0], y[:0])

    def test_import_keras_h5_rejects_bn_mismatch(self, tmp_path, rng):
        """Round-3 review: variants can share every Dense shape and differ
        only in batch_norm — loading across that boundary must raise, not
        return a model with BN left at random init."""
        from asr_using_robust_nn_tpu.train.checkpoints import (
            export_h5, import_keras_h5)

        cfg_bn = small_cfg(batch_norm=True)
        cfg_no = small_cfg(batch_norm=False)
        p, s = init_mlp(cfg_no, jax.random.PRNGKey(0))
        export_h5(tmp_path / "no_bn.h5", p, s)
        with pytest.raises(ValueError, match="BatchNormalization"):
            import_keras_h5(tmp_path / "no_bn.h5", cfg_bn)
        p2, s2 = init_mlp(cfg_bn, jax.random.PRNGKey(0))
        export_h5(tmp_path / "bn.h5", p2, s2)
        with pytest.raises(ValueError, match="BatchNormalization"):
            import_keras_h5(tmp_path / "bn.h5", cfg_no)

    def test_h5_roundtrip(self, tmp_path, rng):
        cfg = small_cfg()
        params, state = init_mlp(cfg, jax.random.PRNGKey(3))
        export_h5(tmp_path / "m.h5", params, state)
        p2, s2 = import_keras_h5(tmp_path / "m.h5", cfg)
        x = rng.standard_normal((4, 16)).astype(np.float32)
        a = predict_probs(cfg, params, state, x)
        b = predict_probs(cfg, p2, s2, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @pytest.mark.filterwarnings("ignore")
    def test_keras_loads_our_export(self, tmp_path, rng):
        """The export direction of the interop claim: a LIVE Keras model
        must be able to `load_weights` our export_h5 file (requires the
        layer_names/weight_names attrs) and produce the same forward."""
        tf = pytest.importorskip("tensorflow")
        from tensorflow.keras.layers import (
            BatchNormalization,
            Dense,
            Dropout,
            Input,
        )
        from tensorflow.keras.models import Model

        cfg = small_cfg(dropout=(0.4, 0.4))
        params, state = init_mlp(cfg, jax.random.PRNGKey(5))
        path = str(tmp_path / "exp.h5")
        export_h5(path, params, state)

        inp = Input((16,))
        h = Dense(32, activation="relu")(inp)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        h = Dense(16, activation="relu")(h)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        out = Dense(4, activation="softmax")(h)
        km = Model(inp, out)
        km.load_weights(path)

        x = rng.standard_normal((8, 16)).astype(np.float32)
        want = np.asarray(predict_probs(cfg, params, state, x))
        got = km(x, training=False).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_import_tf2_golden_h5(self, tmp_path, rng):
        """Cross-load a genuine TF2-era full-model h5 byte layout.

        The reference's checkpoints were written by TF2 Keras `model.save`
        (loaded at `Voice digit recogniton/attacks.py:315-317`), which lays
        weights out as `model_weights/<layer>/<layer>/<var>:0` with
        layer_names / weight_names attrs and keras_version/backend root
        attrs. The TF baked into this image writes the TF3 layout, so this
        fixture synthesizes the exact TF2 byte layout via h5py and checks
        the importer end-to-end: import -> forward == a hand-computed numpy
        forward (relu MLP + BN inference semantics, Keras eps=1e-3).
        """
        import h5py

        cfg = small_cfg()
        dims = [16, 32, 16, 4]
        layer_names = [b"input_1"]
        ws, bs, bn = [], [], []
        for i in range(3):
            ws.append(rng.standard_normal((dims[i], dims[i + 1]))
                      .astype(np.float32) * 0.3)
            bs.append(rng.standard_normal(dims[i + 1]).astype(np.float32) * 0.1)
        for i in range(2):
            n = dims[i + 1]
            bn.append(dict(
                gamma=(1 + 0.1 * rng.standard_normal(n)).astype(np.float32),
                beta=(0.1 * rng.standard_normal(n)).astype(np.float32),
                moving_mean=(0.2 * rng.standard_normal(n)).astype(np.float32),
                moving_variance=(1 + 0.3 * rng.random(n)).astype(np.float32),
            ))

        path = str(tmp_path / "tf2_golden.h5")
        with h5py.File(path, "w") as f:
            # TF2 full-model file: model_config json attr omitted (the
            # importer only reads weights); root attrs as Keras 2.x wrote
            f.attrs["keras_version"] = np.bytes_("2.3.1")
            f.attrs["backend"] = np.bytes_("tensorflow")
            mw = f.create_group("model_weights")
            for i in range(3):
                lname = "dense" if i == 0 else f"dense_{i}"
                layer_names.append(lname.encode())
                g = mw.create_group(lname)
                g.attrs["weight_names"] = np.array(
                    [f"{lname}/kernel:0".encode(),
                     f"{lname}/bias:0".encode()])
                gg = g.create_group(lname)
                gg.create_dataset("kernel:0", data=ws[i])
                gg.create_dataset("bias:0", data=bs[i])
                if i < 2:
                    bname = ("batch_normalization" if i == 0
                             else f"batch_normalization_{i}")
                    layer_names.append(bname.encode())
                    bg = mw.create_group(bname)
                    bg.attrs["weight_names"] = np.array(
                        [f"{bname}/{v}:0".encode() for v in
                         ("gamma", "beta", "moving_mean", "moving_variance")])
                    bgg = bg.create_group(bname)
                    for v, val in bn[i].items():
                        bgg.create_dataset(f"{v}:0", data=val)
            mw.attrs["layer_names"] = np.array(layer_names)
            mw.attrs["backend"] = np.bytes_("tensorflow")
            mw.attrs["keras_version"] = np.bytes_("2.3.1")

        p2, s2 = import_keras_h5(path, cfg)
        x = rng.standard_normal((8, 16)).astype(np.float32)

        # hand-computed TF2 inference forward
        h = x
        for i in range(2):
            h = np.maximum(h @ ws[i] + bs[i], 0.0)
            h = (bn[i]["gamma"] * (h - bn[i]["moving_mean"])
                 / np.sqrt(bn[i]["moving_variance"] + 1e-3) + bn[i]["beta"])
        logits = h @ ws[2] + bs[2]
        e = np.exp(logits - logits.max(-1, keepdims=True))
        want = e / e.sum(-1, keepdims=True)

        got = np.asarray(predict_probs(cfg, p2, s2, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.filterwarnings("ignore")
    def test_import_keras3_weights_h5(self, tmp_path, rng):
        """Import the Keras 3 `.weights.h5` layout (layers/<name>/vars/<idx>)
        written by the TF baked into this image — the path the accuracy
        study's same-weights cross-probe uses to load reference-recipe-
        trained Keras checkpoints into the framework. Forward must match
        the live Keras model."""
        tf = pytest.importorskip("tensorflow")
        from tensorflow.keras.layers import (
            BatchNormalization,
            Dense,
            Dropout,
            Input,
        )
        from tensorflow.keras.models import Model

        inp = Input((16,))
        h = Dense(32, activation="relu")(inp)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        h = Dense(16, activation="relu")(h)
        h = BatchNormalization()(h)
        h = Dropout(0.4)(h)
        out = Dense(4, activation="softmax")(h)
        km = Model(inp, out)
        path = str(tmp_path / "k3.weights.h5")
        km.save_weights(path)

        cfg = small_cfg(dropout=(0.4, 0.4))
        p2, s2 = import_keras_h5(path, cfg)
        x = rng.standard_normal((8, 16)).astype(np.float32)
        want = km(x, training=False).numpy()
        got = np.asarray(predict_probs(cfg, p2, s2, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_import_wrong_variant_rejected(self, tmp_path):
        """A checkpoint whose shapes don't match the config must fail at
        load with a readable message, not at first forward."""
        cfg = small_cfg()
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        export_h5(tmp_path / "m.h5", params, state)
        other = small_cfg(in_dim=24)
        with pytest.raises(ValueError, match="wrong --task/--variant"):
            import_keras_h5(tmp_path / "m.h5", other)


class TestDeviceResident:
    def test_epoch_scan_matches_streaming_semantics(self, rng):
        """device_resident=True trains to the same quality as the streaming
        loop (same data, same recipe; batch composition differs only by the
        shuffle implementation)."""
        x, y = synthetic_task(rng, n=512)
        cfg = small_cfg()
        tcfg = dict(batch_size=64, epochs=25, patience=50, seed=0)
        res_s = Trainer(cfg, TrainConfig(**tcfg)).fit(
            x[:384], y[:384], x[384:], y[384:]
        )
        res_d = Trainer(cfg, TrainConfig(device_resident=True, **tcfg)).fit(
            x[:384], y[:384], x[384:], y[384:]
        )
        assert res_d["history"]["val_acc"][-1] > 0.85
        assert abs(res_d["history"]["val_acc"][-1]
                   - res_s["history"]["val_acc"][-1]) < 0.1

    def test_epoch_scan_ragged_and_constraint(self, rng):
        from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
        from asr_using_robust_nn_tpu.models.mlp import dense_kernels, init_mlp

        x, y = synthetic_task(rng, n=300)  # 250 train -> ragged with bs=64
        cfg = small_cfg(nonneg=True)
        con = make_simple_norm_constraint(0.5, n_iter=32)
        p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        tr = Trainer(
            cfg,
            TrainConfig(batch_size=64, epochs=3, patience=50,
                        device_resident=True),
            constraint=con.apply, constraint_state=con.init(p0),
        )
        res = tr.fit(x[:250], y[:250], x[250:], y[250:])
        assert np.isfinite(res["history"]["loss"]).all()
        assert product_norm_oracle(dense_kernels(res["params"])) <= 0.55

    def test_epochs_per_dispatch(self, rng):
        x, y = synthetic_task(rng, n=256)
        cfg = small_cfg()
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=40, patience=100,
                                      seed=0, device_resident=True,
                                      epochs_per_dispatch=8))
        res = tr.fit(x[:192], y[:192], x[192:], y[192:])
        # 40 epochs in 5 dispatches -> 5 history entries, 40 epochs of steps
        assert len(res["history"]["loss"]) == 5
        assert res["steps"] == 40 * 3  # 192/64 = 3 steps/epoch
        assert res["history"]["val_acc"][-1] > 0.8

    def test_epochs_per_dispatch_tail_and_counts(self, rng):
        x, y = synthetic_task(rng, n=256)
        cfg = small_cfg()
        # 10 epochs in strides of 8 -> dispatches of 8 and 2, exactly 10 run
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=10, patience=100,
                                      seed=0, device_resident=True,
                                      epochs_per_dispatch=8))
        res = tr.fit(x[:192], y[:192], x[192:], y[192:])
        assert res["epochs_run"] == 10
        assert res["steps"] == 10 * 3

    def test_epochs_per_dispatch_validation(self, rng):
        x, y = synthetic_task(rng, n=64)
        with pytest.raises(ValueError, match="epochs_per_dispatch"):
            Trainer(small_cfg(), TrainConfig(batch_size=32, epochs=2,
                                             device_resident=True,
                                             epochs_per_dispatch=0)).fit(
                x[:32], y[:32], x[32:], y[32:])

    def test_dropout_varies_across_fused_epochs(self, rng):
        """Frozen-shuffle mode must still draw fresh dropout per epoch:
        the E=2 fused program must EXACTLY equal two E=1 calls whose drop
        keys are fold_in(dk, 0) and fold_in(dk, 1)."""
        import jax as _jax

        from asr_using_robust_nn_tpu.train import adam_optimizer
        from asr_using_robust_nn_tpu.train.epoch_scan import build_epoch_fn

        x, y = synthetic_task(rng, n=128)
        cfg = small_cfg(dropout=(0.5, 0.5))
        opt = adam_optimizer()
        params, state = init_mlp(cfg, _jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        xd = jnp.asarray(x[:128])
        yd = jnp.asarray(y[:128]).astype(jnp.int32)
        pk, dk = _jax.random.PRNGKey(1), _jax.random.PRNGKey(2)

        fused = build_epoch_fn(cfg, opt, batch_size=64, shuffle=False,
                               epochs_per_call=2, reshuffle_inner=False)
        single = build_epoch_fn(cfg, opt, batch_size=64, shuffle=False,
                                epochs_per_call=1)
        import copy

        f_out = fused(copy.deepcopy(params), copy.deepcopy(state),
                      _jax.tree.map(jnp.array, opt_state), None, xd, yd,
                      pk, dk, 128)
        s_out = single(copy.deepcopy(params), copy.deepcopy(state),
                       _jax.tree.map(jnp.array, opt_state), None, xd, yd,
                       pk, _jax.random.fold_in(dk, 0), 128)
        s_out = single(s_out[0], s_out[1], s_out[2], None, xd, yd,
                       pk, _jax.random.fold_in(dk, 1), 128)
        np.testing.assert_allclose(
            np.asarray(f_out[0]["layers"][0]["w"]),
            np.asarray(s_out[0]["layers"][0]["w"]), atol=1e-6,
        )
        # and the two inner epochs used DIFFERENT dropout draws: a frozen-dk
        # variant produces different weights
        frozen = single(copy.deepcopy(params), copy.deepcopy(state),
                        _jax.tree.map(jnp.array, opt_state), None, xd, yd,
                        pk, _jax.random.fold_in(dk, 0), 128)
        frozen = single(frozen[0], frozen[1], frozen[2], None, xd, yd,
                        pk, _jax.random.fold_in(dk, 0), 128)
        assert not np.allclose(
            np.asarray(f_out[0]["layers"][0]["w"]),
            np.asarray(frozen[0]["layers"][0]["w"]), atol=1e-6,
        )

    def test_fit_twice_same_trainer(self, rng):
        """Donated buffers must not leak: two fit() calls on one Trainer
        (incl. a constraint state) work, as does passing params back in."""
        from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
        from asr_using_robust_nn_tpu.models.mlp import init_mlp

        x, y = synthetic_task(rng, n=128)
        cfg = small_cfg(nonneg=True)
        con = make_simple_norm_constraint(0.5, n_iter=8)
        p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        tr = Trainer(cfg, TrainConfig(batch_size=32, epochs=2, patience=100,
                                      device_resident=True),
                     constraint=con.apply, constraint_state=con.init(p0))
        r1 = tr.fit(x[:96], y[:96], x[96:], y[96:])
        r2 = tr.fit(x[:96], y[:96], x[96:], y[96:],
                    params=r1["best_params"], state=r1["best_state"])
        assert np.isfinite(r2["history"]["loss"]).all()
        # the params we passed in are still usable afterwards
        _ = np.asarray(r1["best_params"]["layers"][0]["w"]).sum()


class TestBF16Parity:
    """Mixed-precision gate (VERDICT r2 item 2): bf16 MXU compute with f32
    master weights must match the f32 recipe to <0.2% clean accuracy."""

    def test_forward_close_and_master_dtypes_f32(self, rng):
        cfg32 = small_cfg()
        cfg16 = cfg32.with_bf16()
        params, state = init_mlp(cfg16, jax.random.PRNGKey(0))
        # master weights are f32 regardless of compute dtype
        for leaf in jax.tree.leaves((params, state)):
            assert leaf.dtype == jnp.float32
        x = rng.standard_normal((64, 16)).astype(np.float32)
        l32, _ = apply_mlp(cfg32, params, state, x)
        l16, _ = apply_mlp(cfg16, params, state, x)
        assert l16.dtype == jnp.float32  # f32 accumulation
        # bf16 has ~3 decimal digits; logits are O(1)
        np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                                   atol=5e-2, rtol=5e-2)

    def test_trained_accuracy_parity(self, rng):
        x, y = synthetic_task(rng, n=768)
        res = {}
        for name, cfg in [("f32", small_cfg()),
                          ("bf16", small_cfg().with_bf16())]:
            tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=60,
                                          patience=1000, seed=0))
            r = tr.fit(x[:600], y[:600], x[600:], y[600:])
            _, acc = tr.evaluate(r["best_params"], r["best_state"],
                                 x[600:], y[600:])
            res[name] = acc
            # grads/updates stayed f32 end to end
            for leaf in jax.tree.leaves(r["params"]):
                assert leaf.dtype == jnp.float32
        assert res["f32"] > 0.85  # the task is learnable
        # the parity gate: <2% on this 168-row eval split (tighter than the
        # 0.2%-of-accuracy production gate, which needs the full-corpus
        # study — examples/accuracy_study.py runs that one)
        assert abs(res["f32"] - res["bf16"]) < 0.02

    def test_constrained_bf16_projection_stays_f32(self, rng):
        """NonNeg + simple_norm projection under bf16 compute: kernels stay
        f32 and the product-norm Lipschitz bound still lands at rho."""
        from asr_using_robust_nn_tpu.constraints import (
            make_simple_norm_constraint,
        )

        x, y = synthetic_task(rng, n=256)
        cfg = small_cfg(nonneg=True).with_bf16()
        con = make_simple_norm_constraint(0.5, n_iter=16)
        p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=3, patience=100),
                     constraint=con.apply, constraint_state=con.init(p0))
        r = tr.fit(x[:200], y[:200], x[200:], y[200:])
        for w in dense_kernels(r["params"]):
            assert w.dtype == jnp.float32
            assert float(jnp.min(w)) >= 0.0
        lip = product_norm_oracle(dense_kernels(r["params"]))
        assert lip <= 0.5 * 1.05


class TestLeanTraffic:
    """HBM-traffic levers (VERDICT r3 item 2): bf16-stored Adam moments,
    bf16 power-iteration matvecs, and the hoisted epoch-scan gather must
    all be parity-gated — the traffic drops, the math does not."""

    def test_adam_moments_bf16_state_and_structure(self, rng):
        from asr_using_robust_nn_tpu.train import adam_optimizer

        params, _ = init_mlp(small_cfg(), jax.random.PRNGKey(0))
        opt32 = adam_optimizer(1e-3)
        opt16 = adam_optimizer(1e-3, "bfloat16")
        s32, s16 = opt32.init(params), opt16.init(params)
        # same pytree STRUCTURE (checkpoints/multi-run are agnostic)
        assert (jax.tree.structure(s32) == jax.tree.structure(s16))
        adam16 = s16[0]
        assert adam16.count.dtype == jnp.int32
        for leaf in jax.tree.leaves((adam16.mu, adam16.nu)):
            assert leaf.dtype == jnp.bfloat16
        # one update: f32-math parity within bf16 storage noise
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)) * 0.1,
            params)
        u32, _ = opt32.update(g, s32, params)
        u16, s16b = opt16.update(g, s16, params)
        for a, b in zip(jax.tree.leaves(u32), jax.tree.leaves(u16)):
            assert b.dtype == jnp.float32  # updates are full precision
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=1e-8)

    def test_adam_moments_bf16_trained_parity(self, rng):
        x, y = synthetic_task(rng, n=768)
        acc = {}
        for name, dt in [("f32", "float32"), ("bf16", "bfloat16")]:
            tr = Trainer(small_cfg(),
                         TrainConfig(batch_size=64, epochs=60, patience=1000,
                                     seed=0, adam_moments_dtype=dt))
            r = tr.fit(x[:600], y[:600], x[600:], y[600:])
            _, a = tr.evaluate(r["best_params"], r["best_state"],
                               x[600:], y[600:])
            acc[name] = a
            for leaf in jax.tree.leaves(r["params"]):
                assert leaf.dtype == jnp.float32  # master weights f32
        assert acc["f32"] > 0.85
        assert abs(acc["f32"] - acc["bf16"]) < 0.02

    def test_matvec_bf16_sigma_parity(self, rng):
        from asr_using_robust_nn_tpu.ops.spectral import (
            product_spectral_norm_with_state,
        )

        ws = [jnp.asarray(rng.standard_normal((a, b)).astype(np.float32))
              for a, b in [(16, 32), (32, 16), (16, 4)]]
        s32, _ = product_spectral_norm_with_state(ws, n_iter=64)
        s16, _ = product_spectral_norm_with_state(
            ws, n_iter=64, matvec_dtype=jnp.bfloat16)
        assert abs(float(s16) - float(s32)) / float(s32) < 5e-3

    def test_matvec_bf16_constrained_training(self, rng):
        """simple_norm with bf16 matvecs still drives the product norm to
        rho and keeps kernels f32/nonneg."""
        from asr_using_robust_nn_tpu.constraints import (
            make_simple_norm_constraint,
        )

        x, y = synthetic_task(rng, n=256)
        cfg = small_cfg(nonneg=True)
        con = make_simple_norm_constraint(0.5, n_iter=16,
                                          matvec_dtype=jnp.bfloat16)
        p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        tr = Trainer(cfg, TrainConfig(batch_size=64, epochs=3, patience=100),
                     constraint=con.apply, constraint_state=con.init(p0))
        r = tr.fit(x[:200], y[:200], x[200:], y[200:])
        for w in dense_kernels(r["params"]):
            assert w.dtype == jnp.float32
            assert float(jnp.min(w)) >= 0.0
        lip = product_norm_oracle(dense_kernels(r["params"]))
        assert lip <= 0.5 * 1.06

    def test_hoisted_gather_fused_equals_sequential(self, rng):
        """epochs_per_call=2 + reshuffle_inner=False now gathers the
        shuffled split ONCE per dispatch; results must stay exactly equal
        to two single-epoch dispatches sharing the perm key (shuffle ON —
        the gather itself is what got hoisted)."""
        import copy

        from asr_using_robust_nn_tpu.train import adam_optimizer
        from asr_using_robust_nn_tpu.train.epoch_scan import build_epoch_fn

        x, y = synthetic_task(rng, n=160)  # 160 rows, bs=64 -> ragged pad
        cfg = small_cfg(dropout=(0.3, 0.3))
        opt = adam_optimizer()
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        opt_state = opt.init(params)
        from asr_using_robust_nn_tpu.parallel.mesh import pad_to_multiple

        xd, n_true = pad_to_multiple(np.asarray(x, np.float32), 64)
        yd, _ = pad_to_multiple(np.asarray(y, np.int32), 64)
        xd, yd = jnp.asarray(xd), jnp.asarray(yd)
        pk, dk = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

        fused = build_epoch_fn(cfg, opt, batch_size=64, shuffle=True,
                               epochs_per_call=2, reshuffle_inner=False)
        single = build_epoch_fn(cfg, opt, batch_size=64, shuffle=True,
                                epochs_per_call=1)
        f = fused(copy.deepcopy(params), copy.deepcopy(state),
                  jax.tree.map(jnp.array, opt_state), None, xd, yd, pk, dk,
                  n_true=n_true)
        s = single(copy.deepcopy(params), copy.deepcopy(state),
                   jax.tree.map(jnp.array, opt_state), None, xd, yd, pk,
                   jax.random.fold_in(dk, 0), n_true=n_true)
        s = single(s[0], s[1], s[2], None, xd, yd, pk,
                   jax.random.fold_in(dk, 1), n_true=n_true)
        for a, b in zip(jax.tree.leaves(f[0]), jax.tree.leaves(s[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
