"""serve/engine.py: the fused WAV->label serving path.

Oracle: the unfused pipeline — Frontend.flat -> host standardize ->
models.predict_probs — which is itself parity-tested against the f64
librosa-semantics oracle and live Keras elsewhere in the suite.
"""

import numpy as np
import pytest

import jax

from asr_using_robust_nn_tpu.frontend.mfcc import Frontend
from asr_using_robust_nn_tpu.models.mlp import (
    MLPConfig,
    init_mlp,
    predict_probs,
)
from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig
from asr_using_robust_nn_tpu.serve.engine import InferenceEngine


def _digit_engine(buckets=(4, 16), scaler=True, seed=0):
    m_cfg = MLPConfig.digit_unconstrained()
    fe_cfg = FrontendConfig.digit()
    params, state = init_mlp(m_cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    sc = ((rng.standard_normal(880).astype(np.float32),
           (0.5 + rng.random(880)).astype(np.float32)) if scaler else None)
    eng = InferenceEngine(m_cfg, fe_cfg, params, state, scaler=sc,
                          backend="xla", buckets=buckets)
    return eng, (m_cfg, fe_cfg, params, state, sc)


def _waves(n, width=22050, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(width) / 22050.0
    return (0.3 * np.sin(2 * np.pi * rng.uniform(100, 800, (n, 1)) * t)
            + 0.02 * rng.standard_normal((n, width))).astype(np.float32)


def _oracle_probs(parts, waves, lengths=None):
    m_cfg, fe_cfg, params, state, sc = parts
    feats = Frontend(fe_cfg, backend="xla").flat(waves, lengths=lengths)
    feats = np.asarray(feats)
    if sc is not None:
        feats = (feats - sc[0]) / sc[1]
    return np.asarray(predict_probs(m_cfg, params, state, feats))


class TestEngineEquivalence:
    def test_matches_unfused_pipeline(self):
        eng, parts = _digit_engine()
        w = _waves(5)
        out = eng.classify(w)
        ref = _oracle_probs(parts, w)
        np.testing.assert_allclose(out["probs"], ref, atol=1e-5)
        assert (out["labels"] == ref.argmax(1)).all()

    def test_int16_ingress_bit_equal(self):
        """int16-PCM ingress (VERDICT r3 item 4): probs must be BIT-equal
        to f32 ingress of w/32768 — on-device dequantization by a
        power-of-two is exact for int16-origin samples."""
        eng, parts = _digit_engine()
        rng = np.random.default_rng(7)
        pcm = rng.integers(-32768, 32768, (5, 22050)).astype(np.int16)
        out16 = eng.classify(pcm)
        outf = eng.classify(pcm.astype(np.float32) / 32768.0)
        np.testing.assert_array_equal(out16["probs"], outf["probs"])
        assert (out16["labels"] == outf["labels"]).all()
        # list-of-rows int16 input stays int16 too
        out_list = eng.classify([pcm[i] for i in range(5)])
        np.testing.assert_array_equal(out_list["probs"], outf["probs"])
        # mixed dtypes fall back to f32 (no crash, same result)
        mixed = eng.classify([pcm[0], pcm[1].astype(np.float32) / 32768.0])
        np.testing.assert_allclose(mixed["probs"], outf["probs"][:2],
                                   atol=1e-6)

    def test_int16_frontend_bit_equal(self):
        """Frontend-level int16 ingress (the featurizer's host->device hop)
        is bit-identical to f32 ingress of w/32768."""
        from asr_using_robust_nn_tpu.frontend.mfcc import Frontend
        fe = Frontend(FrontendConfig.digit(), backend="xla")
        rng = np.random.default_rng(11)
        pcm = rng.integers(-32768, 32768, (3, 22050)).astype(np.int16)
        f16 = np.asarray(fe(pcm))
        f32 = np.asarray(fe(pcm.astype(np.float32) / 32768.0))
        np.testing.assert_array_equal(f16, f32)

    def test_int16_warmup_and_warm_latency_tracking(self):
        """warmup() compiles BOTH ingress dtypes; a first int16 call after
        warmup counts as warm (per-(bucket, dtype) tracking)."""
        eng, _ = _digit_engine(buckets=(4,))
        eng.warmup()
        pcm = np.zeros((3, 22050), np.int16)
        eng.classify(pcm)
        eng.classify(_waves(3))
        assert len(eng.latencies_s) == 2

    def test_no_scaler(self):
        eng, parts = _digit_engine(scaler=False)
        w = _waves(3)
        np.testing.assert_allclose(eng.classify(w)["probs"],
                                   _oracle_probs(parts, w), atol=1e-5)

    def test_variable_length_list_input(self):
        """Shorter rows are masked exactly; longer rows truncate to the
        1-s program width (digit MFCCs are cut to 44 frames regardless,
        VD/extract_features_construct_dataset.py:33-37)."""
        eng, parts = _digit_engine()
        full = _waves(3, width=30000)
        rows = [full[0][:9000], full[1][:22050], full[2]]  # short/exact/long
        out = eng.classify(rows)
        packed = np.zeros((3, 22050), np.float32)
        lens = np.array([9000, 22050, 22050])
        for i, r in enumerate(rows):
            m = min(len(r), 22050)
            packed[i, :m] = r[:m]
        ref = _oracle_probs(parts, packed, lengths=lens)
        np.testing.assert_allclose(out["probs"], ref, atol=1e-5)


class TestBuckets:
    def test_padding_invariance_and_compile_reuse(self):
        """Any request size gives per-row-identical results, and only
        bucket-sized programs exist (padding rows are exact no-ops: frozen
        scaler + BN moving stats mean no cross-row reduction)."""
        eng, parts = _digit_engine(buckets=(4, 16))
        w = _waves(9)
        ref = _oracle_probs(parts, w)
        for n in (1, 3, 4, 9):
            out = eng.classify(w[:n])
            np.testing.assert_allclose(out["probs"], ref[:n], atol=1e-5)
        assert {b for b, _ in eng._programs} <= {4, 16}

    def test_oversized_request_chunks(self):
        eng, parts = _digit_engine(buckets=(4,))
        w = _waves(10)
        out = eng.classify(w)
        np.testing.assert_allclose(out["probs"], _oracle_probs(parts, w),
                                   atol=1e-5)
        assert set(eng._programs) == {(4, 'float32')}

    def test_bad_buckets_rejected(self):
        m_cfg = MLPConfig.digit_unconstrained()
        params, state = init_mlp(m_cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="buckets"):
            InferenceEngine(m_cfg, FrontendConfig.digit(), params, state,
                            buckets=(16, 4))

    def test_warmup_then_latency_recorded(self):
        eng, _ = _digit_engine(buckets=(4,))
        eng.warmup()
        assert eng.latency_stats() == {"n": 0}
        eng.classify(_waves(2))
        eng.classify(_waves(3))
        st = eng.latency_stats()
        assert st["n"] == 2 and st["p50_ms"] > 0

    def test_cold_call_not_counted(self):
        eng, _ = _digit_engine(buckets=(4,))
        eng.classify(_waves(2))  # cold: includes compile
        assert eng.latency_stats() == {"n": 0}
        eng.classify(_waves(2))  # warm
        assert eng.latency_stats()["n"] == 1


class TestSpeakerWindows:
    def _speaker_engine(self):
        m_cfg = MLPConfig.speaker_unconstrained()
        fe_cfg = FrontendConfig.speaker()
        params, state = init_mlp(m_cfg, jax.random.PRNGKey(3))
        return InferenceEngine(m_cfg, fe_cfg, params, state, scaler=None,
                               backend="xla", buckets=(4,)), \
            (m_cfg, fe_cfg, params, state, None)

    def test_reference_slicing_and_vote(self):
        """5 s in -> first/last second dropped -> 3 windows
        (SR/extract_features_construct_dataset.py:203-222); vote matches
        the bincount-argmax of per-window labels."""
        eng, parts = self._speaker_engine()
        wave = _waves(1, width=5 * 22050)[0]
        out = eng.classify_windows(wave, agg="vote")
        assert out["n_windows"] == 3
        ref = _oracle_probs(parts, wave[22050:4 * 22050].reshape(3, 22050))
        np.testing.assert_allclose(out["probs"], ref, atol=1e-5)
        wl = ref.argmax(1)
        assert (out["window_labels"] == wl).all()
        assert out["label"] == int(np.bincount(
            wl, minlength=20).argmax())

    def test_mean_aggregation(self):
        eng, parts = self._speaker_engine()
        wave = _waves(1, width=5 * 22050, seed=9)[0]
        out = eng.classify_windows(wave, agg="mean")
        ref = _oracle_probs(parts, wave[22050:4 * 22050].reshape(3, 22050))
        assert out["label"] == int(ref.mean(0).argmax())

    def test_too_short_recording(self):
        eng, _ = self._speaker_engine()
        out = eng.classify_windows(np.zeros(30000, np.float32))
        assert out["label"] is None and out["n_windows"] == 0

    def test_bad_agg(self):
        eng, _ = self._speaker_engine()
        with pytest.raises(ValueError, match="agg"):
            eng.classify_windows(np.zeros(5 * 22050, np.float32), agg="max")


class TestFromCheckpointAndFiles:
    def test_checkpoint_scaler_files_roundtrip(self, tmp_path):
        """Orbax ckpt + artifact-derived scaler + WAV decode: classify_files
        equals classify on the decoded audio, and the scaler moments equal
        standardize_fit_all's."""
        from asr_using_robust_nn_tpu.data import (
            DatasetSplits,
            save_artifacts,
            standardize_fit_all,
        )
        from asr_using_robust_nn_tpu.train.checkpoints import (
            CheckpointManager,
        )
        from asr_using_robust_nn_tpu.train.trainer import adam_optimizer
        from asr_using_robust_nn_tpu.utils import audio_io

        m_cfg = MLPConfig.digit_unconstrained()
        params, state = init_mlp(m_cfg, jax.random.PRNGKey(4))
        opt_state = adam_optimizer(1e-3).init(params)
        ck = tmp_path / "ck"
        CheckpointManager(str(ck)).save_best(params, state, opt_state,
                                             epoch=1, val_loss=1.0)

        rng = np.random.default_rng(5)
        mk = lambda n: rng.standard_normal((n, 880)).astype(np.float32)  # noqa: E731
        lab = lambda n: rng.integers(0, 10, n).astype(np.int32)  # noqa: E731
        splits = DatasetSplits(mk(32), lab(32), mk(8), lab(8), mk(8), lab(8))
        art = tmp_path / "art"
        save_artifacts(splits, str(art))

        waves = _waves(3)
        wavdir = tmp_path / "wavs"
        wavdir.mkdir()
        paths = []
        for i, w in enumerate(waves):
            p = wavdir / f"{i}.wav"
            audio_io.write_wav(p, w, 22050)
            paths.append(str(p))

        eng = InferenceEngine.from_checkpoint(
            "digit", "unconstrained", str(ck), artifacts_dir=str(art),
            backend="xla", buckets=(4,))
        _, _, _, mean, scale = standardize_fit_all(
            splits.train_data, splits.dev_data, splits.test_data)
        np.testing.assert_allclose(np.asarray(eng._scaler[0]), mean,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(eng._scaler[1]), scale,
                                   rtol=1e-6)

        res = eng.classify_files(paths)
        decoded = [audio_io.load_audio(p, target_sr=22050)[0] for p in paths]
        direct = eng.classify(decoded)
        assert [r["label"] for r in res] == [int(v) for v in
                                             direct["labels"]]

    def test_from_checkpoint_requires_scaler_source(self, tmp_path):
        from asr_using_robust_nn_tpu.train.checkpoints import (
            CheckpointManager,
        )
        from asr_using_robust_nn_tpu.train.trainer import adam_optimizer

        m_cfg = MLPConfig.digit_unconstrained()
        params, state = init_mlp(m_cfg, jax.random.PRNGKey(4))
        CheckpointManager(str(tmp_path / "ck")).save_best(
            params, state, adam_optimizer(1e-3).init(params), epoch=1,
            val_loss=1.0)
        with pytest.raises(ValueError, match="artifacts_dir"):
            InferenceEngine.from_checkpoint(
                "digit", "unconstrained", str(tmp_path / "ck"))

    def test_missing_checkpoint_is_value_error(self, tmp_path):
        with pytest.raises(ValueError, match="no checkpoint"):
            InferenceEngine.from_checkpoint(
                "digit", "unconstrained", str(tmp_path / "nope"),
                standardize=False)
