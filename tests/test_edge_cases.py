"""Edge cases across the pipeline: odd sample rates, long/short files,
stereo sources, tiny corpora."""

import numpy as np
import pytest

from asr_using_robust_nn_tpu.data import build_dataset, walk_corpus
from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig, mfcc_xla_batch
from asr_using_robust_nn_tpu.ops import frontend_ref
from asr_using_robust_nn_tpu.utils import audio_io


class TestOddSampleRates:
    @pytest.mark.parametrize("sr", [8000, 44100, 22050])
    def test_load_audio_resamples(self, tmp_path, rng, sr):
        y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
            np.float32
        )
        p = tmp_path / f"f{sr}.wav"
        audio_io.write_wav(p, y, sr)
        out, got_sr = audio_io.load_audio(p, 22050, native=False)
        assert got_sr == 22050
        assert abs(len(out) - 22050) <= 2
        from asr_using_robust_nn_tpu.utils import native

        if native.available():
            out_n = native.decode_resample(p, 22050)
            n = min(len(out), len(out_n))
            np.testing.assert_allclose(out[:n], out_n[:n], atol=1e-5)


class TestExtremeDurations:
    def test_long_file_truncates_at_utterance_length(self, rng):
        # 3 s of audio -> 130 frames, truncated to 44 like the reference
        y = (rng.standard_normal((1, 3 * 22050)) * 0.1).astype(np.float32)
        got = np.asarray(mfcc_xla_batch(y, FrontendConfig.digit()))
        assert got.shape == (1, 20, 44)
        want = frontend_ref.mfcc_fixed_length_ref(y[0], 44)
        np.testing.assert_allclose(got[0], want, atol=2e-3, rtol=1e-4)

    def test_very_short_file(self, rng):
        # 0.1 s -> 5 true frames, rest zero-padded
        true = 2205
        waves = np.zeros((1, 22050), np.float32)
        waves[0, :true] = rng.standard_normal(true) * 0.1
        got = np.asarray(
            mfcc_xla_batch(waves, FrontendConfig.digit(),
                           lengths=np.array([true]))
        )
        n_true = frontend_ref.num_frames(true, 512)
        assert np.all(got[0][:, n_true:] == 0)
        assert np.isfinite(got).all()


class TestCorpusEdge:
    def test_stereo_file_in_corpus(self, tmp_path, rng):
        sr = 16000
        d = tmp_path / "data" / "zero"
        d.mkdir(parents=True)
        stereo = np.clip(rng.standard_normal((2, sr)) * 0.2, -0.9, 0.9)
        audio_io.write_wav(d / "st.wav", stereo.astype(np.float32), sr)
        mono = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
        for i in range(4):
            audio_io.write_wav(d / f"m{i}.wav", mono.astype(np.float32), sr)
        d2 = tmp_path / "data" / "one"
        d2.mkdir()
        for i in range(5):
            audio_io.write_wav(d2 / f"m{i}.wav", mono.astype(np.float32) * 0.5, sr)
        splits = build_dataset(tmp_path / "data", "digit", seed=0, backend="xla")
        assert np.isfinite(splits.train_data).all()

    def test_empty_class_folder_ignored(self, tmp_path):
        (tmp_path / "data" / "zero").mkdir(parents=True)
        (tmp_path / "data" / "one").mkdir()
        audio_io.write_wav(
            tmp_path / "data" / "one" / "a.wav",
            np.zeros(16000, np.float32), 16000,
        )
        files, labels, classes = walk_corpus(
            tmp_path / "data", ["zero", "one"]
        )
        assert len(files) == 1
        assert labels.tolist() == [1]

    def test_non_wav_files_skipped(self, tmp_path):
        d = tmp_path / "data" / "zero"
        d.mkdir(parents=True)
        (d / "README.txt").write_text("not audio")
        audio_io.write_wav(d / "a.wav", np.zeros(16000, np.float32), 16000)
        files, labels, _ = walk_corpus(tmp_path / "data", ["zero"])
        assert len(files) == 1
        assert files[0].endswith("a.wav")
