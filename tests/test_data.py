"""Data layer: corpus walk, 70/20/10 split, 1-s slicing, artifacts, scaler."""

import os

import numpy as np
import pytest

from asr_using_robust_nn_tpu.data import (
    DIGIT_WORDS,
    DatasetSplits,
    build_dataset,
    load_artifacts,
    save_artifacts,
    slice_seconds,
    split_files,
    standardize_fit_all,
    walk_corpus,
)
from asr_using_robust_nn_tpu.utils import audio_io


@pytest.fixture()
def digit_corpus(tmp_path, rng):
    """Tiny on-disk Speech-Commands-style tree: 3 words x 5 files @16 kHz."""
    sr = 16000
    words = ["zero", "one", "two"]
    for w in words:
        d = tmp_path / "data" / w
        d.mkdir(parents=True)
        for i in range(5):
            t = np.arange(sr) / sr
            y = 0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t)
            audio_io.write_wav(d / f"{w}_{i}.wav", y.astype(np.float32), sr)
    # distractor folder that is NOT a digit word — must be ignored
    d = tmp_path / "data" / "_background_noise_"
    d.mkdir()
    audio_io.write_wav(d / "x.wav", np.zeros(100, np.float32), sr)
    return tmp_path / "data"


class TestCorpus:
    def test_walk_digit_layout(self, digit_corpus):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            files, labels, classes = walk_corpus(digit_corpus, DIGIT_WORDS)
        # classes keep the CANONICAL list so labels are stable even when
        # folders are missing (fix over the reference, docs/PARITY.md)
        assert classes == DIGIT_WORDS
        assert len(files) == 15
        assert labels.tolist() == [0] * 5 + [1] * 5 + [2] * 5

    def test_missing_folder_labels_stable(self, digit_corpus):
        import shutil
        import warnings

        shutil.rmtree(digit_corpus / "one")
        with pytest.warns(UserWarning, match="missing"):
            files, labels, classes = walk_corpus(digit_corpus, DIGIT_WORDS)
        # 'two' keeps label 2 even though 'one' is gone
        assert sorted(set(labels.tolist())) == [0, 2]

    def test_walk_speaker_layout(self, digit_corpus):
        # class_names=None: sorted subfolders, including the distractor
        files, labels, classes = walk_corpus(digit_corpus)
        assert classes[0] == "_background_noise_"
        assert len(files) == 16


class TestSplit:
    def test_ratios_and_determinism(self):
        files = [f"f{i}" for i in range(100)]
        labels = np.arange(100)
        (tr, ltr), (dv, ldv), (te, lte) = split_files(files, labels, seed=7)
        assert len(tr) == 70 and len(dv) == 20 and len(te) == 10
        tr2, _, _ = split_files(files, labels, seed=7)
        assert tr2[0] == tr
        # labels stay paired with their files
        for f, l in zip(tr, ltr):
            assert f == f"f{l}"

    def test_reference_tail_test_semantics(self):
        # test is the LAST 10% — with n=99, int(99*.9)=89 and int(99*.1)=9,
        # so dev=[69:89] and test=[90:] with one file (index 89) unused, and
        # on other n values dev/test may overlap — reference parity (§2.3).
        files = [f"f{i}" for i in range(99)]
        (tr, _), (dv, _), (te, _) = split_files(files, np.arange(99), seed=None)
        assert len(tr) == 69 and len(dv) == 20 and len(te) == 9
        assert te[0] == "f90"

    def test_tiny_corpus_minus_zero_quirk(self):
        # n=9: int(9*0.1)==0 -> the reference's [-0:] slice takes ALL files
        files = [f"f{i}" for i in range(9)]
        (_, _), (_, _), (te, lte) = split_files(files, np.arange(9), seed=None)
        assert len(te) == 9
        assert len(lte) == 9


class TestSlicing:
    def test_drops_first_and_last_second(self):
        sr = 22050
        y = np.arange(5 * sr, dtype=np.float32)
        s = slice_seconds(y, sr)
        # 5 s -> drop first and last -> 3 windows starting at sr
        assert s.shape == (3, sr)
        assert s[0, 0] == sr
        assert s[-1, -1] == 4 * sr - 1

    def test_partial_trailing_second_discarded(self):
        sr = 100
        y = np.zeros(int(3.7 * sr), dtype=np.float32)
        s = slice_seconds(y, sr)
        # audio_len=3 -> keep y[100:200] -> 1 window (ref drops >1s at end)
        assert s.shape == (1, sr)

    def test_too_short_gives_empty(self):
        assert slice_seconds(np.zeros(150), 100).shape == (0, 100)


class TestArtifacts:
    def test_roundtrip(self, tmp_path, rng):
        s = DatasetSplits(
            train_data=rng.standard_normal((10, 8)),
            train_label=np.arange(10),
            dev_data=rng.standard_normal((4, 8)),
            dev_label=np.arange(4),
            test_data=rng.standard_normal((2, 8)),
            test_label=np.arange(2),
            test_filenames=np.array(["a.wav", "b.wav"]),
            test_audio_label=np.array([0, 1]),
        )
        save_artifacts(s, tmp_path / "out")
        s2 = load_artifacts(tmp_path / "out")
        np.testing.assert_array_equal(s2.train_data, s.train_data)
        np.testing.assert_array_equal(s2.test_label, s.test_label)
        assert list(s2.test_filenames) == ["a.wav", "b.wav"]
        names = set(os.listdir(tmp_path / "out"))
        assert {"train_data.npy", "dev_label.npy", "test_data.npy"} <= names


class TestStandardize:
    def test_fit_on_all_semantics(self, rng):
        tr = rng.standard_normal((50, 3)) * 2 + 1
        dv = rng.standard_normal((20, 3)) * 3 - 1
        te = rng.standard_normal((10, 3))
        a, b, c, mean, scale = standardize_fit_all(tr, dv, te)
        allz = np.concatenate([a, b, c])
        np.testing.assert_allclose(allz.mean(axis=0), 0, atol=1e-12)
        np.testing.assert_allclose(allz.std(axis=0), 1, atol=1e-12)
        # sklearn oracle
        from sklearn.preprocessing import StandardScaler

        want = StandardScaler().fit_transform(np.concatenate([tr, dv, te]))
        np.testing.assert_allclose(allz, want, atol=1e-10)

    def test_constant_feature(self):
        tr = np.ones((5, 2))
        tr[:, 1] = np.arange(5)
        a, b, c, _, scale = standardize_fit_all(tr, tr, tr)
        assert scale[0] == 1.0  # constant column untouched (sklearn rule)
        assert np.isfinite(a).all()


class TestEndToEnd:
    def test_build_digit_dataset(self, digit_corpus, tmp_path):
        splits = build_dataset(
            digit_corpus, "digit", out_dir=tmp_path / "art", seed=0, backend="xla"
        )
        assert splits.train_data.shape == (10, 880)  # 70% of 15 files
        assert splits.dev_data.shape == (3, 880)
        assert splits.test_data.shape == (1, 880)
        assert np.isfinite(splits.train_data).all()
        # artifacts written
        s2 = load_artifacts(tmp_path / "art")
        np.testing.assert_allclose(s2.train_data, splits.train_data)
        # sanity: a 300-600 Hz tone has strong energy in low MFCCs
        assert np.abs(splits.train_data).max() > 10

    def test_build_speaker_dataset(self, tmp_path, rng):
        sr = 16000
        for spk in ("spk0", "spk1"):
            d = tmp_path / "rodigits" / spk
            d.mkdir(parents=True)
            for i in range(5):
                y = 0.2 * rng.standard_normal(4 * sr)  # 4 s -> 2 usable windows
                audio_io.write_wav(d / f"{i}.wav", y.astype(np.float32), sr)
        splits = build_dataset(tmp_path / "rodigits", "speaker", seed=0, backend="xla")
        assert splits.train_data.shape[1] == 2020
        # 7 train files x exactly 2 usable windows (4 s minus boundary
        # seconds; resampling preserves duration)
        assert splits.train_data.shape[0] == 14
        assert len(splits.train_label) == len(splits.train_data)

    def test_sliced_featurizer_chunked_and_order_stable(self, tmp_path, rng,
                                                        monkeypatch):
        """The speaker featurizer must decode in bounded file chunks (not
        the whole corpus at once) and emit windows in the reference's
        file-then-window order regardless of chunking (VERDICT r1 item 8)."""
        from asr_using_robust_nn_tpu.data import pipeline
        from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig

        sr = 16000
        cfg = FrontendConfig.speaker()
        files, labels = [], []
        durations = [3, 4, 5, 2, 6, 4, 3, 5, 4, 3, 7, 4]  # ragged windows
        for i, secs in enumerate(durations):
            p = tmp_path / f"r{i}.wav"
            audio_io.write_wav(
                p, (0.2 * rng.standard_normal(secs * sr)).astype(np.float32),
                sr)
            files.append(str(p))
            labels.append(i % 3)

        call_sizes = []
        real = pipeline.native.decode_resample_batch

        def spy(names, target_sr):
            call_sizes.append(len(names))
            return real(names, target_sr)

        monkeypatch.setattr(pipeline.native, "decode_resample_batch", spy)
        feats, out_labels = pipeline.featurize_sliced_files(
            files, labels, cfg, batch_size=8, backend="xla", file_chunk=3)
        assert max(call_sizes) <= 3 and len(call_sizes) == 4
        # oracle: per-file slice + per-window featurize, original order
        want_feats, want_labels = [], []
        from asr_using_robust_nn_tpu.frontend.mfcc import Frontend

        fe = Frontend(cfg, backend="xla")
        for f, lab in zip(files, labels):
            w, _ = audio_io.load_audio(f, target_sr=cfg.sr)
            wins = pipeline.slice_seconds(w, cfg.sr)
            for win in wins:
                want_feats.append(
                    np.asarray(fe(win[None, :])).reshape(-1))
                want_labels.append(lab)
        np.testing.assert_array_equal(out_labels, want_labels)
        np.testing.assert_allclose(feats, np.stack(want_feats), atol=2e-4)


class TestDeviceResample:
    def test_device_resampler_matches_host(self, rng):
        from asr_using_robust_nn_tpu.ops.resample import resample_batch_device
        from asr_using_robust_nn_tpu.utils import audio_io

        x = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
        want = np.stack([audio_io.resample(xi, 16000, 22050) for xi in x])
        got = np.asarray(resample_batch_device(x, 16000, 22050))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_featurize_device_resample_matches_host_path(self, digit_corpus):
        from asr_using_robust_nn_tpu.data.pipeline import featurize_files
        from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig

        files, _, _ = walk_corpus(digit_corpus, DIGIT_WORDS)
        cfg = FrontendConfig.digit()
        host = featurize_files(files, cfg, backend="xla")
        dev = featurize_files(files, cfg, backend="xla", device_resample=True)
        np.testing.assert_allclose(dev, host, atol=5e-3, rtol=1e-3)

