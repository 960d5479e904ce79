"""Smoke tests for the study corpus generators (examples/hard_corpus.py).

These generators are load-bearing for the robustness studies
(docs/results_synthetic, docs/results_speaker); pin their corpus layout,
determinism, and the shortcut-feature spectral property so the studies
stay reproducible.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.hard_corpus import (  # noqa: E402
    flip_labels,
    make_hard_corpus,
    make_speaker_corpus,
)

from asr_using_robust_nn_tpu.utils import audio_io  # noqa: E402


class TestHardCorpus:
    def test_layout_and_determinism(self, tmp_path):
        d = make_hard_corpus(str(tmp_path / "a"), n_classes=3,
                             files_per_class=2, seed=5)
        words = sorted(os.listdir(d))
        assert words == ["one", "two", "zero"]
        assert all(len(os.listdir(os.path.join(d, w))) == 2 for w in words)
        d2 = make_hard_corpus(str(tmp_path / "b"), n_classes=3,
                              files_per_class=2, seed=5)
        y1, sr1 = audio_io.read_wav(os.path.join(d, "zero", "0.wav"))
        y2, sr2 = audio_io.read_wav(os.path.join(d2, "zero", "0.wav"))
        y1, y2 = np.asarray(y1).reshape(-1), np.asarray(y2).reshape(-1)
        assert sr1 == sr2 == 16000
        np.testing.assert_array_equal(y1, y2)

    def test_shortcut_bands_add_highband_energy(self, tmp_path):
        """shortcut_amp > 0 plants energy in 3.5-7 kHz that the clean
        corpus lacks — the non-robust-feature channel."""
        kw = dict(n_classes=2, files_per_class=1, seed=3, noise_floor=0.0)
        d0 = make_hard_corpus(str(tmp_path / "c"), shortcut_amp=0.0, **kw)
        d1 = make_hard_corpus(str(tmp_path / "s"), shortcut_amp=0.1, **kw)

        def band_power(path):
            y, sr = audio_io.read_wav(path)
            y = np.asarray(y, np.float64).reshape(-1)
            spec = np.abs(np.fft.rfft(y)) ** 2
            freqs = np.fft.rfftfreq(len(y), 1.0 / sr)
            return spec[(freqs >= 3500) & (freqs <= 7000)].sum()

        p0 = band_power(os.path.join(d0, "zero", "0.wav"))
        p1 = band_power(os.path.join(d1, "zero", "0.wav"))
        assert p1 > 100 * max(p0, 1e-12)


class TestSpeakerCorpus:
    def test_layout_shapes_and_rate(self, tmp_path):
        d = make_speaker_corpus(str(tmp_path / "spk"), n_speakers=3,
                                recordings=2, duration_s=3.0, seed=1,
                                sr=22050)
        dirs = sorted(os.listdir(d))
        assert dirs == ["speaker00", "speaker01", "speaker02"]
        y, sr = audio_io.read_wav(os.path.join(d, "speaker01", "0.wav"))
        y = np.asarray(y).reshape(-1)
        assert sr == 22050
        assert len(y) == int(3.0 * 22050)
        assert np.max(np.abs(np.asarray(y, np.float64))) <= 1.5
        # 3 s at 22050 -> exactly 1 window after boundary-second dropping
        from asr_using_robust_nn_tpu.data.pipeline import slice_seconds

        assert slice_seconds(y, 22050).shape == (1, 22050)


class TestFlipLabels:
    def test_fraction_and_wrongness(self):
        rng_labels = np.arange(1000) % 10
        flipped = flip_labels(rng_labels, 0.2, 10, seed=0)
        changed = flipped != rng_labels
        assert 150 <= changed.sum() <= 250
        assert np.all(flipped[changed] != rng_labels[changed])
        np.testing.assert_array_equal(flip_labels(rng_labels, 0.0, 10),
                                      rng_labels)
