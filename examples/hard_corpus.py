"""Hard synthetic digit corpus: controllable class overlap + label noise.

The round-1 study (`examples/robustness_study_synthetic.py`) showed the
apparatus works but the easy formant-tone corpus lets the unconstrained
recipe buy margins that dominate its larger Lipschitz constant, inverting
the thesis ordering (docs/results_synthetic/README.md, honest negative).

This generator makes the regime where the Lipschitz bound binds: formant
gaps between classes shrink toward the per-utterance formant jitter
(classes overlap spectrally), the noise floor rises, and a fraction of
TRAIN/DEV labels is flipped (test labels stay clean). With small margins
and label noise, the unconstrained net grows weights to carve a fragmented
boundary through the noise; the constrained net cannot, and its smoother
boundary should degrade more gracefully under attack — the thesis's
acceptance criterion (`Voice digit recogniton/attacks.py:359-366`).
"""

from __future__ import annotations

import os

import numpy as np

from asr_using_robust_nn_tpu.utils import audio_io

WORDS = ["zero", "one", "two", "three", "four",
         "five", "six", "seven", "eight", "nine"]


def make_hard_corpus(
    root: str,
    n_classes: int = 10,
    files_per_class: int = 40,
    f1_gap: float = 25.0,
    f1_jitter: float = 18.0,
    f2_gap: float = 45.0,
    f2_jitter: float = 30.0,
    noise_floor: float = 0.18,
    seed: int = 0,
    sr: int = 16000,
) -> str:
    """Write a <root>/data/<word>/*.wav corpus (digit-task layout,
    `Voice digit recogniton/extract_features_construct_dataset.py:21-37`).

    Class wi lives at f1 = 300 + f1_gap*wi, f2 = 950 + f2_gap*(wi%5) +
    220*(wi//5); each utterance jitters both formants by N(0, jitter) —
    when jitter ~ gap, neighboring classes overlap and the Bayes margin is
    genuinely small.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(sr) / sr
    for wi, w in enumerate(WORDS[:n_classes]):
        d = os.path.join(root, "data", w)
        os.makedirs(d, exist_ok=True)
        f1c = 300.0 + f1_gap * wi
        f2c = 950.0 + f2_gap * (wi % 5) + 220.0 * (wi // 5)
        for i in range(files_per_class):
            f1 = f1c + rng.normal(0, f1_jitter)
            f2 = f2c + rng.normal(0, f2_jitter)
            pitch = rng.uniform(0.92, 1.1)
            env = np.minimum(1.0, 8 * t) * np.minimum(1.0, 8 * (1 - t))
            y = 0.45 * np.sin(2 * np.pi * f1 * pitch * t)
            y += 0.3 * np.sin(2 * np.pi * f2 * pitch * t)
            y += 0.12 * np.sin(2 * np.pi * 2 * f1 * pitch * t)
            y = y * env + noise_floor * rng.standard_normal(sr)
            y *= rng.uniform(0.55, 1.0)
            audio_io.write_wav(os.path.join(d, f"{i}.wav"),
                               y.astype(np.float32), sr)
    return os.path.join(root, "data")


def flip_labels(labels: np.ndarray, frac: float, n_classes: int,
                seed: int = 0) -> np.ndarray:
    """Flip `frac` of labels to a uniformly-drawn WRONG class."""
    if frac <= 0:
        return labels
    rng = np.random.default_rng(seed + 1)
    labels = labels.copy()
    idx = rng.random(len(labels)) < frac
    shift = rng.integers(1, n_classes, idx.sum())
    labels[idx] = (labels[idx] + shift) % n_classes
    return labels
