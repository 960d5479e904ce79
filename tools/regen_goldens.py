"""Regenerate external-library golden fixtures — run this THE FIRST TIME
an environment actually has `librosa` / `art` installed (VERDICT r3
item 7; neither is importable in the build image, verified below and
recorded in baselines/golden_regen_status.json).

What the framework's parity chain currently rests on (docs/PARITY.md):

- frontend: a builder-written f64 librosa-semantics oracle
  (`asr_using_robust_nn_tpu/ops/frontend_ref.py`; constants scipy-tested;
  fixtures frozen at round 1 in tests/golden_mfcc.npz). No sample has
  passed through REAL librosa (`Voice digit recogniton/
  extract_features_construct_dataset.py:30` is the reference call).
- white-box attacks: trajectory-semantics parity vs ART's published
  algorithm (`Voice digit recogniton/attacks.py:493-693`), not vs an ART
  run.

This script closes both the first time it CAN:

  python tools/regen_goldens.py            # regenerates what's possible
  python tools/regen_goldens.py --check    # diff-only, never writes

1. `librosa` present -> recompute the digit (sr=22050 defaults) and
   speaker (n_fft=441, hop=220, win=441) MFCCs of the three frozen input
   waves with REAL librosa, print max|diff| vs the stored oracle outputs,
   and (unless --check) rewrite tests/golden_mfcc.npz from librosa truth.
   The `in_*` waves themselves are NEVER regenerated — they are the
   stable fixture identity.
2. `art` (+ TF) present -> record an ART fixture tests/golden_art.npz:
   a small seeded Keras model's weights, a fixed input batch, and the
   FGSM / PGD / CarliniL2 adversarial outputs with their exact attack
   parameters — tests/test_attacks.py::TestARTGolden picks it up
   automatically (skipped while the file is absent).
3. One more documented Speech Commands fetch attempt (the corpus is the
   open half of the accuracy north star; gitignored upstream, LFS stubs,
   zero egress here). Result recorded either way.

Every step's status lands in baselines/golden_regen_status.json so the
blocked state is an artifact, not an assertion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD_MFCC = os.path.join(ROOT, "tests", "golden_mfcc.npz")
GOLD_ART = os.path.join(ROOT, "tests", "golden_art.npz")
STATUS = os.path.join(ROOT, "baselines", "golden_regen_status.json")

SC_URL = ("http://download.tensorflow.org/data/"
          "speech_commands_v0.02.tar.gz")


def regen_librosa(check_only: bool) -> dict:
    try:
        import librosa
    except ImportError as e:
        return {"status": "blocked", "reason": f"librosa not importable: {e}"}

    gold = dict(np.load(GOLD_MFCC))
    names = ["chirp", "tone_noise", "impulses"]
    diffs = {}
    for n in names:
        w = gold[f"in_{n}"].astype(np.float32)
        # digit task: librosa.feature.mfcc(y, sr) defaults — the exact
        # reference call (`VD/extract_features_construct_dataset.py:30`)
        d = librosa.feature.mfcc(y=w, sr=22050)[:, :44]
        # speaker overrides (`SR/extract_features_construct_dataset.py:
        # 225-228`)
        s = librosa.feature.mfcc(y=w, sr=22050, n_fft=441,
                                 hop_length=220, win_length=441)[:, :101]
        diffs[n] = {
            "digit_max_abs_diff": float(
                np.max(np.abs(d - gold[f"digit_{n}"][:, : d.shape[1]]))),
            "speaker_max_abs_diff": float(
                np.max(np.abs(s - gold[f"speaker_{n}"][:, : s.shape[1]]))),
        }
        if not check_only:
            gold[f"digit_{n}"] = np.pad(
                d, ((0, 0), (0, 44 - d.shape[1]))).astype(np.float64)
            gold[f"speaker_{n}"] = np.pad(
                s, ((0, 0), (0, 101 - s.shape[1]))).astype(np.float64)
    if not check_only:
        fb = librosa.filters.mel(sr=22050, n_fft=2048, n_mels=128)
        gold["mel_fb_digit_sum"] = fb.sum(axis=1).astype(np.float64)
        import scipy.fftpack

        gold["dct_row0"] = scipy.fftpack.dct(
            np.eye(128), type=2, norm="ortho")[:, 0].astype(np.float64)
        np.savez(GOLD_MFCC, **gold)
    return {"status": "checked" if check_only else "regenerated",
            "librosa_version": librosa.__version__, "diffs_vs_oracle": diffs}


def regen_art(check_only: bool) -> dict:
    try:
        import tensorflow as tf
        from art.attacks.evasion import (
            CarliniL2Method,
            FastGradientMethod,
            ProjectedGradientDescent,
        )
        from art.estimators.classification import TensorFlowV2Classifier
    except ImportError as e:
        return {"status": "blocked", "reason": f"art not importable: {e}"}

    tf.keras.utils.set_random_seed(0)
    n_in, n_cls = 32, 6
    model = tf.keras.Sequential([
        tf.keras.layers.Dense(48, activation="relu",
                              input_shape=(n_in,)),
        tf.keras.layers.Dense(24, activation="relu"),
        tf.keras.layers.Dense(n_cls),
    ])
    loss = tf.keras.losses.CategoricalCrossentropy(from_logits=True)
    clf = TensorFlowV2Classifier(model=model, nb_classes=n_cls,
                                 input_shape=(n_in,), loss_object=loss)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, n_in)).astype(np.float32)
    y = rng.integers(0, n_cls, 16).astype(np.int64)
    fgsm_eps, pgd_eps, pgd_step, pgd_iter = 0.25, 0.25, 0.1, 100
    cw_conf, cw_lr, cw_bsteps, cw_iter = 1.0, 0.01, 10, 10
    adv_fgsm = FastGradientMethod(clf, eps=fgsm_eps).generate(x=x)
    adv_pgd = ProjectedGradientDescent(
        clf, eps=pgd_eps, eps_step=pgd_step, max_iter=pgd_iter,
        num_random_init=0).generate(x=x)
    adv_cw = CarliniL2Method(
        clf, confidence=cw_conf, learning_rate=cw_lr,
        binary_search_steps=cw_bsteps, max_iter=cw_iter).generate(x=x)
    if not check_only:
        payload = {"x": x, "y": y,
                   "adv_fgsm": adv_fgsm, "adv_pgd": adv_pgd,
                   "adv_cw": adv_cw,
                   "params": np.asarray(
                       [fgsm_eps, pgd_eps, pgd_step, pgd_iter,
                        cw_conf, cw_lr, cw_bsteps, cw_iter], np.float64)}
        for i, wgt in enumerate(model.get_weights()):
            payload[f"w_{i}"] = wgt
        np.savez(GOLD_ART, **payload)
    return {"status": "checked" if check_only else "regenerated",
            "n_weights": len(model.get_weights())}


def fetch_speech_commands() -> dict:
    import urllib.request

    dest = os.path.join(ROOT, "data", "speech_commands_v0.02.tar.gz")
    try:
        req = urllib.request.Request(SC_URL, method="HEAD")
        with urllib.request.urlopen(req, timeout=20) as r:
            size = r.headers.get("Content-Length")
        return {"status": "reachable", "url": SC_URL,
                "content_length": size,
                "note": f"run urllib.request.urlretrieve to {dest}"}
    except Exception as e:
        return {"status": "blocked", "url": SC_URL,
                "reason": f"{type(e).__name__}: {e}"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="diff against current fixtures, never write")
    args = ap.parse_args()
    status = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "check_only": args.check,
        "librosa_goldens": regen_librosa(args.check),
        "art_fixture": regen_art(args.check),
        "speech_commands": fetch_speech_commands(),
    }
    os.makedirs(os.path.dirname(STATUS), exist_ok=True)
    with open(STATUS, "w") as f:
        json.dump(status, f, indent=1)
    print(json.dumps(status, indent=1))
    blocked = [k for k, v in status.items()
               if isinstance(v, dict) and v.get("status") == "blocked"]
    print(f"\nblocked: {blocked or 'none'} (recorded in {STATUS})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
