"""Measure the reference pipeline's CPU cost -> baselines/reference_cpu.json.

The reference (fmazilu/ASR-using-robust-NN) publishes no numbers
(BASELINE.md), so the baseline is measured here by reconstructing its exact
computational recipe on CPU:

  frontend  sequential per-file librosa-semantics MFCC (our numpy oracle,
            which vectorizes frames like librosa.stft does — fair or
            slightly generous to the reference)
  training  the digit constrained recipe: Keras 880->...->10 MLP with
            NonNeg constraints, batch 512, Adam+CCE, plus the
            simple_norm_constraint callback doing the per-batch host
            product + spectral norm + set_weights round trip
            (`Voice digit recogniton/Constraints.py:135-189`)
  fgsm      per-batch tf.GradientTape sign-gradient generation + predict
            (what ART's FastGradientMethod does under the hood)

Run:  python baselines/measure_reference_cpu.py  (takes a few minutes; TF on
CPU). bench.py reads the JSON to compute vs_baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_frontend(n_files: int = 64) -> float:
    from asr_using_robust_nn_tpu.ops.frontend_ref import mfcc_fixed_length_ref

    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(22050).astype(np.float32) * 0.1
             for _ in range(n_files)]
    mfcc_fixed_length_ref(waves[0], 44)  # warm caches
    t0 = time.perf_counter()
    for w in waves:
        mfcc_fixed_length_ref(w, 44)
    dt = (time.perf_counter() - t0) / n_files
    return 1.0 / dt  # utterances/sec


def measure_training(n_batches: int = 4, batch: int = 512) -> float:
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf
    from tensorflow.keras.callbacks import Callback
    from tensorflow.keras.constraints import NonNeg
    from tensorflow.keras.layers import BatchNormalization, Dense, Dropout, Input
    from tensorflow.keras.models import Model

    eps = np.spacing(1)

    class SimpleNormConstraint(Callback):
        """The reference's per-batch host projection
        (`Voice digit recogniton/Constraints.py:135-189`)."""

        def __init__(self, rho):
            super().__init__()
            self.rho = rho

        def on_batch_end(self, batch, logs=None):
            dense = [l for l in self.model.layers if "dense" in l.name]
            w_list = [l.get_weights()[0] for l in dense]
            cst = None
            for w in reversed(w_list):
                cst = w.T if cst is None else cst @ w.T
            factor = (self.rho / (np.linalg.norm(cst, ord=2) + eps)) ** (
                1 / len(w_list)
            )
            for l in dense:
                w, b = l.get_weights()
                l.set_weights([w * factor, b])

    inp = Input((880,))
    h = inp
    for i, (units, drop) in enumerate(
        zip((1024, 512, 256, 128, 64), (0.1, 0.1, 0.1, 0.0, 0.0))
    ):
        h = Dense(units, activation="relu", kernel_constraint=NonNeg())(h)
        h = BatchNormalization()(h)
        if drop:
            h = Dropout(drop)(h)
    out = Dense(10, activation="softmax", kernel_constraint=NonNeg())(h)
    model = Model(inp, out)
    model.compile(optimizer="adam", loss="categorical_crossentropy")

    rng = np.random.default_rng(0)
    n = n_batches * batch
    x = rng.standard_normal((n, 880)).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.integers(0, 10, n)]
    # warmup epoch (1 batch) to compile the graph
    model.fit(x[:batch], y[:batch], batch_size=batch, epochs=1, verbose=0,
              callbacks=[SimpleNormConstraint(0.1)])
    t0 = time.perf_counter()
    model.fit(x, y, batch_size=batch, epochs=1, verbose=0, shuffle=False,
              callbacks=[SimpleNormConstraint(0.1)])
    dt = time.perf_counter() - t0
    return n / dt  # utterances/sec


def measure_fgsm(n_batches: int = 4, batch: int = 512) -> float:
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf
    from tensorflow.keras.layers import Dense, Input
    from tensorflow.keras.losses import CategoricalCrossentropy
    from tensorflow.keras.models import Model

    inp = Input((880,))
    h = inp
    for units in (1024, 512, 256, 128, 64):
        h = Dense(units, activation="relu")(h)
    out = Dense(10, activation="softmax")(h)
    model = Model(inp, out)
    loss_obj = CategoricalCrossentropy()

    rng = np.random.default_rng(0)
    x = tf.constant(rng.standard_normal((batch, 880)).astype(np.float32))
    y = tf.constant(np.eye(10, dtype=np.float32)[rng.integers(0, 10, batch)])

    @tf.function
    def fgsm_batch(x, y):
        with tf.GradientTape() as tape:
            tape.watch(x)
            loss = loss_obj(y, model(x))
        g = tape.gradient(loss, x)
        adv = x + 0.1 * tf.sign(g)
        return model(adv)

    fgsm_batch(x, y)  # compile
    t0 = time.perf_counter()
    for _ in range(n_batches):
        fgsm_batch(x, y)
    dt = time.perf_counter() - t0
    return n_batches * batch / dt


def main():
    frontend = measure_frontend()
    training = measure_training()
    fgsm = measure_fgsm()
    per_utt = 1 / frontend + 1 / training + 1 / fgsm
    out = {
        "frontend_utts_per_s": round(frontend, 2),
        "train_utts_per_s": round(training, 2),
        "fgsm_utts_per_s": round(fgsm, 2),
        "pipeline_utts_per_s": round(1.0 / per_utt, 2),
        "machine": os.uname().machine,
        "note": "reference recipe reconstructed on CPU: sequential "
                "librosa-equivalent MFCC; Keras constrained fit with "
                "per-batch host SVD callback; tf.GradientTape FGSM",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "reference_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
