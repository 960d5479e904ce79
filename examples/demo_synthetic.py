"""Self-contained demo on synthetic audio — no corpora needed.

Builds a tiny on-disk Speech-Commands-style corpus of synthetic tones,
runs the ENTIRE pipeline through the library API (decode -> fused TPU MFCC
-> constrained/unconstrained training -> Lipschitz monitoring -> black-box
and white-box robustness sweeps) and prints the comparison table the
reference produces with matplotlib (`Voice digit recogniton/attacks.py`).

    python examples/demo_synthetic.py [--workdir DIR]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asr_using_robust_nn_tpu.attacks.sweeps import blackbox_sweep, whitebox_sweep
from asr_using_robust_nn_tpu.constraints import (
    get_lipschitz_constrained,
    make_simple_norm_constraint,
)
from asr_using_robust_nn_tpu.data import build_dataset, standardize_fit_all
from asr_using_robust_nn_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer
from asr_using_robust_nn_tpu.utils import audio_io


def make_corpus(root, n_classes=4, files_per_class=20, seed=0):
    rng = np.random.default_rng(seed)
    sr = 16000
    words = ["zero", "one", "two", "three"][:n_classes]
    for wi, w in enumerate(words):
        d = os.path.join(root, "data", w)
        os.makedirs(d, exist_ok=True)
        for i in range(files_per_class):
            t = np.arange(sr) / sr
            f0 = 220 + 170 * wi + rng.normal(0, 8)
            y = 0.4 * np.sin(2 * np.pi * f0 * t * (1 + 0.1 * t))
            y += 0.05 * rng.standard_normal(sr)
            audio_io.write_wav(os.path.join(d, f"{i}.wav"),
                               y.astype(np.float32), sr)
    return os.path.join(root, "data")


def train_pair(splits, seed=0):
    tr, dv, te, mean, scale = standardize_fit_all(
        splits.train_data, splits.dev_data, splits.test_data
    )
    n_classes = int(splits.train_label.max()) + 1
    results = {}
    for name, nonneg, constraint in [
        ("unconstrained", False, None),
        ("constrained", True, make_simple_norm_constraint(0.5, n_iter=16)),
    ]:
        cfg = MLPConfig(in_dim=880, n_classes=n_classes, hidden=(128, 64),
                        dropout=(0.1, 0.0), nonneg=nonneg)
        kw = {}
        if constraint is not None:
            import jax

            p0, _ = init_mlp(cfg, jax.random.PRNGKey(seed))
            kw = dict(constraint=constraint.apply,
                      constraint_state=constraint.init(p0))
        trainer = Trainer(
            cfg, TrainConfig(batch_size=16, epochs=60, patience=60, seed=seed),
            **kw,
        )
        res = trainer.fit(tr, splits.train_label, dv, splits.dev_label)
        loss, acc = trainer.evaluate(res["best_params"], res["best_state"],
                                     te, splits.test_label)
        lip = float(get_lipschitz_constrained(cfg, res["best_params"],
                                              res["best_state"]))
        print(f"{name}: clean test acc {acc:.3f}, Lipschitz {lip:.3f}")
        results[name] = (cfg, res["best_params"], res["best_state"], trainer)
    return results, (tr, dv, te, mean, scale)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    root = args.workdir or tempfile.mkdtemp(prefix="asrtpu_demo_")
    print("workdir:", root)

    corpus = make_corpus(root)
    splits = build_dataset(corpus, "digit", seed=0)
    results, (tr, dv, te, mean, scale) = train_pair(splits)

    import jax
    import jax.numpy as jnp

    def make_fns(name):
        cfg, params, state, trainer = results[name]

        def logits(x):
            return apply_mlp(cfg, params, state, x, train=False)[0]

        def predict(x):
            return np.asarray(
                jax.nn.softmax(logits(jnp.asarray(x, jnp.float32)), -1)
            )

        return logits, predict

    lc, pc = make_fns("constrained")
    lu, pu = make_fns("unconstrained")

    print("\nwhite noise on MFCC (accuracy constrained vs unconstrained):")
    res = blackbox_sweep("white_mfcc", pc, pu, splits.test_label,
                         strengths=[0.0, 0.5, 1.0, 2.0], test_features=te)
    for s, a, b in zip(res.strengths, res.accuracy_constrained,
                       res.accuracy_unconstrained):
        print(f"  sigma={s:5.2f}: {a:.3f} vs {b:.3f}")

    print("\nFGSM (accuracy constrained vs unconstrained):")
    res = whitebox_sweep("fgsm", lc, lu, pc, pu, te, splits.test_label,
                         strengths=[0.05, 0.2, 0.5])
    for s, a, b in zip(res.strengths, res.accuracy_constrained,
                       res.accuracy_unconstrained):
        print(f"  eps={s:5.2f}: {a:.3f} vs {b:.3f}")
    print("\ndemo complete")


if __name__ == "__main__":
    main()
