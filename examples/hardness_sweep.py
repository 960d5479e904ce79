"""Exploration harness for the thesis-crossover regime.

Grids over corpus hardness (formant jitter/gap ratio, noise floor, label
noise, corpus size) and constraint strength rho, trains BOTH digit recipes
on each cell, and records clean accuracy + FGSM / white-noise robustness
curves as JSON lines. Used to locate the regime where the constrained
model dominates under attack (VERDICT round-1 item 2); winning cells feed
the full studies (`examples/robustness_study_synthetic.py` for the digit
pairing, `examples/robustness_study_speaker.py` for the speaker pairing —
the archived grids live in `docs/results_synthetic/hardness/`).

    python examples/hardness_sweep.py --out /tmp/hardness/results.jsonl
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.hard_corpus import (
    flip_labels,
    make_hard_corpus,
    make_speaker_corpus,
)

from asr_using_robust_nn_tpu.attacks import whitebox
from asr_using_robust_nn_tpu.attacks.sweeps import accuracy
from asr_using_robust_nn_tpu.constraints import (
    get_lipschitz_constrained,
    make_simple_norm_constraint,
)
from asr_using_robust_nn_tpu.data import build_dataset, standardize_fit_all
from asr_using_robust_nn_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer


def train_recipe(cfg, con, tr, ytr, dv, ydv, epochs, patience, batch, seed):
    kw = {}
    if con is not None:
        import jax

        p0, _ = init_mlp(cfg, jax.random.PRNGKey(seed))
        kw = dict(constraint=con.apply, constraint_state=con.init(p0))
    trainer = Trainer(
        cfg,
        TrainConfig(batch_size=batch, epochs=epochs, patience=patience,
                    seed=seed, device_resident=True, epochs_per_dispatch=25),
        **kw,
    )
    res = trainer.fit(tr, ytr, dv, ydv)
    return trainer, res["best_params"], res["best_state"]


_SPLITS_CACHE: dict = {}


def _cached_splits(task, hard_kw, seed):
    """Corpus generation + featurization depend only on (task, hard_kw,
    seed) — the rho and label-noise axes of the sweep reuse them (the
    default digit grid re-visited each corpus 3x for nothing, tripling the
    non-training cost of every sweep; round-3 review)."""
    key = (task, tuple(sorted(hard_kw.items())), seed)
    if key not in _SPLITS_CACHE:
        root = tempfile.mkdtemp(prefix="hard_")
        try:
            corpus = (make_hard_corpus(root, seed=seed, **hard_kw)
                      if task == "digit"
                      else make_speaker_corpus(root, seed=seed, **hard_kw))
            _SPLITS_CACHE[key] = build_dataset(corpus, task, seed=seed)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return _SPLITS_CACHE[key]


def eval_cell(hard_kw, label_noise, rho, epochs_u, epochs_c, seed,
              fgsm_eps, noise_sigmas, task="digit"):
    import jax
    import jax.numpy as jnp

    if task == "digit":
        n_classes = 10
        # BN + dropout(0.4) everywhere: the reference's digit pairing
        # regularizes BOTH recipes (`VD/train_no_constraints.py:52-75`)
        recipes = [
            ("unconstrained", MLPConfig.digit_unconstrained(), None,
             epochs_u, 256),
            ("constrained", MLPConfig.digit_constrained(),
             make_simple_norm_constraint(rho, n_iter=8), epochs_c, 512),
        ]
    else:
        n_classes = hard_kw.get("n_speakers", 20)
        # the reference's speaker pairing: a completely UNREGULARIZED
        # plain MLP (`SR/train_no_constraints.py:52-75` — no BN, no
        # dropout) vs NonNeg+BN+simple_norm rho
        # (`SR/train_constraints.py:41,97-105`, rho=1).
        ucfg = MLPConfig.speaker_unconstrained()
        ccfg = MLPConfig.speaker_constrained()
        if n_classes != 20:
            ucfg = dataclasses.replace(ucfg, n_classes=n_classes)
            ccfg = dataclasses.replace(ccfg, n_classes=n_classes)
        recipes = [
            ("unconstrained", ucfg, None, epochs_u, 64),
            ("constrained", ccfg,
             make_simple_norm_constraint(rho, n_iter=8), epochs_c, 64),
        ]
    splits = _cached_splits(task, hard_kw, seed)
    tr, dv, te, mean, scale = standardize_fit_all(
        splits.train_data, splits.dev_data, splits.test_data
    )
    ytr = flip_labels(splits.train_label, label_noise, n_classes, seed)
    ydv = flip_labels(splits.dev_label, label_noise, n_classes, seed + 7)
    yte = splits.test_label  # test labels stay clean

    out = {"task": task, "hard": hard_kw, "label_noise": label_noise,
           "rho": rho, "n_train": int(len(tr)), "models": {}}
    # patience == epochs: never stop early (the interpolation regime is
    # the point — reference patience is 200-6000 of 10000 anyway); the
    # best-on-dev checkpoint is still what gets evaluated, same as the
    # reference's ModelCheckpoint(save_best_only=True).
    for name, cfg, con, n_ep, batch in recipes:
        pat = n_ep
        t0 = time.time()
        trainer, params, state = train_recipe(
            cfg, con, tr, ytr, dv, ydv, n_ep, pat, batch, seed
        )
        _, clean = trainer.evaluate(params, state, te, yte)
        _, fit = trainer.evaluate(params, state, tr, ytr)  # interpolation?
        lip = float(get_lipschitz_constrained(cfg, params, state))

        def logits_fn(x, cfg=cfg, params=params, state=state):
            return apply_mlp(cfg, params, state, x, train=False)[0]

        def predict(x, lf=logits_fn):
            return np.asarray(jax.nn.softmax(lf(jnp.asarray(
                x, jnp.float32)), -1))

        xte = jnp.asarray(te, jnp.float32)
        y_att = jnp.argmax(logits_fn(xte), -1).astype(jnp.int32)
        fgsm_acc = []
        for eps in fgsm_eps:
            adv = np.asarray(whitebox.fgsm(logits_fn, xte, y_att,
                                           float(eps)))
            fgsm_acc.append(accuracy(predict(adv), yte))
        noise_acc = []
        key = jax.random.PRNGKey(seed)
        for i, sg in enumerate(noise_sigmas):
            pert = te + float(sg) * np.asarray(jax.random.normal(
                jax.random.fold_in(key, i), te.shape))
            noise_acc.append(accuracy(predict(pert), yte))
        # margin: logit(true) - max other logit on clean test rows
        lg = np.asarray(logits_fn(xte))
        true_lg = lg[np.arange(len(yte)), yte]
        lg2 = lg.copy()
        lg2[np.arange(len(yte)), yte] = -np.inf
        margins = true_lg - lg2.max(1)
        out["models"][name] = {
            "clean": float(clean), "train_fit": float(fit),
            "lipschitz": lip,
            "median_margin": float(np.median(margins)),
            "fgsm": fgsm_acc, "noise": noise_acc,
            "train_s": round(time.time() - t0, 1),
        }
    u, c = out["models"]["unconstrained"], out["models"]["constrained"]
    out["crossover"] = {
        "clean_gap": round(c["clean"] - u["clean"], 4),
        "fgsm_c_minus_u": [round(a - b, 4) for a, b in
                           zip(c["fgsm"], u["fgsm"])],
        "noise_c_minus_u": [round(a - b, 4) for a, b in
                            zip(c["noise"], u["noise"])],
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hardness/results.jsonl")
    ap.add_argument("--task", default="digit", choices=["digit", "speaker"])
    ap.add_argument("--epochs-u", type=int, default=800)
    ap.add_argument("--epochs-c", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cells", default=None,
                    help="JSON list of cell dicts (or @file); "
                         "default = built-in grid")
    args = ap.parse_args()
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)

    fgsm_eps = [0.05, 0.1, 0.2, 0.4, 0.8]
    noise_sigmas = [1.0, 2.0, 4.0, 8.0]

    if args.cells:
        if args.cells.startswith("@"):
            with open(args.cells[1:]) as fh:
                cells = json.load(fh)
        else:
            cells = json.loads(args.cells)
    elif args.task == "speaker":
        cells = []
        for noise_hi, fj in [(0.12, 0.04), (0.2, 0.06), (0.3, 0.08)]:
            cells.append(dict(
                hard=dict(n_speakers=20, recordings=30, noise_hi=noise_hi,
                          formant_jitter=fj, sr=22050),
                label_noise=0.0, rho=1.0,
            ))
    else:
        cells = []
        for jr, nf, ln in [
            (0.7, 0.18, 0.0),
            (0.7, 0.18, 0.15),
            (1.0, 0.22, 0.15),
            (1.0, 0.22, 0.25),
        ]:
            for rho in (0.05, 0.1, 0.3):
                cells.append(dict(
                    hard=dict(f1_gap=25.0, f1_jitter=25.0 * jr,
                              f2_gap=45.0, f2_jitter=45.0 * jr,
                              noise_floor=nf, files_per_class=40),
                    label_noise=ln, rho=rho,
                ))

    import jax

    print("backend:", jax.default_backend(), "cells:", len(cells))
    with open(args.out, "a") as f:
        for i, cell in enumerate(cells):
            t0 = time.time()
            r = eval_cell(cell["hard"], cell["label_noise"], cell["rho"],
                          args.epochs_u, args.epochs_c, args.seed,
                          fgsm_eps, noise_sigmas,
                          task=cell.get("task", args.task))
            r["cell"] = i
            f.write(json.dumps(r) + "\n")
            f.flush()
            c = r["crossover"]
            print(f"[{i+1}/{len(cells)}] {time.time()-t0:.0f}s "
                  f"ln={cell['label_noise']} rho={cell['rho']} "
                  f"clean_gap={c['clean_gap']} "
                  f"fgsm_delta={c['fgsm_c_minus_u']}")


if __name__ == "__main__":
    main()
