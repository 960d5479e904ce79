"""The thesis's robustness claim, demonstrated on the SPEAKER pairing.

The reference's speaker task is the honest place to look for the
constrained-more-robust crossover (VERDICT round-1 item 2): it pairs a
completely UNREGULARIZED plain MLP (`Speaker recognition/
train_no_constraints.py:52-75` — no BatchNorm, no Dropout) against the
NonNeg+BN simple_norm(rho=1) recipe (`Speaker recognition/
train_constraints.py:41,97-105`), and its headline plots are
accuracy-vs-strength curves for the black-box noise families
(`Speaker recognition/attacks.py:319-419`: audio sigma 0-0.005, SNR 60->0,
mixture alpha 0-0.2, raw-MFCC sigma 0-100 with standardize-after-attack).

This script trains both recipes on the synthetic 20-voice corpus
(`examples/hard_corpus.make_speaker_corpus`) and runs exactly that sweep
matrix — audio-domain noise uses the reference's slice-after-noise order —
plus a feature-space FGSM sweep for the white-box contrast.

    python examples/robustness_study_speaker.py --out docs/results_speaker
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.hard_corpus import make_speaker_corpus

from asr_using_robust_nn_tpu.attacks.sweeps import (
    GRIDS,
    blackbox_sweep,
    whitebox_sweep,
)
from asr_using_robust_nn_tpu.constraints import (
    get_lipschitz_constrained,
    get_lipschitz_sound,
    get_norms,
    get_upper_lipschitz,
    make_simple_norm_constraint,
)
from asr_using_robust_nn_tpu.data import build_dataset, standardize_fit_all
from asr_using_robust_nn_tpu.models.mlp import MLPConfig, apply_mlp, init_mlp
from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig
from asr_using_robust_nn_tpu.train import TrainConfig, Trainer
from asr_using_robust_nn_tpu.utils import native


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results_speaker")
    ap.add_argument("--n-speakers", type=int, default=20)
    ap.add_argument("--recordings", type=int, default=30)
    ap.add_argument("--noise-hi", type=float, default=0.12)
    ap.add_argument("--formant-jitter", type=float, default=0.04)
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--constrained-epochs", type=int, default=2000)
    ap.add_argument("--rho", type=float, default=1.0,
                    help="reference value: SR/train_constraints.py rho=1")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    root = tempfile.mkdtemp(prefix="speaker_study_")
    t0 = time.time()
    corpus = make_speaker_corpus(
        root, n_speakers=args.n_speakers, recordings=args.recordings,
        noise_hi=args.noise_hi, formant_jitter=args.formant_jitter,
        seed=args.seed, sr=22050,
    )
    splits = build_dataset(corpus, "speaker", seed=args.seed)
    print(f"corpus+features: {time.time()-t0:.1f}s; "
          f"train {splits.train_data.shape} test {splits.test_data.shape}")
    tr, dv, te, mean, scale = standardize_fit_all(
        splits.train_data, splits.dev_data, splits.test_data
    )

    def std(feats):
        # the reference's standardize_dataset RE-FITS the scaler per sweep
        # point on [train; val; perturbed-test] (`SR/attacks.py:348,437-438`)
        # with RAW train/val in the standardize-after case — same protocol
        # as `asrtpu attack` (cli/main.py::cmd_attack)
        _, _, out, _, _ = standardize_fit_all(
            splits.train_data, splits.dev_data, feats
        )
        return out

    models = {}
    for name, cfg, con, n_ep in [
        ("unconstrained", MLPConfig.speaker_unconstrained(), None,
         args.epochs),
        ("constrained", MLPConfig.speaker_constrained(),
         make_simple_norm_constraint(args.rho, n_iter=8),
         args.constrained_epochs),
    ]:
        kw = {}
        if con is not None:
            p0, _ = init_mlp(cfg, jax.random.PRNGKey(args.seed))
            kw = dict(constraint=con.apply, constraint_state=con.init(p0))
        trainer = Trainer(
            cfg,
            TrainConfig(batch_size=64, epochs=n_ep, patience=n_ep,
                        seed=args.seed, device_resident=True,
                        epochs_per_dispatch=25),
            **kw,
        )
        t0 = time.time()
        res = trainer.fit(tr, splits.train_label, dv, splits.dev_label)
        _, acc = trainer.evaluate(res["best_params"], res["best_state"],
                                  te, splits.test_label)
        _, fit_acc = trainer.evaluate(res["best_params"], res["best_state"],
                                      tr, splits.train_label)
        p, s = res["best_params"], res["best_state"]
        lip_ref = float(get_lipschitz_constrained(cfg, p, s))
        lip_sound = float(get_lipschitz_sound(cfg, p, s))
        upper = float(get_upper_lipschitz(np.asarray(get_norms(p))))
        logits = np.asarray(apply_mlp(cfg, p, s,
                                      jnp.asarray(te, jnp.float32),
                                      train=False)[0])
        z_true = logits[np.arange(len(te)), splits.test_label]
        masked = logits.copy()
        masked[np.arange(len(te)), splits.test_label] = -np.inf
        margin = z_true - masked.max(axis=1)
        med_margin = float(np.median(margin))
        print(f"{name}: {time.time()-t0:.1f}s, clean {acc:.3f} "
              f"(train fit {fit_acc:.3f}), Lipschitz ref-formula {lip_ref:.3f}"
              f" / sound {lip_sound:.3f} (naive norms-product {upper:.2f}), "
              f"median margin {med_margin:.2f}")
        models[name] = dict(cfg=cfg, params=p, state=s,
                            clean_acc=float(acc), train_fit=float(fit_acc),
                            lipschitz_ref=lip_ref, lipschitz_sound=lip_sound,
                            norms_product=upper, median_margin=med_margin)

    def fns(name):
        m = models[name]

        def logits(x):
            return apply_mlp(m["cfg"], m["params"], m["state"], x,
                             train=False)[0]

        def predict(x):
            return np.asarray(
                jax.nn.softmax(logits(jnp.asarray(x, jnp.float32)), -1)
            )

        return logits, predict

    lc, pc = fns("constrained")
    lu, pu = fns("unconstrained")

    results = {
        "task": "speaker",
        "corpus": dict(n_speakers=args.n_speakers,
                       recordings=args.recordings, noise_hi=args.noise_hi,
                       formant_jitter=args.formant_jitter, seed=args.seed),
        "rho": args.rho,
        "clean": {k: models[k]["clean_acc"] for k in models},
        "train_fit": {k: models[k]["train_fit"] for k in models},
        "lipschitz_ref_formula": {k: models[k]["lipschitz_ref"]
                                  for k in models},
        "lipschitz_sound": {k: models[k]["lipschitz_sound"] for k in models},
        "norms_product": {k: models[k]["norms_product"] for k in models},
        "median_margin": {k: models[k]["median_margin"] for k in models},
        "curves": {},
    }

    fe_cfg = FrontendConfig.speaker()
    waves_list = native.decode_resample_batch(
        list(splits.test_filenames), fe_cfg.sr
    )
    audio_labels = splits.test_audio_label

    # the reference's speaker sweep matrix (SR/attacks.py:319-336)
    sweeps = [
        ("white_audio", dict(strengths=list(GRIDS["audio_sigmas_speaker"]))),
        ("snr_audio", dict(strengths=list(GRIDS["snrs_db_speaker"]))),
        ("mixture_audio",
         dict(strengths=list(GRIDS["audio_alphas_speaker"]))),
        ("white_mfcc", dict(strengths=list(GRIDS["mfcc_sigmas"]))),
        ("mixture_mfcc", dict(strengths=list(GRIDS["mfcc_alphas"]))),
        ("fgsm", dict(strengths=[0.02, 0.05, 0.1, 0.2, 0.4])),
    ]
    for atk, kw in sweeps:
        t0 = time.time()
        if atk.endswith("_audio"):
            # noise full recording -> slice 1-s windows -> MFCC -> std-after
            res = blackbox_sweep(
                atk, pc, pu, audio_labels, test_waves_list=waves_list,
                frontend_cfg=fe_cfg, standardize=std, seed=args.seed, **kw
            )
        elif atk.endswith("_mfcc"):
            # raw-unit sigmas on un-standardized MFCCs, standardize after
            # the attack (the reference's default 'A' branch)
            res = blackbox_sweep(
                atk, pc, pu, splits.test_label,
                test_features=splits.test_data, standardize=std,
                seed=args.seed, **kw
            )
        else:
            res = whitebox_sweep(atk, lc, lu, pc, pu, te,
                                 splits.test_label, seed=args.seed, **kw)
        results["curves"][atk] = res.as_dict()
        print(f"{atk} ({time.time()-t0:.1f}s):")
        for s, a, b in zip(res.strengths, res.accuracy_constrained,
                           res.accuracy_unconstrained):
            print(f"  {float(s):8.4f}: constrained {a:.3f}  "
                  f"unconstrained {b:.3f}")
        try:
            import matplotlib

            matplotlib.use("Agg")
            ax = res.plot()
            ax.figure.savefig(os.path.join(args.out, f"{atk}.png"), dpi=110)
        except Exception:
            pass

    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", os.path.join(args.out, "results.json"))


if __name__ == "__main__":
    main()
