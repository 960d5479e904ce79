"""Non-interactive CLI for the whole framework.

Replaces the reference's hard-coded constants + interactive `input()` prompts
(`Voice digit recogniton/attacks.py:325-333`, decision tree at `:2-12`;
variant selection by code comments, SURVEY.md §5 config) with explicit
subcommands:

  asrtpu prepare-data --task digit --data-dir data/ --out-dir processed/
  asrtpu train --task digit --variant constrained --data processed/ \
               --constraint simple --rho 0.1 --ckpt runs/digit_c
  asrtpu attack --type fgsm --data processed/ --constrained runs/digit_c \
                --unconstrained runs/digit_u --standardize before
  asrtpu dolphin --voice seven.wav --out attack.wav
  asrtpu bench

(entry point `asrtpu` via pyproject; also `python -m
asr_using_robust_nn_tpu.cli.main`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_prepare(sub):
    p = sub.add_parser("prepare-data", help="corpus -> .npy artifacts")
    p.add_argument("--task", choices=["digit", "speaker"], required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "fft", "int8", "hopdft",
                            "hopdft_int8", "pallas", "pallas_int8"])


def _add_train(sub):
    p = sub.add_parser("train", help="train a model variant")
    p.add_argument("--config", default=None,
                   help="JSON config (see configs/) providing defaults for "
                        "the flags below; explicit flags win")
    # merge-relevant flags default to None so `--config` values are only
    # overridden by EXPLICIT flags (a truthy argparse default would mask the
    # config); hard defaults resolve in cmd_train after the merge
    p.add_argument("--task", choices=["digit", "speaker"], required=False)
    p.add_argument("--variant", choices=["unconstrained", "constrained"],
                   default=None)
    p.add_argument("--data", required=True, help="artifact dir from prepare-data")
    p.add_argument("--ckpt", required=True, help="checkpoint dir")
    p.add_argument("--constraint",
                   choices=["simple", "norm", "fista", "custom", "none"],
                   default=None,
                   help="projection algorithm for --variant constrained "
                        "(reference known-good: simple)")
    p.add_argument("--rho", type=float, default=None,
                   help="Lipschitz target (defaults: digit 0.1, speaker 1.0 — "
                        "train_constraints.py:102)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stopping patience (reference per-script values "
                        "by default)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="train over all visible devices (1-D data mesh)")
    p.add_argument("--device-resident", action="store_true",
                   help="keep the whole split in HBM and run each epoch as "
                        "one fused XLA program (fastest on TPU; "
                        "train/epoch_scan.py)")
    p.add_argument("--epochs-per-dispatch", type=int, default=None,
                   help="device-resident only: fuse E epochs per XLA "
                        "dispatch (amortizes the host round-trip; history/"
                        "early-stop granularity coarsens to E)")
    p.add_argument("--epoch-backend", choices=["auto", "xla", "pallas"],
                   default="auto",
                   help="device-resident epoch implementation: 'pallas' = "
                        "the fused epoch-grid kernel (weights VMEM-resident "
                        "across every step, ~2x the XLA epoch on v5e, "
                        "parity-gated); 'auto' picks it on TPU when the "
                        "recipe is supported (default)")
    p.add_argument("--no-standardize", action="store_true")
    p.add_argument("--log-every", type=int, default=None)
    p.add_argument("--monitor-lipschitz", action="store_true")
    p.add_argument("--export-h5", default=None, help="also export weights to .h5")
    p.add_argument("--resume", action="store_true",
                   help="initialize from the best checkpoint already in --ckpt "
                        "(the reference's commented-out load_weights resume, "
                        "train_constraints.py:96)")
    p.add_argument("--metrics-dir", default=None,
                   help="write JSONL + TensorBoard scalars here (the "
                        "reference's TensorBoard callback equivalent)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: bf16 MXU matmuls with f32 master "
                        "weights/optimizer/BN (parity-gated <0.2%% clean-"
                        "accuracy delta; models/mlp.py MLPConfig.with_bf16)")


def _add_train_multi(sub):
    p = sub.add_parser(
        "train-multi",
        help="train a seed x rho grid as ONE fused XLA program "
             "(train/multi_run.py: the runs axis is vmapped, so R tiny "
             "models share each GEMM dispatch; the reference selects rho "
             "and re-runs by editing code — train_constraints.py:100-102)")
    p.add_argument("--task", choices=["digit", "speaker"], required=True)
    p.add_argument("--variant", choices=["unconstrained", "constrained"],
                   default="unconstrained")
    p.add_argument("--data", required=True, help="artifact dir from prepare-data")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint root; run r saves under "
                        "<ckpt>/run<r>_seed<s>[_rho<rho>]/")
    p.add_argument("--seeds", required=True,
                   help="comma-separated seed list, one training run each")
    p.add_argument("--rhos", default=None,
                   help="comma-separated Lipschitz targets; forms the full "
                        "seeds x rhos grid (constrained only)")
    p.add_argument("--constraint",
                   choices=["simple", "norm", "fista", "custom", "none"],
                   default="simple")
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs-per-dispatch", type=int, default=8,
                   help="epochs fused per dispatch (early-stop granularity)")
    p.add_argument("--epoch-backend", choices=["xla", "pallas"],
                   default="xla",
                   help="'pallas' = each run's epoch as one fused "
                        "epoch-grid kernel, runs scanned (single device, "
                        "fixed full simple_norm or unconstrained only; "
                        "dropout PRNG differs from xla, so keep one "
                        "backend across a merged study)")
    p.add_argument("--runs-mesh", action="store_true",
                   help="shard the runs axis across all visible devices "
                        "(ensemble parallelism: zero train-path collectives)")
    p.add_argument("--no-standardize", action="store_true")
    p.add_argument("--bf16", action="store_true")


def _add_attack(sub):
    p = sub.add_parser("attack", help="robustness sweep on a model pair")
    p.add_argument("--type", required=True, choices=[
        "white_mfcc", "mixture_mfcc", "white_audio", "mixture_audio",
        "snr_audio", "fgsm", "pgd", "jsma", "cw_l2", "cw_linf",
    ])
    p.add_argument("--task", choices=["digit", "speaker"], default="digit")
    p.add_argument("--data", required=True)
    p.add_argument("--constrained", required=True, help="ckpt dir or .h5")
    p.add_argument("--unconstrained", required=True, help="ckpt dir or .h5")
    p.add_argument("--standardize", choices=["before", "after"], default="before",
                   help="standardize data before or after the attack "
                        "(attacks.py:325)")
    p.add_argument("--strengths", default=None,
                   help="comma-separated override of the sweep grid")
    p.add_argument("--out", default=None, help="write curves JSON here")
    p.add_argument("--plot", default=None, help="write comparison plot PNG here")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-samples", type=int, default=None)


def _add_certify(sub):
    p = sub.add_parser(
        "certify",
        help="certified-accuracy curves from the sound Lipschitz bound "
             "(constraints/certify.py): a PROVABLE lower bound on accuracy "
             "under any attack in the norm ball — the guarantee-side twin "
             "of `attack`")
    p.add_argument("--task", choices=["digit", "speaker"], default="digit")
    p.add_argument("--data", required=True)
    p.add_argument("--constrained", required=True, help="ckpt dir or .h5")
    p.add_argument("--unconstrained", required=True, help="ckpt dir or .h5")
    p.add_argument("--norm", choices=["l2", "linf"], default="l2",
                   help="perturbation ball; linf uses the sqrt(d) "
                        "containment (matches the fgsm/pgd attack space)")
    p.add_argument("--strengths", default=None,
                   help="comma-separated eps grid (default: the fgsm "
                        "standardized grid for linf, 10 points to the "
                        "90th-percentile certified radius for l2)")
    p.add_argument("--out", default=None, help="write curves JSON here")
    p.add_argument("--plot", default=None, help="write comparison plot PNG")


def _add_dolphin(sub):
    p = sub.add_parser("dolphin", help="generate ultrasound attack WAV")
    p.add_argument("--voice", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--carrier-khz", type=float, default=30.0)


def _add_bench(sub):
    p = sub.add_parser("bench", help="run the benchmark (bench.py)")
    p.add_argument("--quick", action="store_true")


def _add_profile(sub):
    p = sub.add_parser("profile", help="capture a jax.profiler trace of the "
                                       "training hot path (view in "
                                       "TensorBoard's profile tab / Perfetto)")
    p.add_argument("--task", choices=["digit", "speaker"], default="digit")
    p.add_argument("--variant", choices=["unconstrained", "constrained"],
                   default="constrained")
    p.add_argument("--out", required=True, help="trace output directory")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=512)


def _add_infer(sub):
    p = sub.add_parser(
        "infer",
        help="classify WAV files end-to-end (decode -> fused MFCC -> "
             "standardize -> predict as one compiled program per padding "
             "bucket; serve/engine.py)")
    p.add_argument("--task", choices=["digit", "speaker"], default="digit")
    p.add_argument("--variant", choices=["unconstrained", "constrained"],
                   default="unconstrained")
    p.add_argument("--ckpt", required=True,
                   help="Orbax ckpt dir (train --ckpt) or Keras .h5")
    p.add_argument("--data", default=None,
                   help="prepare-data artifact dir, used to re-derive the "
                        "train-time scaler moments (required unless "
                        "--no-standardize)")
    p.add_argument("--no-standardize", action="store_true")
    p.add_argument("--audio", required=True, nargs="+",
                   help="WAV file(s) and/or directories of WAVs")
    p.add_argument("--agg", choices=["none", "vote", "mean"], default=None,
                   help="long-recording aggregation: slice into 1-s windows "
                        "(reference speaker protocol) and majority-vote or "
                        "mean-probability per file; default vote for "
                        "--task speaker, none for digit")
    p.add_argument("--backend", default="auto",
                   help="frontend kernel (frontend/mfcc.py; default auto)")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile every padding bucket and report warm "
                        "serving latency percentiles")
    p.add_argument("--buckets", default=None,
                   help="comma-separated ascending batch-padding ladder "
                        "(default 16,64,256,1024); each bucket compiles one "
                        "program")


def _add_eval(sub):
    p = sub.add_parser("evaluate", help="clean test eval + confusion matrix")
    p.add_argument("--task", choices=["digit", "speaker"], default="digit")
    p.add_argument("--data", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--variant", choices=["unconstrained", "constrained"],
                   default="unconstrained")
    p.add_argument("--no-standardize", action="store_true")
    p.add_argument("--plot", default=None,
                   help="write confusion-matrix heatmap PNG (the reference's "
                        "seaborn heatmap, train_google_dataset.py:94-99)")


def model_cfg_for(task: str, variant: str):
    from ..models.mlp import MLPConfig

    return {
        ("digit", "unconstrained"): MLPConfig.digit_unconstrained,
        ("digit", "constrained"): MLPConfig.digit_constrained,
        ("speaker", "unconstrained"): MLPConfig.speaker_unconstrained,
        ("speaker", "constrained"): MLPConfig.speaker_constrained,
    }[(task, variant)]()


def load_model(path, cfg):
    """Load params/state from an Orbax ckpt dir or a Keras-layout .h5."""
    from ..train.checkpoints import CheckpointManager, import_keras_h5

    if str(path).endswith(".h5"):
        if not os.path.exists(path):
            raise SystemExit(f"error: checkpoint file {path!r} not found")
        try:
            return import_keras_h5(path, cfg)
        except ValueError as e:  # variant/shape mismatch: same UX as Orbax
            raise SystemExit(f"error: {e}")
    if not os.path.exists(os.path.join(str(path), "best")):
        raise SystemExit(
            f"error: no checkpoint at {path!r} (expected an Orbax dir with "
            f"'best/' written by `asrtpu train --ckpt {path}` or a .h5 file)"
        )
    tree, _ = CheckpointManager(path).load_best()  # no example: raw restore
    from ..train.checkpoints import validate_model_tree

    try:
        validate_model_tree(tree["params"], tree["state"], cfg)
    except ValueError as e:
        raise SystemExit(f"error: {e}")
    return tree["params"], tree["state"]


def cmd_prepare(args):
    from ..data import build_dataset

    if not os.path.isdir(args.data_dir):
        print(f"error: --data-dir {args.data_dir!r} does not exist",
              file=sys.stderr)
        return 2
    # check the corpus yields files BEFORE build_dataset writes anything:
    # an empty run used to leave zero-row .npy artifacts in --out-dir that
    # pass cmd_train's exists-check and fail later with an opaque error
    from ..data.corpus import DIGIT_WORDS, walk_corpus

    class_names = DIGIT_WORDS if args.task == "digit" else None
    filenames, _, _ = walk_corpus(args.data_dir, class_names)
    if len(filenames) == 0:
        print(f"error: no audio found under {args.data_dir!r} "
              f"(expected <dir>/<class>/*.wav)", file=sys.stderr)
        return 2
    splits = build_dataset(args.data_dir, args.task, out_dir=args.out_dir,
                           seed=args.seed, backend=args.backend)
    print(json.dumps({
        "train": list(splits.train_data.shape),
        "dev": list(splits.dev_data.shape),
        "test": list(splits.test_data.shape),
        "out_dir": args.out_dir,
    }))


# Reference per-script defaults (SURVEY.md §2 rows 6, 11)
_REF_DEFAULTS = {
    ("digit", "unconstrained"): dict(batch=256, patience=200),
    ("digit", "constrained"): dict(batch=512, patience=6000),
    ("speaker", "unconstrained"): dict(batch=64, patience=10),
    ("speaker", "constrained"): dict(batch=64, patience=2000),
}
_REF_RHO = {"digit": 0.1, "speaker": 1.0}


_TRAIN_CONF_KEYS = {
    "task": ("digit", "speaker"),
    "variant": ("unconstrained", "constrained"),
    "constraint": ("simple", "norm", "fista", "custom", "none"),
    "rho": None, "epochs": None, "patience": None, "batch_size": None,
    "seed": None, "log_every": None, "data_parallel": None,
    "device_resident": None, "monitor_lipschitz": None,
    "no_standardize": None, "epochs_per_dispatch": None, "bf16": None,
    "epoch_backend": ("auto", "xla", "pallas"),
}


def cmd_train(args):
    if args.config:
        with open(args.config) as f:
            conf = {k.replace("-", "_"): v for k, v in json.load(f).items()
                    if not k.startswith("_")}
        unknown = set(conf) - set(_TRAIN_CONF_KEYS)
        if unknown:
            print(f"error: unknown config keys {sorted(unknown)} in "
                  f"{args.config!r} (known: {sorted(_TRAIN_CONF_KEYS)})",
                  file=sys.stderr)
            return 2
        for k, v in conf.items():
            allowed = _TRAIN_CONF_KEYS[k]
            if allowed is not None and v not in allowed:
                print(f"error: config {k}={v!r} not in {allowed}",
                      file=sys.stderr)
                return 2
            # explicit flags win; config fills None sentinels (and False
            # store_true flags, which a user cannot set to False explicitly).
            # Identity checks, not ==: 0 == False in Python, and an explicit
            # --seed 0 / --patience 0 must not be clobbered by the config.
            cur = getattr(args, k, None)
            if cur is None or cur is False:
                setattr(args, k, v)
    if not args.task:
        print("error: --task required (or provide it via --config)",
              file=sys.stderr)
        return 2
    # hard defaults for anything still unset
    if args.variant is None:
        args.variant = "unconstrained"
    if args.constraint is None:
        args.constraint = "simple"
    if args.epochs is None:
        args.epochs = 10000
    if args.seed is None:
        args.seed = 0
    if args.log_every is None:
        args.log_every = 1
    from ..constraints import (
        make_custom_constraint,
        make_fista_constraint,
        make_norm_constraint,
        make_simple_norm_constraint,
        lipschitz_monitor,
    )
    from ..data import load_artifacts, standardize_fit_all
    from ..models.mlp import init_mlp
    from ..train import TrainConfig, Trainer

    if not os.path.exists(os.path.join(args.data, "train_data.npy")):
        print(f"error: {args.data!r} has no train_data.npy — run "
              f"`asrtpu prepare-data` first", file=sys.stderr)
        return 2
    d = load_artifacts(args.data)
    if args.no_standardize:
        tr, dv, te = d.train_data, d.dev_data, d.test_data
    else:
        tr, dv, te, _, _ = standardize_fit_all(d.train_data, d.dev_data, d.test_data)

    cfg = model_cfg_for(args.task, args.variant)
    if getattr(args, "bf16", False):
        cfg = cfg.with_bf16()
    defaults = _REF_DEFAULTS[(args.task, args.variant)]
    batch = args.batch_size or defaults["batch"]
    patience = args.patience if args.patience is not None else defaults["patience"]

    constraint = cstate = None
    if args.variant == "constrained" and args.constraint != "none":
        rho = args.rho if args.rho is not None else _REF_RHO[args.task]
        maker = {
            "simple": lambda: make_simple_norm_constraint(rho),
            "norm": lambda: make_norm_constraint(rho),
            "fista": lambda: make_fista_constraint(rho, nit=2),
            "custom": lambda: make_custom_constraint(rho),
        }[args.constraint]
        con = maker()
        import jax

        p0, _ = init_mlp(cfg, jax.random.PRNGKey(args.seed))
        constraint, cstate = con.apply, con.init(p0)

    tcfg = TrainConfig(batch_size=batch, epochs=args.epochs, patience=patience,
                       seed=args.seed, log_every=args.log_every,
                       device_resident=bool(getattr(args, "device_resident",
                                                    False)),
                       epochs_per_dispatch=(
                           getattr(args, "epochs_per_dispatch", None) or 1),
                       epoch_backend=getattr(args, "epoch_backend", "auto"))
    callbacks = ()
    if args.monitor_lipschitz:
        callbacks = (lipschitz_monitor(cfg),)
    if args.data_parallel:
        from ..parallel import DataParallelTrainer, data_mesh

        trainer = DataParallelTrainer(cfg, data_mesh(), tcfg,
                                      constraint=constraint,
                                      constraint_state=cstate,
                                      epoch_callbacks=callbacks)
    else:
        trainer = Trainer(cfg, tcfg, constraint=constraint,
                          constraint_state=cstate, epoch_callbacks=callbacks)
    init_params = init_state = init_opt = best0 = None
    if args.resume and not os.path.exists(os.path.join(args.ckpt, "best")):
        # an explicit resume request that can't be honored must not fall
        # through to a silent from-scratch run (round-3 review)
        print(f"error: --resume requested but {args.ckpt!r} has no 'best' "
              f"checkpoint (wrong --ckpt, or nothing saved yet?)",
              file=sys.stderr)
        return 2
    if args.resume and os.path.exists(os.path.join(args.ckpt, "best")):
        from ..train.checkpoints import CheckpointManager, validate_model_tree

        # restore against an example tree so the optax NamedTuple structure
        # (ScaleByAdamState etc.) comes back intact — a bare restore yields
        # nested dicts that optimizer.update would reject
        import jax as _jax
        ex_p, ex_s, ex_o, _ = trainer._init_train_state(_jax.random.PRNGKey(0))
        example = _jax.tree.map(
            lambda a: np.asarray(a),
            {"params": ex_p, "state": ex_s, "opt_state": ex_o})
        try:
            tree, meta = CheckpointManager(args.ckpt).load_best(example)
            validate_model_tree(tree["params"], tree["state"], cfg)
        except ValueError as e:
            raise SystemExit(f"error: --resume checkpoint mismatch: {e}")
        init_params, init_state = tree["params"], tree["state"]
        # continue the Adam trajectory, and seed best-val tracking with the
        # checkpoint's stored val_loss — otherwise the resumed run's first
        # (usually worse) epoch would overwrite the better saved checkpoint
        init_opt = tree.get("opt_state")
        best0 = meta.get("val_loss")
        print(f"resumed from {args.ckpt} (epoch {meta.get('epoch')}, "
              f"val_loss {best0})")
    res = trainer.fit(tr, d.train_label, dv, d.dev_label,
                      params=init_params, state=init_state,
                      opt_state=init_opt, initial_best_val=best0,
                      checkpoint_dir=args.ckpt, metrics_dir=args.metrics_dir)
    test_loss, test_acc = trainer.evaluate(res["best_params"], res["best_state"],
                                           te, d.test_label)
    print(f"Test loss: {test_loss} / Test accuracy: {test_acc}")
    if args.export_h5:
        from ..train.checkpoints import export_h5

        export_h5(args.export_h5, res["best_params"], res["best_state"])
    print(json.dumps({
        "epochs_run": res["epochs_run"],
        "best_val_loss": res["best_val_loss"],
        "test_loss": test_loss,
        "test_accuracy": test_acc,
        "examples_per_sec": res["examples_per_sec"],
        "ckpt": args.ckpt,
    }))


def cmd_train_multi(args):
    import jax

    from ..constraints import (
        make_custom_constraint,
        make_fista_constraint,
        make_norm_constraint,
        make_simple_norm_constraint,
    )
    from ..data import load_artifacts, standardize_fit_all
    from ..parallel.mesh import pad_to_multiple
    from ..train import TrainConfig
    from ..train.checkpoints import CheckpointManager
    from ..train.multi_run import build_multi_run_eval_fn, fit_multi_run

    try:
        seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    except ValueError:
        print(f"error: --seeds must be comma-separated ints, got "
              f"{args.seeds!r}", file=sys.stderr)
        return 2
    if not seeds:
        print("error: --seeds is empty", file=sys.stderr)
        return 2
    rhos = None
    if args.rhos is not None:
        try:
            rhos = [float(r) for r in args.rhos.split(",") if r.strip()]
        except ValueError:
            print(f"error: --rhos must be comma-separated floats, got "
                  f"{args.rhos!r}", file=sys.stderr)
            return 2
        if args.variant != "constrained" or args.constraint == "none":
            print("error: --rhos needs --variant constrained and a "
                  "--constraint algorithm", file=sys.stderr)
            return 2

    if not os.path.exists(os.path.join(args.data, "train_data.npy")):
        print(f"error: {args.data!r} has no train_data.npy — run "
              f"`asrtpu prepare-data` first", file=sys.stderr)
        return 2
    d = load_artifacts(args.data)
    if args.no_standardize:
        tr, dv, te = d.train_data, d.dev_data, d.test_data
    else:
        tr, dv, te, _, _ = standardize_fit_all(d.train_data, d.dev_data,
                                               d.test_data)

    cfg = model_cfg_for(args.task, args.variant)
    if args.bf16:
        cfg = cfg.with_bf16()
    defaults = _REF_DEFAULTS[(args.task, args.variant)]
    batch = args.batch_size or defaults["batch"]
    patience = (args.patience if args.patience is not None
                else defaults["patience"])
    tcfg = TrainConfig(batch_size=batch, epochs=args.epochs,
                       patience=patience, device_resident=True,
                       epochs_per_dispatch=args.epochs_per_dispatch)

    factory = None
    kw = {}
    if args.variant == "constrained" and args.constraint != "none":
        factory = {
            "simple": make_simple_norm_constraint,
            "norm": make_norm_constraint,
            "fista": lambda rho: make_fista_constraint(rho, nit=2),
            "custom": make_custom_constraint,
        }[args.constraint]
        if rhos is None:
            rhos = [_REF_RHO[args.task]]
    if factory is not None:
        # full seeds x rhos grid, paired elementwise for fit_multi_run
        grid = [(s, r) for s in seeds for r in rhos]
        run_seeds = [s for s, _ in grid]
        kw = dict(constraint_factory=factory,
                  rhos=[r for _, r in grid])
    else:
        grid = [(s, None) for s in seeds]
        run_seeds = seeds
    mesh = None
    if args.runs_mesh:
        from ..parallel import data_mesh

        mesh = data_mesh()
        if len(grid) % mesh.devices.size:
            print(f"error: --runs-mesh needs the run count ({len(grid)}) "
                  f"to divide across {mesh.devices.size} devices — adjust "
                  f"--seeds/--rhos", file=sys.stderr)
            return 2

    res = fit_multi_run(cfg, tcfg, tr, d.train_label, dv, d.dev_label,
                        run_seeds, mesh=mesh,
                        epoch_backend=getattr(args, "epoch_backend", "xla"),
                        **kw)

    # one fused test eval across all runs, then per-run best checkpoints
    vb = 1024 if len(te) >= 1024 else max(8, len(te))
    te_p, _ = pad_to_multiple(np.asarray(te, np.float32), vb)
    tl_p, _ = pad_to_multiple(np.asarray(d.test_label, np.int32), vb)
    eval_fn = build_multi_run_eval_fn(cfg, batch_size=vb)
    t_loss, t_acc = eval_fn(res["best_params"], res["best_state"], te_p,
                            tl_p, len(te))
    t_loss, t_acc = np.asarray(t_loss), np.asarray(t_acc)

    take = lambda tree, r: jax.tree.map(lambda a: a[r], tree)  # noqa: E731
    runs = []
    for r, (seed, rho) in enumerate(grid):
        sub = (f"run{r}_seed{seed}" if rho is None
               else f"run{r}_seed{seed}_rho{rho:g}")
        ck_dir = os.path.join(args.ckpt, sub)
        CheckpointManager(ck_dir).save_best(
            take(res["best_params"], r), take(res["best_state"], r),
            take(res["best_opt_state"], r),
            epoch=int(res["best_epoch"][r]),
            val_loss=float(res["best_val_loss"][r]))
        runs.append({
            "seed": seed, "rho": rho,
            "best_val_loss": float(res["best_val_loss"][r]),
            "epochs_run": int(res["epochs_run"][r]),
            "test_loss": float(t_loss[r]),
            "test_accuracy": float(t_acc[r]),
            "ckpt": ck_dir,
        })
        print(f"run {r} seed={seed} rho={rho}: val_loss="
              f"{res['best_val_loss'][r]:.4f} test_acc={t_acc[r]:.4f} "
              f"({res['epochs_run'][r]} epochs) -> {ck_dir}")
    print(json.dumps({"runs": runs, "n_runs": len(grid),
                      "fused_dispatches": len(res["history"]["val_loss"])}))


def cmd_attack(args):
    import jax.numpy as jnp

    from ..attacks.sweeps import blackbox_sweep, whitebox_sweep
    from ..data import load_artifacts, standardize_fit_all
    from ..models.mlp import apply_mlp
    from ..ops.mfcc_xla import FrontendConfig
    from ..utils import native

    if not os.path.exists(os.path.join(args.data, "train_data.npy")):
        print(f"error: {args.data!r} has no train_data.npy — run "
              f"`asrtpu prepare-data` first", file=sys.stderr)
        return 2
    d = load_artifacts(args.data)
    cfg_c = model_cfg_for(args.task, "constrained")
    cfg_u = model_cfg_for(args.task, "unconstrained")
    pc, sc = load_model(args.constrained, cfg_c)
    pu, su = load_model(args.unconstrained, cfg_u)

    std_before = args.standardize == "before"
    # the reference's standardize_dataset RE-FITS the scaler per sweep point
    # on [train; val; perturbed-test] (`attacks.py:341-343,437-438`); in the
    # standardize-before case train/val are already standardized when that
    # refit happens (`:327` then `:342`). Replicate both.
    tr_cur, dv_cur, te_cur = d.train_data, d.dev_data, d.test_data
    if std_before:
        tr_cur, dv_cur, te_cur, _, _ = standardize_fit_all(
            tr_cur, dv_cur, te_cur
        )

    def std(feats):
        _, _, out, _, _ = standardize_fit_all(tr_cur, dv_cur, feats)
        return out

    test_feats = te_cur

    def logits_c(x):
        return apply_mlp(cfg_c, pc, sc, x, train=False)[0]

    def logits_u(x):
        return apply_mlp(cfg_u, pu, su, x, train=False)[0]

    def predict_c(x):
        import jax

        return np.asarray(jax.nn.softmax(logits_c(jnp.asarray(x, jnp.float32)), -1))

    def predict_u(x):
        import jax

        return np.asarray(jax.nn.softmax(logits_u(jnp.asarray(x, jnp.float32)), -1))

    strengths = None
    if args.strengths:
        strengths = [float(s) for s in args.strengths.split(",")]
    elif args.task == "speaker" and args.type in (
        "snr_audio", "mixture_audio", "white_audio"
    ):
        from ..attacks.sweeps import GRIDS

        strengths = list(GRIDS[{
            "snr_audio": "snrs_db_speaker",
            "mixture_audio": "audio_alphas_speaker",
            # `Speaker recognition/attacks.py:336`: audio-domain white noise
            # overrides sigmas to linspace(0, 0.005, 10)
            "white_audio": "audio_sigmas_speaker",
        }[args.type]])
    elif args.type == "fgsm" and not std_before:
        # reference grid switch: attacks on raw (un-standardized) dB-scale
        # MFCCs use eps = linspace(1, 30, 50) instead of the standardized
        # grid linspace(0.01, 0.3, 10)
        # (`Voice digit recogniton/attacks.py:497-499`)
        from ..attacks.sweeps import GRIDS

        strengths = list(GRIDS["fgsm_eps_raw"])

    audio_attacks = {"white_audio", "mixture_audio", "snr_audio"}
    if args.type in audio_attacks:
        fe_cfg = (FrontendConfig.digit() if args.task == "digit"
                  else FrontendConfig.speaker())
        if d.test_filenames is None:
            print("error: artifact dir has no test_dataset_to_add_noise/",
                  file=sys.stderr)
            return 2
        waves_list = native.decode_resample_batch(list(d.test_filenames), fe_cfg.sr)
        labels = d.test_audio_label
        if args.task == "speaker":
            # noise full recording -> slice 1-s windows -> MFCC (SR order)
            res = blackbox_sweep(
                args.type, predict_c, predict_u, labels, strengths=strengths,
                test_waves_list=waves_list, frontend_cfg=fe_cfg,
                standardize=std, seed=args.seed,
            )
        else:
            from ..attacks.sweeps import fused_audio_sweep

            cap = max(len(w) for w in waves_list)
            cap = -(-cap // fe_cfg.sr) * fe_cfg.sr
            waves = np.zeros((len(waves_list), cap), np.float32)
            lengths = np.zeros((len(waves_list),), np.int64)
            for i, w in enumerate(waves_list):
                waves[i, : len(w)] = w
                lengths[i] = len(w)
            # one jitted noise->MFCC->refit-standardize->predict program per
            # sweep point; only two accuracy scalars come back to host
            res = fused_audio_sweep(
                args.type, logits_c, logits_u, labels,
                test_waves=waves, lengths=lengths, frontend_cfg=fe_cfg,
                strengths=strengths, refit_arrays=(tr_cur, dv_cur),
                seed=args.seed,
            )
    elif args.type in ("white_mfcc", "mixture_mfcc"):
        res = blackbox_sweep(
            args.type, predict_c, predict_u, d.test_label, strengths=strengths,
            test_features=test_feats,
            standardize=None if std_before else std, seed=args.seed,
        )
    else:
        res = whitebox_sweep(
            args.type, logits_c, logits_u, predict_c, predict_u,
            test_feats, d.test_label, strengths=strengths,
            standardize=None if std_before else std,
            max_samples=args.max_samples, seed=args.seed,
        )
    for s, ac, au in zip(res.strengths, res.accuracy_constrained,
                         res.accuracy_unconstrained):
        print(f"strength={s}: constrained={ac*100:.2f}% "
              f"unconstrained={au*100:.2f}%")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res.as_dict(), f, indent=2)
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        ax = res.plot()
        ax.figure.savefig(args.plot, dpi=120)
    print(json.dumps(res.as_dict()))


def cmd_certify(args):
    from ..attacks.sweeps import GRIDS
    from ..constraints.certify import certified_radii, certify_sweep
    from ..data import load_artifacts, standardize_fit_all

    if not os.path.exists(os.path.join(args.data, "train_data.npy")):
        print(f"error: {args.data!r} has no train_data.npy — run "
              f"`asrtpu prepare-data` first", file=sys.stderr)
        return 2
    d = load_artifacts(args.data)
    cfg_c = model_cfg_for(args.task, "constrained")
    cfg_u = model_cfg_for(args.task, "unconstrained")
    pc, sc = load_model(args.constrained, cfg_c)
    pu, su = load_model(args.unconstrained, cfg_u)
    # the certificate lives in the space the model consumes: standardized
    # features, like the white-box attacks with --standardize before
    _, _, te, _, _ = standardize_fit_all(d.train_data, d.dev_data,
                                         d.test_data)
    if args.strengths:
        eps = [float(s) for s in args.strengths.split(",")]
    elif args.norm == "linf":
        eps = [0.0] + list(GRIDS["fgsm_eps_std"])
    else:
        # scale the default grid to where the certificates actually live —
        # for BOTH models, so a degenerate one can't collapse the grid
        tops = []
        for cfg_m, pm, sm in ((cfg_c, pc, sc), (cfg_u, pu, su)):
            rm, cm, _ = certified_radii(cfg_m, pm, sm, te, d.test_label)
            if cm.any():
                tops.append(float(np.percentile(rm[cm], 90)))
        eps = list(np.linspace(0.0, max(tops + [1e-6]), 10))
    res = certify_sweep(cfg_c, pc, sc, cfg_u, pu, su, te, d.test_label,
                        eps, norm=args.norm)
    for s, ac, au in zip(res.strengths, res.certified_constrained,
                         res.certified_unconstrained):
        print(f"eps={s:.6g}: certified constrained={ac*100:.2f}% "
              f"unconstrained={au*100:.2f}%")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res.as_dict(), f, indent=2)
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        ax = res.plot()
        ax.figure.savefig(args.plot, dpi=120)
    print(json.dumps(res.as_dict()))


def cmd_dolphin(args):
    from ..attacks.dolphin import generate_dolphin_wav

    out = generate_dolphin_wav(args.voice, args.out,
                               carrier_freq=args.carrier_khz * 1000.0)
    print(json.dumps({"out": out}))


def cmd_bench(args):
    # source checkout: bench.py sits next to the package; installed: it is
    # shipped as a top-level module (pyproject py-modules)
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, root)
    try:
        import bench
    except ModuleNotFoundError:
        print("error: bench module not found (run from a source checkout or "
              "reinstall the package)", file=sys.stderr)
        return 2
    return bench.main(quick=args.quick)


def cmd_profile(args):
    """Synthetic-data trace of the fused train step + frontend, the
    TPU-native replacement for the reference's TensorBoard callback
    (SURVEY.md §5 tracing)."""
    if args.steps < 1:
        print("error: --steps must be >= 1", file=sys.stderr)
        return 2
    import jax
    import jax.numpy as jnp

    from ..constraints import make_simple_norm_constraint
    from ..models.mlp import init_mlp
    from ..ops.mfcc_xla import FrontendConfig, mfcc_xla_batch
    from ..train import TrainConfig, Trainer
    from ..utils.profiling import trace

    cfg = model_cfg_for(args.task, args.variant)
    fe_cfg = (FrontendConfig.digit() if args.task == "digit"
              else FrontendConfig.speaker())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((args.batch_size, cfg.in_dim)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, args.batch_size).astype(np.int32)
    waves = (rng.standard_normal((128, fe_cfg.sr)) * 0.1).astype(np.float32)

    kw = {}
    if args.variant == "constrained":
        con = make_simple_norm_constraint(_REF_RHO[args.task], n_iter=4)
        p0, _ = init_mlp(cfg, jax.random.PRNGKey(0))
        kw = dict(constraint=con.apply, constraint_state=con.init(p0))
    trainer = Trainer(cfg, TrainConfig(batch_size=args.batch_size), **kw)
    params, state = init_mlp(cfg, jax.random.PRNGKey(0))
    opt_state = trainer.optimizer.init(params)
    # COPY the constraint state: train_step donates its inputs, and handing
    # it trainer.constraint_state's own buffers would leave the trainer
    # holding deleted arrays after the warmup step
    cstate = jax.tree.map(jnp.array, kw.get("constraint_state"))
    # compile outside the trace so the trace shows steady-state execution
    out = trainer.train_step(params, state, opt_state, cstate, x, y,
                             jax.random.PRNGKey(1))
    jax.tree.leaves(out)[0].block_until_ready()
    mfcc_xla_batch(waves, fe_cfg).block_until_ready()
    params, state, opt_state, cstate = out[:4]
    with trace(args.out):
        for i in range(args.steps):
            params, state, opt_state, cstate, loss, acc = trainer.train_step(
                params, state, opt_state, cstate, x, y, jax.random.PRNGKey(i)
            )
        feats = mfcc_xla_batch(waves, fe_cfg)
        jax.tree.leaves((params, feats))[0].block_until_ready()
    print(json.dumps({"trace_dir": args.out, "steps": args.steps,
                      "final_loss": float(loss)}))


def cmd_evaluate(args):
    from ..data import load_artifacts, standardize_fit_all
    from ..models.mlp import apply_mlp
    from ..train import TrainConfig, Trainer

    if not os.path.exists(os.path.join(args.data, "train_data.npy")):
        print(f"error: {args.data!r} has no train_data.npy — run "
              f"`asrtpu prepare-data` first", file=sys.stderr)
        return 2
    d = load_artifacts(args.data)
    if args.no_standardize:
        te = d.test_data
    else:
        _, _, te, _, _ = standardize_fit_all(d.train_data, d.dev_data, d.test_data)
    cfg = model_cfg_for(args.task, args.variant)
    params, state = load_model(args.ckpt, cfg)
    trainer = Trainer(cfg, TrainConfig(batch_size=256))
    loss, acc = trainer.evaluate(params, state, te, d.test_label)
    probs = trainer.predict(params, state, te)
    pred = np.argmax(probs, axis=1)
    n = cfg.n_classes
    conf = np.zeros((n, n), dtype=np.int64)
    for t, p in zip(np.asarray(d.test_label, dtype=int), pred):
        conf[t, p] += 1
    print(f"Test loss: {loss} / Test accuracy: {acc}")
    print(conf)
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        im = ax.imshow(conf, cmap="viridis")
        fig.colorbar(im)
        ax.set_title("Confusion Matrix")
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.savefig(args.plot, dpi=120)
    print(json.dumps({"test_loss": loss, "test_accuracy": acc,
                      "confusion_matrix": conf.tolist()}))


def cmd_infer(args):
    from ..serve.engine import InferenceEngine

    kw = {}
    if args.buckets is not None:
        try:
            kw["buckets"] = tuple(int(b) for b in args.buckets.split(","))
        except ValueError:
            print(f"error: --buckets must be comma-separated ints, got "
                  f"{args.buckets!r}", file=sys.stderr)
            return 2
    standardize = not args.no_standardize
    if standardize and args.data is None:
        print("error: --data (the training artifact dir) is required to "
              "re-derive the scaler; pass --no-standardize for models "
              "trained on raw features", file=sys.stderr)
        return 2
    paths = []
    for a in args.audio:
        if os.path.isdir(a):
            found = sorted(
                os.path.join(a, f) for f in os.listdir(a)
                if f.lower().endswith(".wav"))
            if not found:
                print(f"error: no .wav files under {a!r}", file=sys.stderr)
                return 2
            paths.extend(found)
        elif os.path.exists(a):
            paths.append(a)
        else:
            print(f"error: {a!r} is neither a WAV file nor a directory",
                  file=sys.stderr)
            return 2
    try:
        engine = InferenceEngine.from_checkpoint(
            args.task, args.variant, args.ckpt, artifacts_dir=args.data,
            standardize=standardize, backend=args.backend, **kw)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    agg = args.agg if args.agg is not None else (
        "vote" if args.task == "speaker" else "none")
    if args.warmup:
        engine.warmup()
    results = engine.classify_files(paths,
                                    agg=None if agg == "none" else agg)
    out = []
    for r in results:
        rec = {"path": r["path"], "label": (None if r["label"] is None
                                            else int(r["label"]))}
        if "n_windows" in r:
            rec["n_windows"] = r["n_windows"]
            rec["window_labels"] = [int(v) for v in r["window_labels"]]
        if r["label"] is not None:
            p = r["probs"]
            rec["confidence"] = float(
                p.mean(axis=0)[r["label"]] if p.ndim == 2 else p[r["label"]])
        print(f"{rec['path']}: label={rec['label']}"
              + (f" windows={rec['n_windows']}" if "n_windows" in rec else ""))
        out.append(rec)
    print(json.dumps({
        "results": out, "n_files": len(out), "task": args.task,
        "variant": args.variant, "aggregation": agg,
        "frontend_backend": engine._fe.backend,
        "latency": engine.latency_stats(),
    }))


# registration + dispatch in ONE table so a subcommand can never be parsed
# but undispatched (KeyError at runtime — caught by a live drive, round 3)
_SUBCOMMANDS = {
    "prepare-data": (_add_prepare, lambda a: cmd_prepare(a)),
    "train": (_add_train, lambda a: cmd_train(a)),
    "train-multi": (_add_train_multi, lambda a: cmd_train_multi(a)),
    "attack": (_add_attack, lambda a: cmd_attack(a)),
    "certify": (_add_certify, lambda a: cmd_certify(a)),
    "dolphin": (_add_dolphin, lambda a: cmd_dolphin(a)),
    "bench": (_add_bench, lambda a: cmd_bench(a)),
    "profile": (_add_profile, lambda a: cmd_profile(a)),
    "evaluate": (_add_eval, lambda a: cmd_evaluate(a)),
    "infer": (_add_infer, lambda a: cmd_infer(a)),
}


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="asrtpu",
        description="TPU-native robust-ASR framework "
                    "(capabilities of fmazilu/ASR-using-robust-NN)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    for add_fn, _ in _SUBCOMMANDS.values():
        add_fn(sub)
    args = ap.parse_args(argv)
    return _SUBCOMMANDS[args.cmd][1](args) or 0


if __name__ == "__main__":
    sys.exit(main())
