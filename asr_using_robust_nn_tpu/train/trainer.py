"""Jit-compiled training loop for the MLP model family.

TPU-native rework of the reference's Keras `model.fit` stack
(`Voice digit recogniton/train_google_dataset.py:77-99`): one fused train
step — forward + CCE + backward + Adam + NonNeg clamp + Lipschitz projection
— compiled as a single XLA program, so the constraint engine's per-batch
weight work happens on device instead of the reference's host SVD round-trip
(`Voice digit recogniton/Constraints.py:27-33`, SURVEY.md §3.3).

Keras-parity knobs: Adam(lr=1e-3, eps=1e-7) ('adam' defaults), categorical
cross-entropy (computed from logits for stability), EarlyStopping on val_loss,
best-val checkpoint retention (`train_google_dataset.py:82-85`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.mlp import MLPConfig, apply_mlp, init_mlp

__all__ = ["TrainConfig", "Trainer", "adam_optimizer", "apply_update"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 256  # 256/512/64 per reference script (SURVEY.md §2 row 6)
    epochs: int = 10000
    patience: int = 200  # EarlyStopping(monitor='val_loss') patience
    learning_rate: float = 1e-3
    seed: int = 0
    shuffle: bool = True
    reshuffle_each_epoch: bool = False  # tf.data reshuffle_each_iteration=False
    log_every: int = 0  # epochs between metric prints; 0 = silent
    device_resident: bool = False  # keep the whole split in HBM and run each
    # epoch as ONE jitted lax.scan (train/epoch_scan.py) — the TPU-native
    # fast path; host<->device traffic drops to scalar metrics per epoch
    epochs_per_dispatch: int = 1  # device-resident only: fuse E epochs into
    # one XLA dispatch (amortizes the host round-trip); history/early-stop
    # granularity coarsens to E epochs
    adam_moments_dtype: str = "float32"  # 'bfloat16' halves the Adam-state
    # HBM traffic of every step (storage only; math stays f32) — see
    # adam_optimizer. Parity-gated; VERDICT r3 item 2.
    epoch_backend: str = "auto"  # device-resident epoch implementation:
    # 'xla' = train/epoch_scan.py lax.scan epoch; 'pallas' = the fused
    # epoch-grid kernel (ops/pallas_train.py — weights/Adam moments/BN
    # state VMEM-resident across all steps; arbitrated ~2x faster on v5e,
    # 2.3-2.9 vs 5.2-5.4 ms/epoch, tools/ab_epoch.py 2026-08-20); 'auto'
    # = pallas iff running on TPU, single-device, fresh optimizer state,
    # and the constraint is the full simple_norm (or None) — i.e. exactly
    # the configurations whose semantics the kernel implements — gated
    # once per process by a numeric parity check against the XLA epoch
    # (epoch_parity_vs_xla), else the XLA epoch. Dropout draws differ
    # between backends (TPU HW PRNG vs threefry — distributionally
    # equivalent, documented divergence), so seeded runs are reproducible
    # per backend, not across backends.
    pallas_interpret: bool = False  # test hook: run the pallas epoch in
    # interpreter mode (CPU); skips the parity gate (the interpreter IS
    # the semantics the gate checks, and it cannot run the TPU kernel)


def _scale_by_adam_stored(b1: float, b2: float, eps: float, dtype):
    """optax.scale_by_adam with the m/v moments STORED in `dtype` (e.g.
    bfloat16) while every arithmetic step runs f32: read-upcast, update,
    bias-correct, write-downcast. The moments are the largest non-weight
    HBM term of the fused train step (m and v each read+written per step —
    VERDICT r3 item 2); bf16 storage halves that traffic. Accuracy is
    parity-gated (tests/test_models_train.py::TestBF16AdamMoments): Adam's
    moment EMAs tolerate ~3-decimal-digit storage — the update direction is
    a RATIO of the two moments, so correlated rounding largely cancels."""

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(z, params),
            nu=jax.tree.map(z, params),
        )

    def update(grads, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        mu_f = jax.tree.map(
            lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
            state.mu, grads)
        nu_f = jax.tree.map(
            lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
            state.nu, grads)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda x: x.astype(dtype), mu_f),
            nu=jax.tree.map(lambda x: x.astype(dtype), nu_f),
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def adam_optimizer(
    lr: float = 1e-3, moments_dtype: str = "float32"
) -> optax.GradientTransformation:
    """Keras 'adam' defaults: b1=0.9, b2=0.999, eps=1e-7 (optax default is
    1e-8 — the 1e-7 here matches tf.keras.optimizers.Adam).

    moments_dtype='bfloat16' stores the Adam m/v state half-width (math
    stays f32) — see `_scale_by_adam_stored`. State pytree structure is
    identical to optax.adam's (chain of ScaleByAdamState + scale), so
    checkpoints and the fused-epoch/multi-run paths are agnostic to it."""
    if moments_dtype == "float32":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-7)
    return optax.chain(
        _scale_by_adam_stored(0.9, 0.999, 1e-7, jnp.dtype(moments_dtype)),
        optax.scale(-lr),
    )


def cce_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean categorical cross-entropy; labels are int classes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _nonneg_clamp(params: dict) -> dict:
    """Keras NonNeg kernel constraint: w *= (w >= 0), applied after each
    optimizer update (`train_constraints.py:67-85`)."""
    layers = [
        dict(p, w=p["w"] * (p["w"] >= 0.0)) for p in params["layers"]
    ]
    return dict(params, layers=layers)


def apply_update(optimizer, model_cfg, constraint, grads, params, opt_state,
                 cstate):
    """The ONE post-gradient sequence — optimizer update, NonNeg clamp,
    constraint projection, in that order (the reference applies its
    callbacks after the optimizer step, SURVEY.md §3.3). Shared by every
    trainer variant (single-device, fused epoch scan, GSPMD data-parallel,
    explicit-psum) so the 'identical math' contract between them is
    enforced by construction rather than by keeping four copies in sync."""
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    if model_cfg.nonneg:
        params = _nonneg_clamp(params)
    if constraint is not None:
        params, cstate = constraint(params, cstate)
    return params, opt_state, cstate


# once-per-process parity-gate verdicts for the pallas epoch promotion,
# keyed by (model cfg, batch, rho, pi_iters): the gate costs two 1-epoch
# compiles, so fit() runs it at most once per configuration
_PALLAS_EPOCH_GATE: dict = {}


class Trainer:
    """Orchestrates jitted train/eval steps with early stopping + best-params
    retention. `constraint` is an optional in-step projection
    `(params, cstate) -> (params, cstate)` from constraints/engine.py,
    applied after the Adam update + NonNeg clamp, exactly where the
    reference's on_batch_end callbacks ran (SURVEY.md §3.3).
    """

    def __init__(
        self,
        model_cfg: MLPConfig,
        train_cfg: TrainConfig | None = None,
        constraint: Callable | None = None,
        constraint_state=None,
        epoch_callbacks: tuple[Callable, ...] = (),
    ):
        self.model_cfg = model_cfg
        self.cfg = train_cfg or TrainConfig()
        self.constraint = constraint
        self.constraint_state = constraint_state
        self.epoch_callbacks = tuple(epoch_callbacks)
        self.optimizer = adam_optimizer(self.cfg.learning_rate,
                                        self.cfg.adam_moments_dtype)
        self._build_steps()

    def _build_steps(self):
        model_cfg = self.model_cfg
        optimizer = self.optimizer
        constraint = self.constraint

        def loss_fn(params, state, x, y, rng):
            logits, new_state = apply_mlp(
                model_cfg, params, state, x, train=True, rng=rng
            )
            loss = cce_from_logits(logits, y)
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return loss, (new_state, acc)

        def train_step(params, state, opt_state, cstate, x, y, rng):
            (loss, (state, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, state, x, y, rng)
            params, opt_state, cstate = apply_update(
                optimizer, model_cfg, constraint, grads, params, opt_state,
                cstate)
            return params, state, opt_state, cstate, loss, acc

        def eval_step(params, state, x, y):
            logits, _ = apply_mlp(model_cfg, params, state, x, train=False)
            return cce_from_logits(logits, y), jnp.mean(
                jnp.argmax(logits, -1) == y
            ), jnp.argmax(logits, -1)

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))
        self.eval_step = jax.jit(eval_step)

    def _resolve_epoch_backend(self, mesh, fresh_opt) -> bool:
        """Whether this device-resident fit should run the fused Pallas
        epoch kernel (TrainConfig.epoch_backend). 'auto' requires the
        configurations the kernel implements: single device, fresh
        optimizer state (pack_state zeroes the Adam moments), and either
        no constraint or the full all-layers simple_norm."""
        cfg = self.cfg
        if cfg.epoch_backend == "xla":
            return False
        if cfg.epoch_backend not in ("auto", "pallas"):
            raise ValueError(
                f"unknown epoch_backend {cfg.epoch_backend!r} "
                f"(valid: auto, xla, pallas)")
        kind = getattr(self.constraint, "_asrtpu_kind", None)
        meta = getattr(self.constraint, "_asrtpu_meta", None) or {}
        supported = (
            mesh is None
            and fresh_opt
            and (self.constraint is None
                 or (kind == "simple_norm" and meta.get("affected_all")))
        )
        if cfg.epoch_backend == "pallas":
            if not supported:
                raise ValueError(
                    "epoch_backend='pallas' needs a single-device fit with "
                    "a fresh optimizer state and either no constraint or "
                    "the full (all-layers) simple_norm constraint — the "
                    "configurations the fused epoch kernel implements"
                )
            return True
        if cfg.pallas_interpret:
            return supported
        return supported and jax.default_backend() in ("tpu", "axon")

    def _init_train_state(self, key):
        """-> (params, state, opt_state, cstate). Subclasses that place
        buffers on a mesh (TensorParallelTrainer) override this so fit()
        trains with their shardings."""
        params, state = init_mlp(self.model_cfg, key)
        opt_state = self.optimizer.init(params)
        cstate = jax.tree.map(jnp.array, self.constraint_state)
        return params, state, opt_state, cstate

    def _adopt_train_state(self, params, state, opt_state=None):
        """Warm-start path of fit(): defensively copy caller-owned trees
        (the jitted steps donate their inputs — a second fit() would
        otherwise hit deleted arrays). A restored optimizer state (Adam
        moments + step count from a checkpoint) is adopted when given so a
        resumed run continues the trajectory; otherwise the optimizer
        starts fresh. Subclasses that place buffers on a mesh override
        this so a warm-started fit() trains with their shardings too."""
        params = jax.tree.map(jnp.array, params)
        state = jax.tree.map(jnp.array, state)
        if opt_state is None:
            opt_state = self.optimizer.init(params)
        else:
            opt_state = jax.tree.map(jnp.array, opt_state)
        cstate = jax.tree.map(jnp.array, self.constraint_state)
        return params, state, opt_state, cstate

    def _place_batch(self, x, y):
        """Hook for subclasses to shard host batches before a step; the base
        trainer lets jit stream numpy to the default device."""
        return x, y

    def _batches(self, n, rng):
        idx = np.arange(n)
        if self.cfg.shuffle:
            rng.shuffle(idx)
        bs = self.cfg.batch_size
        return [idx[i : i + bs] for i in range(0, n, bs)]

    def evaluate(self, params, state, x, y, batch_size: int | None = None):
        """-> (loss, accuracy) over a dataset, batched like model.evaluate."""
        bs = batch_size or self.cfg.batch_size
        x = np.asarray(x, dtype=np.float32)
        y = np.asarray(y, dtype=np.int32)
        losses, accs, ns = [], [], []
        for i in range(0, len(x), bs):
            l, a, _ = self.eval_step(params, state, x[i : i + bs], y[i : i + bs])
            losses.append(float(l) * len(x[i : i + bs]))
            accs.append(float(a) * len(x[i : i + bs]))
            ns.append(len(x[i : i + bs]))
        n = sum(ns)
        return sum(losses) / n, sum(accs) / n

    def predict(self, params, state, x, batch_size: int | None = None):
        """Softmax probabilities, batched — `model.predict` equivalent."""
        if not hasattr(self, "_predict_fn"):
            from ..models.mlp import predict_probs

            self._predict_fn = jax.jit(
                lambda p, s, xb: predict_probs(self.model_cfg, p, s, xb)
            )
        bs = batch_size or self.cfg.batch_size
        x = np.asarray(x, dtype=np.float32)
        out = []
        for i in range(0, len(x), bs):
            out.append(np.asarray(self._predict_fn(params, state, x[i : i + bs])))
        return np.concatenate(out, axis=0)

    def fit(
        self,
        train_x,
        train_y,
        val_x,
        val_y,
        params=None,
        state=None,
        opt_state=None,
        initial_best_val=None,
        checkpoint_dir=None,
        metrics_dir=None,
    ) -> dict:
        """Full training loop with early stopping; returns a result dict with
        best params (by val_loss, like ModelCheckpoint save_best_only) and
        history. Data is host numpy; batches stream to device per step.

        Resume semantics: pass the checkpoint's params/state (+ opt_state to
        continue the Adam trajectory) and its stored val_loss as
        `initial_best_val` — without the latter a resumed run starts from
        best=inf and its FIRST epoch would overwrite a better saved best
        checkpoint with a worse model.
        """
        cfg = self.cfg
        if len(val_x) == 0:
            # device-resident eval would yield NaN val_loss every epoch
            # (silently training to the epoch cap); streaming eval would
            # ZeroDivisionError — fail early and readably instead
            raise ValueError(
                "fit() needs a non-empty validation split (early stopping "
                "and best-checkpoint retention monitor val_loss)"
            )
        fresh_opt = opt_state is None  # pallas epoch packs zero moments,
        # so a resumed Adam trajectory must stay on the XLA epoch
        key = jax.random.PRNGKey(cfg.seed)
        if params is None:
            key, k0 = jax.random.split(key)
            params, state, opt_state, cstate = self._init_train_state(k0)
        else:
            params, state, opt_state, cstate = self._adopt_train_state(
                params, state, opt_state
            )

        train_x = np.asarray(train_x, dtype=np.float32)
        train_y = np.asarray(train_y, dtype=np.int32)
        rng = np.random.default_rng(cfg.seed)
        batch_idx = self._batches(len(train_x), rng)

        best_val = np.inf if initial_best_val is None else float(
            initial_best_val)
        # seeded resume: the warm-start params ARE the current best (the
        # checkpoint's best-val weights). Snapshot them so a resume whose
        # epochs never beat the seed returns THOSE as best_params instead
        # of the final (worse) params paired with the seeded loss.
        best = (None if initial_best_val is None else
                (jax.tree.map(np.asarray, params),
                 jax.tree.map(np.asarray, state)))
        wait = 0
        history = {"loss": [], "acc": [], "val_loss": [], "val_acc": []}
        ckpt = None
        if checkpoint_dir is not None:
            from .checkpoints import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
        writer = None
        if metrics_dir is not None:
            from ..utils.profiling import MetricWriter

            writer = MetricWriter(metrics_dir)

        dr = None
        if cfg.device_resident:
            from .epoch_scan import build_epoch_fn, build_eval_fn

            if cfg.epochs_per_dispatch < 1:
                raise ValueError(
                    f"TrainConfig.epochs_per_dispatch must be >= 1, got "
                    f"{cfg.epochs_per_dispatch}"
                )
            mesh = getattr(self, "mesh", None)
            row_sharding = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_dev = mesh.devices.size
                if cfg.batch_size % n_dev:
                    raise ValueError(
                        f"device_resident over a {n_dev}-device mesh needs "
                        f"batch_size divisible by it (got {cfg.batch_size})"
                    )
                row_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

            def put(arr):
                return (jax.device_put(arr, row_sharding)
                        if row_sharding is not None else jax.device_put(arr))

            from ..parallel.mesh import pad_to_multiple

            bs = cfg.batch_size
            d_tr, n_true = pad_to_multiple(train_x, bs)
            l_tr, _ = pad_to_multiple(train_y.astype(np.int32), bs)
            d_train, l_train = put(d_tr), put(l_tr)
            vx = np.asarray(val_x, np.float32)
            vy = np.asarray(val_y, np.int32)
            vb = 1024 if len(vx) >= 1024 else max(8, len(vx))
            if mesh is not None:
                vb = -(-vb // mesh.devices.size) * mesh.devices.size
            d_v, _ = pad_to_multiple(vx, vb)
            l_v, _ = pad_to_multiple(vy, vb)
            d_val, l_val = put(d_v), put(l_v)

            use_pallas = self._resolve_epoch_backend(mesh, fresh_opt)
            if use_pallas:
                # production fused-epoch path: the whole epoch is ONE
                # pallas_call with weights/Adam moments/BN state VMEM-
                # resident (ops/pallas_train.py; arbitrated ~2x over the
                # XLA epoch). The packed fstate is the loop-carried truth;
                # params/state/opt_state are unpacked per dispatch so val
                # eval, checkpointing, and the result dict see the
                # standard pytrees.
                from ..ops.pallas_train import (
                    FusedStepSpec, build_fused_epoch_fn, epoch_parity_vs_xla,
                    pack_state, pad_features, unpack_opt_state,
                    unpack_params)

                meta = getattr(self.constraint, "_asrtpu_meta", None) or {}
                spec = FusedStepSpec(
                    cfg=self.model_cfg, batch=bs, lr=cfg.learning_rate,
                    rho=(meta["rho"] if self.constraint is not None
                         else None),
                    pi_iters=(meta.get("n_iter", 4)
                              if self.constraint is not None else 4),
                    interpret=cfg.pallas_interpret,
                )
                gate_key = (self.model_cfg, bs, spec.rho, spec.pi_iters)
                if not cfg.pallas_interpret and \
                        gate_key not in _PALLAS_EPOCH_GATE:
                    _PALLAS_EPOCH_GATE[gate_key] = epoch_parity_vs_xla(
                        self.model_cfg, bs, d_train, l_train, n_true)
                gate = _PALLAS_EPOCH_GATE.get(gate_key, {"ok": True})
                use_pallas = bool(gate["ok"])
                if not use_pallas and cfg.log_every:
                    print(f"pallas epoch parity gate FAILED ({gate}); "
                          f"falling back to the XLA epoch")
            if use_pallas:
                data_pal = pad_features(spec, d_train)
                fstate_cell = {"fs": pack_state(spec, params, state)}
                dims_last = self.model_cfg.n_classes

                def make_epoch_fn(e_per_call, _spec=spec):
                    ep = build_fused_epoch_fn(
                        _spec, shuffle=cfg.shuffle,
                        epochs_per_call=e_per_call,
                        reshuffle_inner=cfg.reshuffle_each_epoch)

                    def fn(params, state, opt_state, cstate, d, l, pk, dk,
                           n_true):
                        fs, mloss, macc = ep(fstate_cell["fs"], data_pal,
                                             l, pk, dk, n_true=n_true)
                        fstate_cell["fs"] = fs
                        p2, s2 = unpack_params(_spec, fs)
                        o2 = unpack_opt_state(_spec, fs, self.optimizer, p2)
                        c2 = cstate
                        if isinstance(cstate, dict) and "u" in cstate:
                            c2 = {"u": fs["u"][0, :dims_last]}
                        return p2, s2, o2, c2, mloss, macc

                    return fn
            else:
                def make_epoch_fn(e_per_call):
                    return build_epoch_fn(
                        self.model_cfg, self.optimizer, self.constraint,
                        batch_size=bs, shuffle=cfg.shuffle, mesh=mesh,
                        epochs_per_call=e_per_call,
                        reshuffle_inner=cfg.reshuffle_each_epoch,
                    )

            epoch_fns = {cfg.epochs_per_dispatch: make_epoch_fn(
                cfg.epochs_per_dispatch)}
            eval_fn = build_eval_fn(self.model_cfg, batch_size=vb, mesh=mesh)
            dr = (epoch_fns, make_epoch_fn, eval_fn, d_train, l_train, n_true,
                  d_val, l_val, len(vx))

        t0 = time.perf_counter()
        steps = 0
        examples_seen = 0
        epochs_done = 0
        ep_stride = cfg.epochs_per_dispatch if (dr is not None) else 1
        key_perm, key_drop = jax.random.split(jax.random.fold_in(key, 977))
        for epoch in range(0, cfg.epochs, ep_stride):
            if dr is not None:
                (epoch_fns, make_epoch_fn, eval_fn, d_train, l_train, n_true,
                 d_val, l_val, n_val) = dr
                # clamp the final dispatch so exactly cfg.epochs epochs run
                this_stride = min(ep_stride, cfg.epochs - epoch)
                if this_stride not in epoch_fns:
                    epoch_fns[this_stride] = make_epoch_fn(this_stride)
                pk = jax.random.fold_in(
                    key_perm, epoch if cfg.reshuffle_each_epoch else 0
                )
                dk = jax.random.fold_in(key_drop, epoch)  # fresh dropout
                params, state, opt_state, cstate, mloss, macc = epoch_fns[
                    this_stride
                ](params, state, opt_state, cstate, d_train, l_train, pk, dk,
                  n_true)
                ep_loss, ep_acc, ep_n = float(mloss), float(macc), 1.0
                steps += -(-n_true // cfg.batch_size) * this_stride
                examples_seen += n_true * this_stride
                epochs_done += this_stride
                vl, va = eval_fn(params, state, d_val, l_val, n_val)
                val_loss, val_acc = float(vl), float(va)
            else:
                if cfg.reshuffle_each_epoch:
                    batch_idx = self._batches(len(train_x), rng)
                # collect device scalars and sync ONCE per epoch — float()
                # per batch would block dispatch of step N+1 until step N
                # finishes, defeating JAX's async pipelining on the hot loop
                losses, accs, ns = [], [], []
                for bidx in batch_idx:
                    key, krng = jax.random.split(key)
                    bx, by = self._place_batch(train_x[bidx], train_y[bidx])
                    params, state, opt_state, cstate, loss, acc = self.train_step(
                        params, state, opt_state, cstate, bx, by, krng,
                    )
                    losses.append(loss)
                    accs.append(acc)
                    ns.append(len(bidx))
                    steps += 1
                w = np.asarray(ns, np.float64)
                ep_loss = float(np.asarray(jnp.stack(losses)) @ w)
                ep_acc = float(np.asarray(jnp.stack(accs)) @ w)
                ep_n = float(w.sum())
                examples_seen += int(ep_n)
                epochs_done += 1
                val_loss, val_acc = self.evaluate(params, state, val_x, val_y)
            history["loss"].append(ep_loss / ep_n)
            history["acc"].append(ep_acc / ep_n)
            history["val_loss"].append(val_loss)
            history["val_acc"].append(val_acc)
            for cb in self.epoch_callbacks:
                cb(epoch, params, state, history)
            if writer is not None:
                writer.scalars(
                    {"loss": history["loss"][-1], "acc": history["acc"][-1],
                     "val_loss": val_loss, "val_acc": val_acc}, epoch
                )
            if cfg.log_every and (epoch % cfg.log_every) < ep_stride:
                print(
                    f"epoch {epoch}: loss={history['loss'][-1]:.4f} "
                    f"acc={history['acc'][-1]:.4f} val_loss={val_loss:.4f} "
                    f"val_acc={val_acc:.4f}"
                )
            if val_loss < best_val:
                best_val = val_loss
                best = (jax.tree.map(np.asarray, params),
                        jax.tree.map(np.asarray, state))
                wait = 0
                if ckpt is not None:
                    ckpt.save_best(params, state, opt_state, epoch, val_loss)
            else:
                # patience counts EPOCHS (Keras EarlyStopping semantics:
                # stop once wait >= patience), regardless of how many
                # epochs each dispatch fuses
                wait += ep_stride if dr is not None else 1
                if wait >= cfg.patience:
                    break
        elapsed = time.perf_counter() - t0
        if writer is not None:
            writer.close()
        if best is None:
            best = (jax.tree.map(np.asarray, params),
                    jax.tree.map(np.asarray, state))
        return {
            "params": params,
            "state": state,
            "opt_state": opt_state,
            "constraint_state": cstate,
            "best_params": best[0],
            "best_state": best[1],
            "best_val_loss": best_val,
            "history": history,
            "epochs_run": epochs_done,
            "steps": steps,
            "seconds": elapsed,
            # true examples visited (ragged final batches counted exactly)
            "examples_per_sec": examples_seen / max(elapsed, 1e-9),
        }
