"""The reference's MLP model family as pure JAX pytrees.

Four variants (SURVEY.md §2 rows 7-10), all 6-layer dense stacks:

  digit_unconstrained   880->1024->512->256->128->64->10, per hidden block
                        Dense->ReLU->BN->Dropout(0.4)
                        (`Voice digit recogniton/train_google_dataset.py:49-74`)
  digit_constrained     same trunk, NonNeg() on every Dense kernel,
                        Dropout(0.1) on the first 3 blocks only
                        (`Voice digit recogniton/train_constraints.py:63-88`)
  speaker_unconstrained 2020->...->20, plain Dense+ReLU (no BN/Dropout)
                        (`Speaker recognition/train_no_constraints.py:52-75`)
  speaker_constrained   2020->...->20, NonNeg + BN everywhere, Dropout(0.1)
                        first 3 blocks (`Speaker recognition/train_constraints.py:63-88`)

Keras-parity details baked in: glorot_uniform kernel init, zero bias; BN with
momentum 0.99, eps 1e-3, batch stats in training and moving stats in eval;
dropout as inverted dropout (scale by 1/keep at train time); softmax head.
Params/state are plain dicts so the constraint engine (constraints/) can
project kernels inside the jitted train step without framework indirection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MLPConfig", "init_mlp", "apply_mlp", "predict_probs", "dense_kernels"]

HIDDEN = (1024, 512, 256, 128, 64)


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_dim: int
    n_classes: int
    hidden: tuple[int, ...] = HIDDEN
    batch_norm: bool = True
    dropout: tuple[float, ...] = (0.4, 0.4, 0.4, 0.4, 0.4)
    nonneg: bool = False  # Keras kernel_constraint=NonNeg() on every Dense
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    # Mixed precision: 'bfloat16' runs every Dense matmul (fwd AND the two
    # backward GEMMs, via the cast's transpose rule) on the MXU's bf16 path
    # with f32 accumulation, while master weights, optimizer state, BN
    # statistics, softmax/CCE, and the constraint projection stay f32 —
    # the standard TPU mixed-precision recipe. Parity-gated by
    # tests/test_models_train.py::TestBF16Parity (clean-accuracy delta
    # <0.2% vs f32 per VERDICT r2 item 2).
    compute_dtype: str = "float32"

    def with_bf16(self) -> "MLPConfig":
        return dataclasses.replace(self, compute_dtype="bfloat16")

    @staticmethod
    def digit_unconstrained() -> "MLPConfig":
        return MLPConfig(in_dim=880, n_classes=10)

    @staticmethod
    def digit_constrained() -> "MLPConfig":
        return MLPConfig(
            in_dim=880, n_classes=10, nonneg=True,
            dropout=(0.1, 0.1, 0.1, 0.0, 0.0),
        )

    @staticmethod
    def speaker_unconstrained() -> "MLPConfig":
        return MLPConfig(
            in_dim=2020, n_classes=20, batch_norm=False,
            dropout=(0.0,) * 5,
        )

    @staticmethod
    def speaker_constrained() -> "MLPConfig":
        return MLPConfig(
            in_dim=2020, n_classes=20, nonneg=True,
            dropout=(0.1, 0.1, 0.1, 0.0, 0.0),
        )

    @property
    def n_dense(self) -> int:
        return len(self.hidden) + 1


def _glorot_uniform(key, shape):
    fan_in, fan_out = shape
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_mlp(cfg: MLPConfig, key) -> tuple[dict, dict]:
    """-> (params, state). params['layers'][i] = {'w','b'} (+'gamma','beta'
    when BN); state['layers'][i] = {'mean','var'} moving statistics."""
    dims = (cfg.in_dim,) + tuple(cfg.hidden) + (cfg.n_classes,)
    layers = []
    slayers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        p = {
            "w": _glorot_uniform(keys[i], (dims[i], dims[i + 1])),
            "b": jnp.zeros((dims[i + 1],), jnp.float32),
        }
        s = {}
        is_hidden = i < len(cfg.hidden)
        if is_hidden and cfg.batch_norm:
            p["gamma"] = jnp.ones((dims[i + 1],), jnp.float32)
            p["beta"] = jnp.zeros((dims[i + 1],), jnp.float32)
            s["mean"] = jnp.zeros((dims[i + 1],), jnp.float32)
            s["var"] = jnp.ones((dims[i + 1],), jnp.float32)
        layers.append(p)
        slayers.append(s)
    return {"layers": layers}, {"layers": slayers}


def apply_mlp(
    cfg: MLPConfig,
    params: dict,
    state: dict,
    x: jnp.ndarray,
    train: bool = False,
    rng=None,
    weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Forward pass -> (logits, new_state).

    Order per hidden block is Dense -> ReLU -> BN -> Dropout, exactly the
    Keras graph (`train_google_dataset.py:51-69`: Dense(activation='relu')
    then BatchNormalization then Dropout). Head returns logits; use
    predict_probs for the softmax output the reference's predict() yields.

    `weights` (train mode only): per-row weights for BN batch moments —
    padded rows in device-resident/data-parallel batches carry weight 0 so
    batch statistics exclude them exactly. None keeps plain mean/var.
    """
    n_hidden = len(cfg.hidden)
    new_slayers = []
    h = x
    if weights is not None:
        denom = jnp.sum(weights) + 1e-9
    if train and rng is not None:
        drop_keys = jax.random.split(rng, max(n_hidden, 1))
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    for i, p in enumerate(params["layers"]):
        if cdt is not None:
            # bf16 operands, f32 MXU accumulation; grads flow back through
            # the casts so dW/dX GEMMs run bf16 too, master grads are f32
            h = jax.lax.dot(
                h.astype(cdt), p["w"].astype(cdt),
                preferred_element_type=jnp.float32,
            ) + p["b"]
        else:
            h = h @ p["w"] + p["b"]
        if i == n_hidden:  # output layer: logits
            new_slayers.append(dict(state["layers"][i]))  # keep structure
            break
        h = jax.nn.relu(h)
        s = state["layers"][i]
        if cfg.batch_norm:
            if train:
                if weights is not None:
                    mean = jnp.sum(h * weights[:, None], 0) / denom
                    var = jnp.sum(
                        ((h - mean) ** 2) * weights[:, None], 0
                    ) / denom
                else:
                    mean = jnp.mean(h, axis=0)
                    var = jnp.var(h, axis=0)
                m = cfg.bn_momentum
                new_slayers.append(
                    {"mean": s["mean"] * m + mean * (1 - m),
                     "var": s["var"] * m + var * (1 - m)}
                )
            else:
                mean, var = s["mean"], s["var"]
                new_slayers.append(dict(s))
            h = (h - mean) * jax.lax.rsqrt(var + cfg.bn_eps)
            h = h * p["gamma"] + p["beta"]
        else:
            new_slayers.append(dict(s))
        rate = cfg.dropout[i] if i < len(cfg.dropout) else 0.0
        if train and rate > 0.0 and rng is not None:
            keep = 1.0 - rate
            mask = jax.random.bernoulli(drop_keys[i], keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
    return h, {"layers": new_slayers}


def predict_probs(cfg: MLPConfig, params: dict, state: dict, x) -> jnp.ndarray:
    """Softmax probabilities in eval mode — `model.predict` equivalent."""
    logits, _ = apply_mlp(cfg, params, state, x, train=False)
    return jax.nn.softmax(logits, axis=-1)


def dense_kernels(params: dict) -> list[jnp.ndarray]:
    """The list of Dense kernels W_1..W_m in forward order — the w_list the
    constraint engine operates on (`Voice digit recogniton/Constraints.py:61-67`)."""
    return [p["w"] for p in params["layers"]]


def set_dense_kernels(params: dict, ws: list[jnp.ndarray]) -> dict:
    """Functional update of all Dense kernels."""
    layers = [dict(p, w=w) for p, w in zip(params["layers"], ws)]
    return dict(params, layers=layers)
