"""Tensor-parallel training over a 2-D (data, model) mesh.

The reference has no parallelism at all (SURVEY.md §2.4), and this
workload's models (~1.7-2.8 M params) don't *need* tensor parallelism —
data parallelism is the honest scaling surface (`parallel/mesh.py`). This
module exists because the framework is a production TPU framework: it
demonstrates, tests, and ships the full sharding vocabulary so the same
code scales if the model family grows.

Megatron-style alternation over the 6-Dense MLP, expressed purely as GSPMD
sharding annotations — no hand-written collectives:

    hidden layer 0:  W P(None, 'model')   column-parallel — activations
                     b/BN P('model')      come out feature-sharded
    hidden layer 1:  W P('model', None)   row-parallel — XLA inserts the
                     b/BN P()             psum over 'model' (rides ICI)
    ... alternating; the output layer is row-parallel when its input
    arrives sharded.

Because BatchNorm/bias/ReLU/Dropout are feature-elementwise, a
column-parallel layer's BN parameters and moving stats shard with the
features and no resharding is needed between the matmul and the
normalization. Batch statistics still span the *global* batch (the batch
axis is sharded on 'data'; `jnp.mean` under SPMD inserts the cross-shard
reduction), so training math is identical to the single-device trainer —
asserted by `tests/test_parallel.py::TestTensorParallel` and the driver's
`__graft_entry__.dryrun_multichip`.

The train step itself is the UNMODIFIED `Trainer` step (forward + CCE +
backward + Adam + NonNeg + constraint projection, one jit): shardings are
carried by the arguments (`shard_mlp` / `make_train_state` place every
buffer), and jit compiles the SPMD program those placements imply. The
constraint projection's power-iteration matvecs run through sharded
kernels the same way — XLA reduces partial products over 'model'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mlp import MLPConfig, init_mlp
from ..train.trainer import Trainer
from .mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS",
    "tp_mesh",
    "mlp_tp_specs",
    "shard_mlp",
    "TensorParallelTrainer",
]

MODEL_AXIS = "model"


def tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D mesh: ('data', 'model'), data-major so 'model' collectives run
    between mesh-adjacent devices (ICI neighbors on a real slice)."""
    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _layer_specs(i: int, n_hidden: int) -> tuple[P, P]:
    """(kernel spec, feature spec) for Dense layer i under the alternation
    — the single source of truth for the TP layout.

    Feature spec covers bias, BN gamma/beta, and BN moving stats — all
    per-output-feature vectors."""
    if i == n_hidden:  # output layer: row-parallel iff its input is sharded
        if i > 0 and (i - 1) % 2 == 0:
            return P(MODEL_AXIS, None), P()
        return P(None, None), P()
    if i % 2 == 0:
        return P(None, MODEL_AXIS), P(MODEL_AXIS)
    return P(MODEL_AXIS, None), P()


def mlp_tp_specs(cfg: MLPConfig) -> tuple[dict, dict]:
    """PartitionSpec trees for (params, state) matching init_mlp's layout."""
    p_layers, s_layers = [], []
    n_hidden = len(cfg.hidden)
    for i in range(cfg.n_dense):
        w_spec, f_spec = _layer_specs(i, n_hidden)
        p = {"w": w_spec, "b": f_spec}
        s = {}
        if i < n_hidden and cfg.batch_norm:
            p["gamma"] = f_spec
            p["beta"] = f_spec
            s["mean"] = f_spec
            s["var"] = f_spec
        p_layers.append(p)
        s_layers.append(s)
    return {"layers": p_layers}, {"layers": s_layers}


def _check_divisible(cfg: MLPConfig, n_model: int) -> None:
    dims = (cfg.in_dim,) + tuple(cfg.hidden) + (cfg.n_classes,)
    for i in range(cfg.n_dense):
        w_spec, _ = _layer_specs(i, len(cfg.hidden))
        for axis, name in zip(w_spec, (dims[i], dims[i + 1])):
            if axis == MODEL_AXIS and name % n_model != 0:
                raise ValueError(
                    f"layer {i}: dim {name} not divisible by model axis "
                    f"size {n_model}"
                )


def shard_mlp(mesh: Mesh, params: dict, state: dict) -> tuple[dict, dict]:
    """Place a params/state tree onto the mesh with the TP shardings."""
    p_specs, s_specs = _specs_for_tree(params, state)

    def put(tree, specs):
        return jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
            tree, specs,
        )

    return put(params, p_specs), put(state, s_specs)


def _specs_for_tree(params: dict, state: dict) -> tuple[dict, dict]:
    """Derive specs from the tree itself (handles BN-present/absent layers
    without needing the MLPConfig); layout comes from `_layer_specs`."""
    n_hidden = len(params["layers"]) - 1
    p_layers, s_layers = [], []
    for i, (p, s) in enumerate(zip(params["layers"], state["layers"])):
        w_spec, f_spec = _layer_specs(i, n_hidden)
        p_layers.append({k: (w_spec if k == "w" else f_spec) for k in p})
        s_layers.append({k: f_spec for k in s})
    return {"layers": p_layers}, {"layers": s_layers}


class TensorParallelTrainer(Trainer):
    """Trainer whose buffers live TP-sharded on a ('data','model') mesh.

    The step program is inherited unchanged from `Trainer`; sharding comes
    entirely from buffer placement (params/opt/constraint via
    `make_train_state`, batches via `place_batch`), and XLA compiles the
    matching SPMD program — column/row-parallel matmuls with psum over
    'model', gradient all-reduce over 'data'.
    """

    def __init__(self, model_cfg: MLPConfig, mesh: Mesh, train_cfg=None,
                 **kw):
        if mesh.axis_names != (DATA_AXIS, MODEL_AXIS):
            raise ValueError(
                f"mesh axes must be ({DATA_AXIS!r}, {MODEL_AXIS!r})"
            )
        _check_divisible(model_cfg, mesh.shape[MODEL_AXIS])
        if train_cfg is not None and train_cfg.device_resident:
            # build_epoch_fn pins params/opt_state to replicated (P()) on
            # its 1-D-mesh assumption; running it under a TP trainer would
            # silently reshard the TP placements away on the first dispatch
            # and train unsharded. Refuse rather than lie.
            raise NotImplementedError(
                "TensorParallelTrainer does not support "
                "device_resident=True (the fused epoch program would "
                "replicate the TP-sharded buffers); use the streaming fit"
            )
        self.mesh = mesh
        super().__init__(model_cfg, train_cfg, **kw)

    def make_train_state(self, key=None):
        """-> (params, state, opt_state, cstate), every leaf placed with
        its TP sharding (opt-state/constraint-state inherit via jit)."""
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        params, state = init_mlp(self.model_cfg, key)
        params, state = shard_mlp(self.mesh, params, state)
        # jit follows input shardings: Adam mu/nu come out sharded like the
        # params they mirror, count replicated
        opt_state = jax.jit(self.optimizer.init)(params)
        return params, state, opt_state, self._place_cstate()

    def _place_cstate(self):
        """Replicate self.constraint_state on the mesh via a fresh copy —
        device_put ALIASES an already-identically-sharded array, and the
        donating train step would then delete the caller-owned buffer
        (self.constraint_state itself on a warm restart)."""
        cstate = self.constraint_state
        if cstate is None:
            return None
        return jax.device_put(jax.tree.map(jnp.array, cstate),
                              NamedSharding(self.mesh, P()))

    def place_batch(self, x, y):
        """Shard a host batch on the 'data' axis (replicated over 'model').
        Batch size must divide the data-axis size."""
        xs = NamedSharding(self.mesh, P(DATA_AXIS, None))
        ys = NamedSharding(self.mesh, P(DATA_AXIS))
        return (
            jax.device_put(np.asarray(x, np.float32), xs),
            jax.device_put(np.asarray(y, np.int32), ys),
        )

    # fit() hooks: route the inherited loop through the TP placements so
    # tp.fit() actually trains sharded (previously it fell back to the base
    # trainer's unsharded init_mlp/numpy-batch path).
    def _init_train_state(self, key):
        return self.make_train_state(key)

    def _adopt_train_state(self, params, state, opt_state=None):
        # warm-start fit(params=..., state=...): copy (the steps donate
        # their inputs; device_put can alias already-identically-sharded
        # arrays) and re-place with the TP shardings
        if opt_state is not None:
            raise NotImplementedError(
                "TensorParallelTrainer cannot adopt a restored optimizer "
                "state yet (its leaves would need re-placing with the TP "
                "shardings); resume with params/state only"
            )
        params = jax.tree.map(jnp.array, params)
        state = jax.tree.map(jnp.array, state)
        params, state = shard_mlp(self.mesh, params, state)
        opt_state = jax.jit(self.optimizer.init)(params)
        return params, state, opt_state, self._place_cstate()

    def _place_batch(self, x, y):
        n_data = self.mesh.shape[DATA_AXIS]
        if len(x) % n_data:
            # ragged final batch can't split evenly on 'data'; let jit
            # replicate it — the SPMD program stays correct, just slower
            # for this one batch
            return x, y
        return self.place_batch(x, y)
