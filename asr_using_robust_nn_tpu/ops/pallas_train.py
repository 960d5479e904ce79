"""Fused constrained train step as ONE Pallas TPU kernel.

The XLA fused-epoch path (train/epoch_scan.py) is HBM-roofline-bound: a
1.65M-param constrained step moves ~100+ MB — the weights are read for the
forward AND the backward GEMMs, the gradients materialize in HBM, Adam
re-reads weights+moments and writes all three back, the power-iteration
projection re-reads every kernel, and the rescale is one more read+write
(docs/ARCHITECTURE.md roofline; VERDICT r3 item 2). XLA cannot keep the
weights resident across those op boundaries.

This kernel can. One `pallas_call` per train step:

  - the bf16 compute copies of all Dense kernels are DMA'd HBM->VMEM ONCE
    and stay resident through forward, backward, the Adam tile loop, the
    NonNeg clamp, the product power iteration, AND the constraint rescale;
  - gradients NEVER touch HBM: dW is produced tile-by-tile on the MXU and
    consumed immediately by a streamed Adam update (f32 master weights and
    moments round-trip HBM exactly once per step, in row tiles);
  - the power iteration's matvecs read the VMEM-resident bf16 kernels —
    the projection's HBM traffic term (2*n_iter kernel reads per step on
    the XLA path) drops to ZERO;
  - the constraint rescale multiplies the VMEM copy in place; the f32
    masters absorb the factor LAZILY at the next step's Adam load (the
    `scales` vector carries exactly one step of deferred scaling), so the
    rescale's HBM read+write disappears too.

Per-step HBM traffic drops to: batch in + bf16 kernels in/out + f32
masters in/out + moments in/out (~48 MB at the digit recipe vs ~100+ MB) —
and the MXU work overlaps the streaming.

Numerics: Dense matmuls run bf16 with f32 accumulation and activations are
STORED bf16 for the backward pass — the same equivalence class as
`MLPConfig.with_bf16()` (parity-gated at <2% trained accuracy,
tests/test_models_train.py). BatchNorm statistics/backward, softmax/CCE,
Adam math, and the constraint recurrence all run f32. Dropout uses the TPU
hardware PRNG (`pltpu.prng_*`), regenerated (not stored) in the backward
pass — distributionally equivalent to, but not bit-matched with, the XLA
path's threefry draws (documented divergence; dropout=0 paths are
value-comparable).

Semantics mirrored from the reference recipe exactly where it matters:
update order is Adam -> NonNeg clamp -> simple_norm projection (the
callback ordering of `Voice digit recogniton/train_constraints.py:97-105`,
SURVEY.md §3.3); the projection is the exact scalar recurrence of
`constraints/engine.py::make_simple_norm_constraint` (sequential
live-weight semantics collapsed per its derivation); BN uses row-weighted
batch moments so padded rows are excluded exactly like
`train/epoch_scan.py::_masked_forward_loss`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import MLPConfig

__all__ = ["FusedStepSpec", "pack_state", "unpack_params",
           "build_fused_step", "build_fused_epoch_call",
           "build_fused_epoch_fn"]

_LANE = 128


def _pad_to(n: int, m: int = _LANE) -> int:
    return -(-n // m) * m


@dataclass(frozen=True)
class FusedStepSpec:
    """Static geometry + hyperparameters of one fused step program."""

    cfg: MLPConfig
    batch: int
    lr: float = 1e-3
    rho: float | None = None     # simple_norm strength; None = no constraint
    pi_iters: int = 4            # power-iteration steps per batch
    adam_tile: int = 128         # Adam/master streaming row-tile
    interpret: bool = False      # pallas interpreter (CPU tests)

    @property
    def dims(self) -> tuple[int, ...]:
        c = self.cfg
        return (c.in_dim,) + tuple(c.hidden) + (c.n_classes,)

    @property
    def pdims(self) -> tuple[int, ...]:
        return tuple(_pad_to(d) for d in self.dims)

    @property
    def n_layers(self) -> int:
        return len(self.dims) - 1

    @property
    def dmax(self) -> int:
        return max(self.pdims[1:])

    def tiles(self, i: int) -> int:
        return -(-self.pdims[i] // self.adam_tile)


# --------------------------------------------------------------------------
# state packing: standard (params, state, opt_state-like) <-> padded arrays
# --------------------------------------------------------------------------

def pack_state(spec: FusedStepSpec, params, state):
    """-> fstate dict of padded device arrays. Adam moments start at zero
    (pass through an existing fstate to continue them); `scales` starts at
    1 (no deferred constraint factor); `count` at 0."""
    c, pd = spec.cfg, spec.pdims
    m = spec.n_layers
    masters, w16 = [], []
    for i, p in enumerate(params["layers"]):
        w = np.zeros((pd[i], pd[i + 1]), np.float32)
        w[: spec.dims[i], : spec.dims[i + 1]] = np.asarray(p["w"])
        masters.append(jnp.asarray(w))
        w16.append(jnp.asarray(w, jnp.bfloat16))
    mw = [jnp.zeros_like(x) for x in masters]
    vw = [jnp.zeros_like(x) for x in masters]

    def stack_vec(getter, n_rows=m, dtype=np.float32, fill=0.0):
        a = np.full((n_rows, spec.dmax), fill, dtype)
        for i in range(n_rows):
            v = getter(i)
            if v is not None:
                v = np.asarray(v)
                a[i, : v.shape[0]] = v
        return jnp.asarray(a)

    small = {
        "b": stack_vec(lambda i: params["layers"][i]["b"]),
        "gamma": stack_vec(
            lambda i: params["layers"][i].get("gamma")
            if i < m - 1 else None),
        "beta": stack_vec(
            lambda i: params["layers"][i].get("beta")
            if i < m - 1 else None),
        "rmean": stack_vec(
            lambda i: state["layers"][i].get("mean")
            if i < m - 1 else None),
        "rvar": stack_vec(
            lambda i: state["layers"][i].get("var")
            if i < m - 1 else None),
    }
    for k in ("b", "gamma", "beta"):
        small["m_" + k] = jnp.zeros_like(small[k])
        small["v_" + k] = jnp.zeros_like(small[k])
    u = jax.random.normal(jax.random.PRNGKey(23), (1, pd[-1]), jnp.float32)
    return {
        "masters": tuple(masters), "w16": tuple(w16),
        "mw": tuple(mw), "vw": tuple(vw),
        "small": small,
        "scales": jnp.ones((1, _LANE), jnp.float32),
        "u": u,
        "count": jnp.zeros((1,), jnp.int32),
    }


def unpack_params(spec: FusedStepSpec, fstate):
    """fstate -> (params, state) in the standard pytree layout, with the
    deferred constraint scales folded into the returned kernels."""
    c = spec.cfg
    m = spec.n_layers
    layers, slayers = [], []
    sm = fstate["small"]
    for i in range(m):
        w = (fstate["masters"][i] * fstate["scales"][0, i])[
            : spec.dims[i], : spec.dims[i + 1]]
        p = {"w": w, "b": sm["b"][i, : spec.dims[i + 1]]}
        s = {}
        if i < m - 1 and c.batch_norm:
            p["gamma"] = sm["gamma"][i, : spec.dims[i + 1]]
            p["beta"] = sm["beta"][i, : spec.dims[i + 1]]
            s["mean"] = sm["rmean"][i, : spec.dims[i + 1]]
            s["var"] = sm["rvar"][i, : spec.dims[i + 1]]
        layers.append(p)
        slayers.append(s)
    return {"layers": layers}, {"layers": slayers}


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _make_kernel(spec: FusedStepSpec):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = spec.cfg
    m = spec.n_layers
    pd = spec.pdims
    B = spec.batch
    eps_bn = c.bn_eps
    mom = c.bn_momentum
    b1, b2, eps_adam = 0.9, 0.999, 1e-7
    eps_spacing = float(np.spacing(1.0))
    drops = tuple(
        (c.dropout[i] if i < len(c.dropout) else 0.0) for i in range(m - 1))
    use_bn = c.batch_norm
    T = spec.adam_tile

    def kernel(*refs):
        it = iter(refs)
        # ---- inputs (order mirrors build_fused_step's operand list) ----
        seed_ref = next(it)            # SMEM (1,) int32
        count_ref = next(it)           # SMEM (1,) int32
        x_ref = next(it)               # (B, pd0) f32 VMEM
        y_ref = next(it)               # (B, 1) int32 VMEM
        wrow_ref = next(it)            # (B, 1) f32 VMEM
        scales_ref = next(it)          # (1, LANE) f32 VMEM
        u_ref = next(it)               # (1, pd[-1]) f32 VMEM
        w16_in = [next(it) for _ in range(m)]    # ANY (HBM)
        mast_in = [next(it) for _ in range(m)]   # ANY
        mw_in = [next(it) for _ in range(m)]     # ANY
        vw_in = [next(it) for _ in range(m)]     # ANY
        sm_in = {k: next(it) for k in _SMALL_KEYS}  # VMEM (m, dmax) f32
        # ---- outputs ----
        w16_out = [next(it) for _ in range(m)]   # ANY (aliased)
        mast_out = [next(it) for _ in range(m)]  # ANY (aliased)
        mw_out = [next(it) for _ in range(m)]    # ANY (aliased)
        vw_out = [next(it) for _ in range(m)]    # ANY (aliased)
        sm_out = {k: next(it) for k in _SMALL_KEYS}  # VMEM
        scales_out = next(it)          # (1, LANE)
        u_out = next(it)               # (1, pd[-1])
        count_out = next(it)           # SMEM (1,)
        loss_ref = next(it)            # (1, 1) f32 VMEM
        acc_ref = next(it)             # (1, 1) f32 VMEM
        # ---- scratch ----
        w16 = [next(it) for _ in range(m)]       # VMEM bf16, resident
        acts = [next(it) for _ in range(m)]      # VMEM bf16 (B, pd[i]):
        # layer-i INPUT (acts[0] = cast of x)
        xhats = [next(it) for _ in range(m - 1)]  # VMEM bf16 (B, pd[i+1])
        muvec = next(it)               # VMEM f32 (m, dmax): batch mean
        sdvec = next(it)               # VMEM f32 (m, dmax): rsqrt(var+eps)
        da_buf = next(it)              # VMEM f32 (B, dmax) backward carry
        probs_buf = next(it)           # VMEM f32 (B, pd[-1])
        mtile = next(it)               # VMEM f32 (T, dmax) master tile
        mwtile = next(it)              # VMEM f32 (T, dmax)
        vwtile = next(it)              # VMEM f32 (T, dmax)
        rowpad = next(it)              # VMEM f32 (1, dmax) pad scratch
        copy_sems = next(it)           # DMA sems (m,)
        tile_sems = next(it)           # DMA sems (4,)

        def padrow(row):
            """(d,) -> (dmax,) zero-padded via the scratch ref — Mosaic
            cannot lower misaligned 1-D concatenates (`tpu.concatenate`
            "input offsets outside of the first tile"), but partial-row
            stores are fine. Sequential reuse of one scratch is safe: the
            kernel body is a single in-order program."""
            d = row.shape[0]
            if d == spec.dmax:
                return row
            rowpad[0, :] = jnp.zeros((spec.dmax,), jnp.float32)
            rowpad[0, :d] = row
            return rowpad[0, :]

        seed0 = seed_ref[0]
        denom = jnp.sum(wrow_ref[:]) + 1e-9

        # ---- stage the bf16 kernels into VMEM (resident for the step) ----
        for i in range(m):
            pltpu.make_async_copy(w16_in[i], w16[i], copy_sems.at[i]).start()
        for i in range(m):
            pltpu.make_async_copy(w16_in[i], w16[i], copy_sems.at[i]).wait()

        # ---- forward ----
        acts[0][:] = x_ref[:].astype(jnp.bfloat16)
        logits = None
        for i in range(m):
            z = jax.lax.dot(acts[i][:], w16[i][:],
                            preferred_element_type=jnp.float32)
            z = z + sm_in["b"][i, : pd[i + 1]][None, :]
            if i == m - 1:
                cmask = jax.lax.broadcasted_iota(
                    jnp.int32, (1, pd[-1]), 1) >= c.n_classes
                logits = jnp.where(cmask, -1e9, z)
                break
            a = jnp.maximum(z, 0.0)
            if use_bn:
                w_col = wrow_ref[:]
                mu = jnp.sum(a * w_col, axis=0, keepdims=True) / denom
                var = jnp.sum(((a - mu) ** 2) * w_col, axis=0,
                              keepdims=True) / denom
                sdinv = jax.lax.rsqrt(var + eps_bn)
                muvec[i, : pd[i + 1]] = mu[0]
                sdvec[i, : pd[i + 1]] = sdinv[0]
                xh = (a - mu) * sdinv
                xhats[i][:] = xh.astype(jnp.bfloat16)
                out = (xh * sm_in["gamma"][i, : pd[i + 1]][None, :]
                       + sm_in["beta"][i, : pd[i + 1]][None, :])
                sm_out["rmean"][i, :] = (mom * sm_in["rmean"][i, :]
                                         + (1 - mom) * padrow(mu[0]))
                sm_out["rvar"][i, :] = (mom * sm_in["rvar"][i, :]
                                        + (1 - mom) * padrow(var[0]))
            else:
                out = a
                muvec[i, : pd[i + 1]] = jnp.zeros((pd[i + 1],), jnp.float32)
                sdvec[i, : pd[i + 1]] = jnp.ones((pd[i + 1],), jnp.float32)
                xhats[i][:] = a.astype(jnp.bfloat16)
                sm_out["rmean"][i, :] = sm_in["rmean"][i, :]
                sm_out["rvar"][i, :] = sm_in["rvar"][i, :]
            if drops[i] > 0.0:
                keep = 1.0 - drops[i]
                pltpu.prng_seed(seed0 + i)
                bits = pltpu.prng_random_bits((B, pd[i + 1]))
                un = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                out = jnp.where(un < keep, out / keep, 0.0)
            acts[i + 1][:] = out.astype(jnp.bfloat16)

        # ---- loss / accuracy / output-layer gradient ----
        zmax = jnp.max(logits, axis=1, keepdims=True)
        ez = jnp.exp(logits - zmax)
        sez = jnp.sum(ez, axis=1, keepdims=True)
        probs_buf[:] = ez / sez
        cls = jax.lax.broadcasted_iota(jnp.int32, (B, pd[-1]), 1)
        onehot = (cls == y_ref[:]).astype(jnp.float32)
        logp = logits - zmax - jnp.log(sez)
        nll = -jnp.sum(logp * onehot, axis=1, keepdims=True)
        w_col = wrow_ref[:]
        # (1, 1)-shaped stores: Mosaic rejects scalar stores to VMEM
        loss_ref[:] = (jnp.sum(nll * w_col) / denom).reshape(1, 1)
        pred = jnp.argmax(logits, axis=1).reshape(B, 1)
        acc_ref[:] = (jnp.sum(
            (pred == y_ref[:]).astype(jnp.float32) * w_col) / denom
        ).reshape(1, 1)

        # ---- Adam schedule scalars ----
        t = (count_ref[0] + 1).astype(jnp.float32)
        # b**t as exp(t*log(b)): Mosaic has no math.powf legalization
        bc1 = 1.0 - jnp.exp(t * float(np.log(b1)))
        bc2 = 1.0 - jnp.exp(t * float(np.log(b2)))
        count_out[0] = count_ref[0] + 1

        def adam_stream(i, dz):
            """Tile loop: dW = acts[i]^T @ dz fused with the streamed Adam
            update of layer i's f32 master + moments; the updated (clamped)
            weights land in the VMEM-resident bf16 copy. The deferred
            constraint factor from the PREVIOUS step is folded into the
            master here (one multiply at load), so the rescale pass never
            re-touches HBM."""
            dout = pd[i + 1]
            s_prev = scales_ref[0, i]
            dzb = dz.astype(jnp.bfloat16)
            for tt in range(spec.tiles(i)):
                r0 = tt * T
                rows = min(T, pd[i] - r0)
                cp = [pltpu.make_async_copy(
                    mast_in[i].at[pl.ds(r0, rows), :],
                    mtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    tile_sems.at[0]),
                    pltpu.make_async_copy(
                    mw_in[i].at[pl.ds(r0, rows), :],
                    mwtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    tile_sems.at[1]),
                    pltpu.make_async_copy(
                    vw_in[i].at[pl.ds(r0, rows), :],
                    vwtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    tile_sems.at[2])]
                for cc in cp:
                    cc.start()
                xt = acts[i][:, pl.ds(r0, rows)]
                g = jax.lax.dot_general(
                    xt, dzb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (rows, dout)
                for cc in cp:
                    cc.wait()
                mt = mtile[pl.ds(0, rows), pl.ds(0, dout)] * s_prev
                m_ = b1 * mwtile[pl.ds(0, rows), pl.ds(0, dout)] + (
                    1 - b1) * g
                v_ = b2 * vwtile[pl.ds(0, rows), pl.ds(0, dout)] + (
                    1 - b2) * g * g
                upd = (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps_adam)
                wn = mt - spec.lr * upd
                if c.nonneg:
                    wn = jnp.maximum(wn, 0.0)
                mtile[pl.ds(0, rows), pl.ds(0, dout)] = wn
                mwtile[pl.ds(0, rows), pl.ds(0, dout)] = m_
                vwtile[pl.ds(0, rows), pl.ds(0, dout)] = v_
                w16[i][pl.ds(r0, rows), :] = wn.astype(jnp.bfloat16)
                wb = [pltpu.make_async_copy(
                    mtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    mast_out[i].at[pl.ds(r0, rows), :],
                    tile_sems.at[0]),
                    pltpu.make_async_copy(
                    mwtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    mw_out[i].at[pl.ds(r0, rows), :],
                    tile_sems.at[1]),
                    pltpu.make_async_copy(
                    vwtile.at[pl.ds(0, rows), pl.ds(0, dout)],
                    vw_out[i].at[pl.ds(r0, rows), :],
                    tile_sems.at[2])]
                for cc in wb:
                    cc.start()
                for cc in wb:
                    cc.wait()

        def small_adam(key, i, g_row, dout):
            mk, vk = "m_" + key, "v_" + key
            gpad = padrow(g_row)
            m_ = b1 * sm_in[mk][i, :] + (1 - b1) * gpad
            v_ = b2 * sm_in[vk][i, :] + (1 - b2) * gpad * gpad
            upd = (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps_adam)
            sm_out[key][i, :] = sm_in[key][i, :] - spec.lr * upd
            sm_out[mk][i, :] = m_
            sm_out[vk][i, :] = v_

        # ---- backward (last -> first), Adam fused into each layer ----
        dz_last = (probs_buf[:] - onehot) * w_col / denom  # (B, pd[-1])
        for i in range(m - 1, -1, -1):
            dout = pd[i + 1]
            if i == m - 1:
                dz = dz_last
            else:
                dD = da_buf[:, pl.ds(0, dout)]
                if drops[i] > 0.0:
                    keep = 1.0 - drops[i]
                    pltpu.prng_seed(seed0 + i)  # same stream as forward
                    bits = pltpu.prng_random_bits((B, dout))
                    un = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                    dD = jnp.where(un < keep, dD / keep, 0.0)
                xh = xhats[i][:].astype(jnp.float32)
                if use_bn:
                    dgamma = jnp.sum(dD * xh, axis=0)
                    dbeta = jnp.sum(dD, axis=0)
                    # read gamma BEFORE its Adam write: the small arrays
                    # are input/output-ALIASED, so sm_out writes land in
                    # the same buffer sm_in reads from
                    dxh = dD * sm_in["gamma"][i, : dout][None, :]
                    small_adam("gamma", i, dgamma, dout)
                    small_adam("beta", i, dbeta, dout)
                    s1 = jnp.sum(dxh, axis=0, keepdims=True)
                    s2 = jnp.sum(dxh * xh, axis=0, keepdims=True)
                    sd = sdvec[i, : dout][None, :]
                    da = sd * (dxh - (w_col / denom) * s1
                               - (w_col / denom) * xh * s2)
                else:
                    sm_out["gamma"][i, :] = sm_in["gamma"][i, :]
                    sm_out["beta"][i, :] = sm_in["beta"][i, :]
                    sm_out["m_gamma"][i, :] = sm_in["m_gamma"][i, :]
                    sm_out["v_gamma"][i, :] = sm_in["v_gamma"][i, :]
                    sm_out["m_beta"][i, :] = sm_in["m_beta"][i, :]
                    sm_out["v_beta"][i, :] = sm_in["v_beta"][i, :]
                    da = dD
                # relu mask: a > 0  <=>  xhat > -mu * sdinv (BN case) /
                # xhats stores a itself when BN is off
                if use_bn:
                    thr = (-muvec[i, : dout] * sdvec[i, : dout])[None, :]
                    relu_mask = xh > thr
                else:
                    relu_mask = xh > 0.0
                dz = jnp.where(relu_mask, da, 0.0)
            db = jnp.sum(dz, axis=0)
            small_adam("b", i, db, dout)
            if i > 0:
                # dX BEFORE the in-place weight update of layer i
                dx = jax.lax.dot_general(
                    dz.astype(jnp.bfloat16), w16[i][:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, pd[i])
                adam_stream(i, dz)
                da_buf[:, pl.ds(0, pd[i])] = dx
            else:
                adam_stream(i, dz)
        # rows of gamma/beta for the output layer stay untouched
        if use_bn:
            i = m - 1
            sm_out["gamma"][i, :] = sm_in["gamma"][i, :]
            sm_out["beta"][i, :] = sm_in["beta"][i, :]
            sm_out["m_gamma"][i, :] = sm_in["m_gamma"][i, :]
            sm_out["v_gamma"][i, :] = sm_in["v_gamma"][i, :]
            sm_out["m_beta"][i, :] = sm_in["m_beta"][i, :]
            sm_out["v_beta"][i, :] = sm_in["v_beta"][i, :]
            sm_out["rmean"][m - 1, :] = sm_in["rmean"][m - 1, :]
            sm_out["rvar"][m - 1, :] = sm_in["rvar"][m - 1, :]

        # ---- constraint: power iteration on the RESIDENT kernels ----
        if spec.rho is not None:
            u = u_ref[:]  # (1, pd[-1])
            u = u / (jnp.sqrt(jnp.sum(u * u)) + eps_spacing)

            def matvec_pt(vec):  # P^T u = W_1 ... W_m u  (vec: (1, pd[-1]))
                x = vec
                for j in range(m - 1, -1, -1):
                    x = jax.lax.dot_general(
                        x.astype(jnp.bfloat16), w16[j][:],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return x  # (1, pd[0])

            def matvec_p(vec):   # P v = W_m^T ... W_1^T v (vec: (1, pd[0]))
                x = vec
                for j in range(m):
                    x = jax.lax.dot(
                        x.astype(jnp.bfloat16), w16[j][:],
                        preferred_element_type=jnp.float32)
                return x  # (1, pd[-1])

            for _ in range(spec.pi_iters):
                v = matvec_pt(u)
                v = v / (jnp.sqrt(jnp.sum(v * v)) + eps_spacing)
                u = matvec_p(v)
                u = u / (jnp.sqrt(jnp.sum(u * u)) + eps_spacing)
            v = matvec_pt(u)
            v = v / (jnp.sqrt(jnp.sum(v * v)) + eps_spacing)
            sigma = jnp.sum(u * matvec_p(v))
            u_out[:] = u
            # exact scalar recurrence (constraints/engine.py:133-166).
            # Per-column select instead of .at[].set (Mosaic has no
            # scatter lowering).
            col = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
            sc = jnp.ones((1, _LANE), jnp.float32)
            for i in range(m):
                # x**(1/m) as exp(log(x)/m) (no powf in Mosaic); sigma > 0
                f = jnp.exp(
                    jnp.log(spec.rho / (sigma + eps_spacing)) * (1.0 / m))
                w16[i][:] = (w16[i][:].astype(jnp.float32) * f).astype(
                    jnp.bfloat16)
                sc = jnp.where(col == i, f, sc)
                sigma = sigma * f
            scales_out[:] = sc
        else:
            u_out[:] = u_ref[:]
            scales_out[:] = jnp.ones((1, _LANE), jnp.float32)

        # ---- ship the updated resident kernels back to HBM ----
        for i in range(m):
            pltpu.make_async_copy(w16[i], w16_out[i], copy_sems.at[i]).start()
        for i in range(m):
            pltpu.make_async_copy(w16[i], w16_out[i], copy_sems.at[i]).wait()

    return kernel


_SMALL_KEYS = ("b", "m_b", "v_b", "gamma", "m_gamma", "v_gamma",
               "beta", "m_beta", "v_beta", "rmean", "rvar")


# --------------------------------------------------------------------------
# the EPOCH kernel: grid over steps, weights resident across the whole epoch
# --------------------------------------------------------------------------

def _make_epoch_kernel(spec: FusedStepSpec, n_batches: int):
    """One pallas_call per EPOCH: `grid=(n_batches,)` with every weight,
    Adam-moment, and BN array bound to a CONSTANT-index VMEM block — the
    Mosaic pipeline fetches those blocks once before step 0 and writes
    them back once after the last step, so the only per-step HBM traffic
    is the batch block (xs/ys/ws) streaming in. Per-epoch traffic at the
    digit recipe: ~66 MB (gathered batches) + ~27 MB weights/moments
    in+out ONCE, vs n_batches x ~48 MB for the per-step kernel (whose
    serialized tile DMAs measured 3.8x SLOWER than the XLA epoch on v5e —
    the measured negative that motivated this kernel; see bench
    `fused_epoch_ms_by_variant`).

    The step math is the per-step kernel's exactly, with two structural
    simplifications possible only at epoch scope: (1) Adam updates write
    the resident f32 masters/moments in place — no tile streaming, no
    deferred `scales` vector (the constraint rescale multiplies the
    resident masters directly); (2) the first grid step copies the input
    blocks into the aliased output blocks (`@pl.when(step == 0)`), after
    which every step reads and writes the outputs only — the canonical
    Mosaic accumulator pattern.

    MEASURED VERDICT (v5e, digit recipe 16566 rows, arbitrated 2026-08-20
    by `tools/ab_epoch.py`: paired, order-balanced, TWO epochs-per-call
    points, chains floored to >=128 epochs/leg, contention sentinel
    clean): **this kernel WINS at 2.3-2.9 ms/epoch vs the XLA lean
    epoch's 5.2-5.4 and lean_pi1's 5.1** — ~2x, with the numeric parity
    gate (`epoch_parity_vs_xla`) passing at bf16-class tolerances. It is
    the PRODUCTION fused-epoch path (bench winner key, gated). History of
    the round-4 contradiction this arbitration resolved (VERDICT r4 weak-
    item 1): a 2026-08-19 builder-window A/B recorded 8.6-9.4 ms/epoch —
    that measurement used 1-call chains, where the tunnel's per-dispatch
    jitter (tens of ms, window-dependent) lands directly on the estimate;
    the driver's BENCH_r04 2.07 ms (39% MFU) was right. The two-epc fit
    confirms the win is compute, not dispatch amortization: compute-only
    2.87 ms/epoch vs lean's 5.24. The product power iteration inside
    costs ~1.0 ms/epoch (weights VMEM-resident) vs ~3.3 ms/epoch as XLA
    ops — also extracted into ops/pallas_spectral.py for the XLA epoch's
    constraint.

    Window-sensitivity addendum (2026-08-21): with a concurrent Keras run
    saturating this VM's single host core, an in-bench measurement put
    this kernel at 8.1 ms/epoch while the XLA arms held their usual
    4.0-5.5 — the kernel's dispatch path is markedly more sensitive to
    host starvation than XLA's (tunnel artifact; real TPU VMs don't run
    the trainer against a starved host). Mechanisms that keep the
    headline honest either way: bench's per-window winner key only
    crowns the measured winner (that window correctly fell back to
    lean_pi1), and the sentinel now carries a loadavg leg so a loaded
    host marks the run suspect.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = spec.cfg
    m = spec.n_layers
    pd = spec.pdims
    B = spec.batch
    eps_bn = c.bn_eps
    mom = c.bn_momentum
    b1, b2, eps_adam = 0.9, 0.999, 1e-7
    eps_spacing = float(np.spacing(1.0))
    drops = tuple(
        (c.dropout[i] if i < len(c.dropout) else 0.0) for i in range(m - 1))
    use_bn = c.batch_norm

    def kernel(*refs):
        it = iter(refs)
        # ---- inputs ----
        seeds_ref = next(it)           # SMEM (n_batches,) int32, whole
        count_ref = next(it)           # SMEM (1,) int32, whole
        x_ref = next(it)               # VMEM (1, B, pd0) block (this step)
        y_ref = next(it)               # VMEM (1, B, 1) int32 block
        wrow_ref3 = next(it)           # VMEM (1, B, 1) f32 block
        u_in = next(it)                # VMEM (1, pd[-1]) constant block
        mast_in = [next(it) for _ in range(m)]   # VMEM constant blocks
        mw_in = [next(it) for _ in range(m)]
        vw_in = [next(it) for _ in range(m)]
        sm_in = {k: next(it) for k in _SMALL_KEYS}
        # ---- outputs (aliased; VMEM-resident across the grid) ----
        mast = [next(it) for _ in range(m)]
        mw = [next(it) for _ in range(m)]
        vw = [next(it) for _ in range(m)]
        sm = {k: next(it) for k in _SMALL_KEYS}
        u_ref = next(it)               # (1, pd[-1])
        count_out = next(it)           # SMEM (1,)
        loss_ref = next(it)            # VMEM (n_batches, 1), resident
        acc_ref = next(it)             # VMEM (n_batches, 1), resident
        # ---- scratch (persist across grid steps; re-written each step
        # except w16, which carries the updated weights forward) ----
        w16 = [next(it) for _ in range(m)]        # bf16 compute copies
        acts = [next(it) for _ in range(m)]
        xhats = [next(it) for _ in range(m - 1)]
        muvec = next(it)
        sdvec = next(it)
        da_buf = next(it)
        probs_buf = next(it)
        rowpad = next(it)

        step_i = pl.program_id(0)

        @pl.when(step_i == 0)
        def _init():
            for j in range(m):
                mast[j][:] = mast_in[j][:]
                mw[j][:] = mw_in[j][:]
                vw[j][:] = vw_in[j][:]
                w16[j][:] = mast_in[j][:].astype(jnp.bfloat16)
            for k in _SMALL_KEYS:
                sm[k][:] = sm_in[k][:]
            u_ref[:] = u_in[:]

        def padrow(row):
            d = row.shape[0]
            if d == spec.dmax:
                return row
            rowpad[0, :] = jnp.zeros((spec.dmax,), jnp.float32)
            rowpad[0, :d] = row
            return rowpad[0, :]

        seed0 = seeds_ref[step_i]
        wrow = wrow_ref3[0]            # (B, 1)
        y2 = y_ref[0]                  # (B, 1)
        denom = jnp.sum(wrow) + 1e-9

        # ---- forward (reads the RESIDENT weights/smalls) ----
        acts[0][:] = x_ref[0].astype(jnp.bfloat16)
        logits = None
        for i in range(m):
            z = jax.lax.dot(acts[i][:], w16[i][:],
                            preferred_element_type=jnp.float32)
            z = z + sm["b"][i, : pd[i + 1]][None, :]
            if i == m - 1:
                cmask = jax.lax.broadcasted_iota(
                    jnp.int32, (1, pd[-1]), 1) >= c.n_classes
                logits = jnp.where(cmask, -1e9, z)
                break
            a = jnp.maximum(z, 0.0)
            if use_bn:
                mu = jnp.sum(a * wrow, axis=0, keepdims=True) / denom
                var = jnp.sum(((a - mu) ** 2) * wrow, axis=0,
                              keepdims=True) / denom
                sdinv = jax.lax.rsqrt(var + eps_bn)
                muvec[i, : pd[i + 1]] = mu[0]
                sdvec[i, : pd[i + 1]] = sdinv[0]
                xh = (a - mu) * sdinv
                xhats[i][:] = xh.astype(jnp.bfloat16)
                out = (xh * sm["gamma"][i, : pd[i + 1]][None, :]
                       + sm["beta"][i, : pd[i + 1]][None, :])
                sm["rmean"][i, :] = (mom * sm["rmean"][i, :]
                                     + (1 - mom) * padrow(mu[0]))
                sm["rvar"][i, :] = (mom * sm["rvar"][i, :]
                                    + (1 - mom) * padrow(var[0]))
            else:
                out = a
                muvec[i, : pd[i + 1]] = jnp.zeros((pd[i + 1],), jnp.float32)
                sdvec[i, : pd[i + 1]] = jnp.ones((pd[i + 1],), jnp.float32)
                xhats[i][:] = a.astype(jnp.bfloat16)
            if drops[i] > 0.0:
                keep = 1.0 - drops[i]
                pltpu.prng_seed(seed0 + i)
                bits = pltpu.prng_random_bits((B, pd[i + 1]))
                un = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                out = jnp.where(un < keep, out / keep, 0.0)
            acts[i + 1][:] = out.astype(jnp.bfloat16)

        # ---- loss / accuracy ----
        zmax = jnp.max(logits, axis=1, keepdims=True)
        ez = jnp.exp(logits - zmax)
        sez = jnp.sum(ez, axis=1, keepdims=True)
        probs_buf[:] = ez / sez
        cls = jax.lax.broadcasted_iota(jnp.int32, (B, pd[-1]), 1)
        onehot = (cls == y2).astype(jnp.float32)
        logp = logits - zmax - jnp.log(sez)
        nll = -jnp.sum(logp * onehot, axis=1, keepdims=True)
        # per-step rows of the RESIDENT (n_batches, 1) outputs: a (1, 1)
        # moving block would violate Mosaic's (8, 128)-divisibility rule
        # for non-full blocks, so the whole vector stays in VMEM and each
        # step writes its own row at a dynamic index
        loss_ref[pl.ds(step_i, 1), :] = (
            jnp.sum(nll * wrow) / denom).reshape(1, 1)
        pred = jnp.argmax(logits, axis=1).reshape(B, 1)
        acc_ref[pl.ds(step_i, 1), :] = (jnp.sum(
            (pred == y2).astype(jnp.float32) * wrow) / denom).reshape(1, 1)

        # ---- Adam scalars: t advances per grid step ----
        t = (count_ref[0] + step_i + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(t * float(np.log(b1)))
        bc2 = 1.0 - jnp.exp(t * float(np.log(b2)))
        count_out[0] = count_ref[0] + n_batches

        def adam_full(i, dz):
            """dW = acts[i]^T @ dz, then a full-matrix in-place Adam
            update of the RESIDENT f32 master + moments. No HBM motion."""
            g = jax.lax.dot_general(
                acts[i][:], dz.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (pd[i], pd[i+1])
            m_ = b1 * mw[i][:] + (1 - b1) * g
            v_ = b2 * vw[i][:] + (1 - b2) * g * g
            upd = (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps_adam)
            wn = mast[i][:] - spec.lr * upd
            if c.nonneg:
                wn = jnp.maximum(wn, 0.0)
            mast[i][:] = wn
            mw[i][:] = m_
            vw[i][:] = v_
            w16[i][:] = wn.astype(jnp.bfloat16)

        def small_adam(key, i, g_row):
            mk, vk = "m_" + key, "v_" + key
            gpad = padrow(g_row)
            m_ = b1 * sm[mk][i, :] + (1 - b1) * gpad
            v_ = b2 * sm[vk][i, :] + (1 - b2) * gpad * gpad
            upd = (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps_adam)
            sm[key][i, :] = sm[key][i, :] - spec.lr * upd
            sm[mk][i, :] = m_
            sm[vk][i, :] = v_

        # ---- backward (last -> first) ----
        dz_last = (probs_buf[:] - onehot) * wrow / denom
        for i in range(m - 1, -1, -1):
            dout = pd[i + 1]
            if i == m - 1:
                dz = dz_last
            else:
                dD = da_buf[:, pl.ds(0, dout)]
                if drops[i] > 0.0:
                    keep = 1.0 - drops[i]
                    pltpu.prng_seed(seed0 + i)  # same stream as forward
                    bits = pltpu.prng_random_bits((B, dout))
                    un = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
                    dD = jnp.where(un < keep, dD / keep, 0.0)
                xh = xhats[i][:].astype(jnp.float32)
                if use_bn:
                    dgamma = jnp.sum(dD * xh, axis=0)
                    dbeta = jnp.sum(dD, axis=0)
                    # read gamma BEFORE its in-place Adam write
                    dxh = dD * sm["gamma"][i, : dout][None, :]
                    small_adam("gamma", i, dgamma)
                    small_adam("beta", i, dbeta)
                    s1 = jnp.sum(dxh, axis=0, keepdims=True)
                    s2 = jnp.sum(dxh * xh, axis=0, keepdims=True)
                    sd = sdvec[i, : dout][None, :]
                    da = sd * (dxh - (wrow / denom) * s1
                               - (wrow / denom) * xh * s2)
                else:
                    da = dD
                if use_bn:
                    thr = (-muvec[i, : dout] * sdvec[i, : dout])[None, :]
                    relu_mask = xh > thr
                else:
                    relu_mask = xh > 0.0
                dz = jnp.where(relu_mask, da, 0.0)
            db = jnp.sum(dz, axis=0)
            small_adam("b", i, db)
            if i > 0:
                dx = jax.lax.dot_general(
                    dz.astype(jnp.bfloat16), w16[i][:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                adam_full(i, dz)
                da_buf[:, pl.ds(0, pd[i])] = dx
            else:
                adam_full(i, dz)

        # ---- constraint: power iteration + EAGER rescale of the
        # resident masters (no deferred scales at epoch scope) ----
        if spec.rho is not None:
            u = u_ref[:]
            u = u / (jnp.sqrt(jnp.sum(u * u)) + eps_spacing)

            def matvec_pt(vec):
                x = vec
                for j in range(m - 1, -1, -1):
                    x = jax.lax.dot_general(
                        x.astype(jnp.bfloat16), w16[j][:],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return x

            def matvec_p(vec):
                x = vec
                for j in range(m):
                    x = jax.lax.dot(
                        x.astype(jnp.bfloat16), w16[j][:],
                        preferred_element_type=jnp.float32)
                return x

            for _ in range(spec.pi_iters):
                v = matvec_pt(u)
                v = v / (jnp.sqrt(jnp.sum(v * v)) + eps_spacing)
                u = matvec_p(v)
                u = u / (jnp.sqrt(jnp.sum(u * u)) + eps_spacing)
            v = matvec_pt(u)
            v = v / (jnp.sqrt(jnp.sum(v * v)) + eps_spacing)
            sigma = jnp.sum(u * matvec_p(v))
            u_ref[:] = u
            for i in range(m):
                f = jnp.exp(
                    jnp.log(spec.rho / (sigma + eps_spacing)) * (1.0 / m))
                w16[i][:] = (w16[i][:].astype(jnp.float32) * f).astype(
                    jnp.bfloat16)
                mast[i][:] = mast[i][:] * f
                sigma = sigma * f

    return kernel


def build_fused_epoch_call(spec: FusedStepSpec, n_batches: int):
    """-> call(fstate, xs, ys, ws, seeds) -> (fstate', losses, accs) where
    xs: (n_batches, B, pd0) f32 gathered batches, ys: (n_batches, B, 1)
    int32, ws: (n_batches, B, 1) f32 row weights, seeds: (n_batches,)
    int32 per-step dropout seeds. losses/accs: (n_batches, 1) f32.

    Any deferred `scales` in fstate (left by the per-step kernel) must be
    folded before this call — build_fused_epoch_fn does it."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = spec.n_layers
    pd = spec.pdims
    B = spec.batch
    kernel = _make_epoch_kernel(spec, n_batches)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def const2(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0))

    in_specs = (
        [smem, smem,
         pl.BlockSpec((1, B, pd[0]), lambda i: (i, 0, 0)),
         pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0)),
         pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0)),
         const2((1, pd[-1]))]
        + [const2((pd[i], pd[i + 1])) for i in range(m)] * 3
        + [const2((m, spec.dmax))] * len(_SMALL_KEYS)
    )
    f_shapes = [jax.ShapeDtypeStruct((pd[i], pd[i + 1]), jnp.float32)
                for i in range(m)]
    sm_shape = jax.ShapeDtypeStruct((m, spec.dmax), jnp.float32)
    out_shape = (
        f_shapes + f_shapes + f_shapes
        + [sm_shape] * len(_SMALL_KEYS)
        + [jax.ShapeDtypeStruct((1, pd[-1]), jnp.float32),   # u
           jax.ShapeDtypeStruct((1,), jnp.int32),            # count
           jax.ShapeDtypeStruct((n_batches, 1), jnp.float32),
           jax.ShapeDtypeStruct((n_batches, 1), jnp.float32)]
    )
    out_specs = (
        [const2((pd[i], pd[i + 1])) for i in range(m)] * 3
        + [const2((m, spec.dmax))] * len(_SMALL_KEYS)
        + [const2((1, pd[-1])), smem,
           const2((n_batches, 1)),
           const2((n_batches, 1))]
    )
    # inputs: seeds(0) count(1) xs(2) ys(3) ws(4) u(5) mast(6..) mw vw sm
    # outputs: mast(0..) mw vw sm u count loss acc
    n_small = len(_SMALL_KEYS)
    aliases = {6 + k: k for k in range(3 * m)}
    for j in range(n_small):
        aliases[6 + 3 * m + j] = 3 * m + j
    aliases[5] = 3 * m + n_small  # u

    scratch = (
        [pltpu.VMEM((pd[i], pd[i + 1]), jnp.bfloat16) for i in range(m)]
        + [pltpu.VMEM((B, pd[i]), jnp.bfloat16) for i in range(m)]
        + [pltpu.VMEM((B, pd[i + 1]), jnp.bfloat16) for i in range(m - 1)]
        + [pltpu.VMEM((m, spec.dmax), jnp.float32),
           pltpu.VMEM((m, spec.dmax), jnp.float32),
           pltpu.VMEM((B, spec.dmax), jnp.float32),
           pltpu.VMEM((B, pd[-1]), jnp.float32),
           pltpu.VMEM((1, spec.dmax), jnp.float32)]
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_batches,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=spec.interpret,
        compiler_params=None if spec.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # steps are sequential
        ),
    )

    def run(fstate, xs, ys, ws, seeds):
        sm = fstate["small"]
        outs = call(
            seeds.astype(jnp.int32),
            fstate["count"],
            xs, ys, ws,
            fstate["u"],
            *fstate["masters"], *fstate["mw"], *fstate["vw"],
            *[sm[k] for k in _SMALL_KEYS],
        )
        masters = tuple(outs[:m])
        mw = tuple(outs[m:2 * m])
        vw = tuple(outs[2 * m:3 * m])
        sm_new = {k: outs[3 * m + j] for j, k in enumerate(_SMALL_KEYS)}
        u, count, losses, accs = outs[3 * m + n_small:]
        fnew = {
            "masters": masters,
            # the resident masters already carry every rescale: the bf16
            # copies are a pure cast of them
            "w16": tuple(w.astype(jnp.bfloat16) for w in masters),
            "mw": mw, "vw": vw, "small": sm_new,
            "scales": jnp.ones((1, _LANE), jnp.float32),
            "u": u, "count": count,
        }
        return fnew, losses, accs

    return run


# --------------------------------------------------------------------------
# the jit-facing step and epoch builders
# --------------------------------------------------------------------------

def build_fused_step(spec: FusedStepSpec):
    """-> step(fstate, x_pad, y, wrow, seed) -> (fstate', loss, acc).

    x_pad: (batch, pdims[0]) f32 (feature-padded); y: (batch,) int32;
    wrow: (batch,) f32 row weights; seed: () int32 dropout seed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = spec.n_layers
    pd = spec.pdims
    B = spec.batch
    T = spec.adam_tile
    kernel = _make_kernel(spec)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = (
        [smem, smem, vmem, vmem, vmem, vmem, vmem]
        + [any_spec] * (4 * m)
        + [vmem] * len(_SMALL_KEYS)
    )
    w_shapes = [jax.ShapeDtypeStruct((pd[i], pd[i + 1]), jnp.bfloat16)
                for i in range(m)]
    f_shapes = [jax.ShapeDtypeStruct((pd[i], pd[i + 1]), jnp.float32)
                for i in range(m)]
    sm_shape = jax.ShapeDtypeStruct((m, spec.dmax), jnp.float32)
    out_shape = (
        w_shapes + f_shapes + f_shapes + f_shapes
        + [sm_shape] * len(_SMALL_KEYS)
        + [jax.ShapeDtypeStruct((1, _LANE), jnp.float32),   # scales
           jax.ShapeDtypeStruct((1, pd[-1]), jnp.float32),  # u
           jax.ShapeDtypeStruct((1,), jnp.int32),           # count
           jax.ShapeDtypeStruct((1, 1), jnp.float32),       # loss
           jax.ShapeDtypeStruct((1, 1), jnp.float32)]       # acc
    )
    out_specs = (
        [any_spec] * (4 * m)
        + [vmem] * len(_SMALL_KEYS)
        + [vmem, vmem, smem, vmem, vmem]
    )
    # alias the big in-place buffers: inputs 7..7+4m-1 are w16/mast/mw/vw,
    # mapping onto outputs 0..4m-1 in the same order
    aliases = {7 + k: k for k in range(4 * m)}
    # small stacked arrays alias too (input 7+4m+j -> output 4m+j)
    for j in range(len(_SMALL_KEYS)):
        aliases[7 + 4 * m + j] = 4 * m + j

    scratch = (
        [pltpu.VMEM((pd[i], pd[i + 1]), jnp.bfloat16) for i in range(m)]
        + [pltpu.VMEM((B, pd[i]), jnp.bfloat16) for i in range(m)]   # acts
        + [pltpu.VMEM((B, pd[i + 1]), jnp.bfloat16)
           for i in range(m - 1)]                                    # xhats
        + [pltpu.VMEM((m, spec.dmax), jnp.float32),                  # muvec
           pltpu.VMEM((m, spec.dmax), jnp.float32),                  # sdvec
           pltpu.VMEM((B, spec.dmax), jnp.float32),                  # da
           pltpu.VMEM((B, pd[-1]), jnp.float32),                     # probs
           pltpu.VMEM((T, spec.dmax), jnp.float32),                  # mtile
           pltpu.VMEM((T, spec.dmax), jnp.float32),                  # mwtile
           pltpu.VMEM((T, spec.dmax), jnp.float32),                  # vwtile
           pltpu.VMEM((1, spec.dmax), jnp.float32),                  # rowpad
           pltpu.SemaphoreType.DMA((m,)),
           pltpu.SemaphoreType.DMA((4,))]
    )

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=spec.interpret,
        compiler_params=None if spec.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def step(fstate, x_pad, y, wrow, seed):
        sm = fstate["small"]
        outs = call(
            jnp.asarray([seed], jnp.int32),
            fstate["count"],
            x_pad,
            y.reshape(B, 1).astype(jnp.int32),
            wrow.reshape(B, 1).astype(jnp.float32),
            fstate["scales"],
            fstate["u"],
            *fstate["w16"], *fstate["masters"], *fstate["mw"],
            *fstate["vw"],
            *[sm[k] for k in _SMALL_KEYS],
        )
        w16 = tuple(outs[:m])
        masters = tuple(outs[m:2 * m])
        mw = tuple(outs[2 * m:3 * m])
        vw = tuple(outs[3 * m:4 * m])
        sm_new = {k: outs[4 * m + j] for j, k in enumerate(_SMALL_KEYS)}
        scales, u, count, loss, acc = outs[4 * m + len(_SMALL_KEYS):]
        fnew = {"masters": masters, "w16": w16, "mw": mw, "vw": vw,
                "small": sm_new, "scales": scales, "u": u, "count": count}
        return fnew, loss[0, 0], acc[0, 0]

    return step


def build_fused_epoch_fn(spec: FusedStepSpec, shuffle: bool = True,
                         epochs_per_call: int = 1,
                         reshuffle_inner: bool = False,
                         scan_steps: bool = False):
    """-> jitted `epoch(fstate, data_pad, labels, perm_key, drop_key,
    n_true)` -> (fstate', mean_loss, mean_acc) — the Pallas twin of
    `train/epoch_scan.py::build_epoch_fn`, operating on the packed fused
    state. `data_pad` is (N_pad, pdims[0]) f32, feature- AND row-padded
    (multiple of spec.batch).

    Default path: the shuffle gather stays XLA (one pass over the split),
    then the WHOLE epoch runs as ONE grid pallas_call — weights, Adam
    moments, and BN state stay VMEM-resident across every step
    (`build_fused_epoch_call`; measured ~2x FASTER than the XLA lean
    epoch — 2.3-2.9 vs 5.2-5.4 ms/epoch at the digit recipe, arbitrated
    2026-08-20, see `_make_epoch_kernel`'s verdict — the PRODUCTION
    fused-epoch path on TPU behind the `epoch_parity_vs_xla` gate).
    `scan_steps=True` keeps the older lax.scan-of-step-kernels form
    (measured 3.8x slower than the XLA epoch: its per-step tile DMAs
    serialize; kept for A/B and as the arbitrary-n_batches fallback)."""
    B = spec.batch
    step = build_fused_step(spec) if scan_steps else None
    epoch_calls: dict[int, object] = {}

    def one_epoch(fstate, data, labels, perm_key, drop_key, n_true):
        n_pad = data.shape[0]
        n_batches = n_pad // B
        if shuffle:
            perm = jax.random.permutation(perm_key, n_true)
            perm = jnp.concatenate([perm, jnp.arange(n_true, n_pad)]) \
                if n_pad > n_true else perm
        else:
            perm = jnp.arange(n_pad)
        xs = data[perm].reshape(n_batches, B, -1)
        ys = labels[perm].reshape(n_batches, B)
        ws = (perm.reshape(n_batches, B) < n_true).astype(jnp.float32)
        seeds = jax.vmap(
            lambda i: jax.random.randint(
                jax.random.fold_in(drop_key, i), (), 0, 2 ** 31 - 1)
        )(jnp.arange(n_batches))
        ns = jnp.sum(ws, axis=1)
        total = jnp.sum(ns)

        if not scan_steps:
            run = epoch_calls.get(n_batches)
            if run is None:
                run = build_fused_epoch_call(spec, n_batches)
                epoch_calls[n_batches] = run
            # fold any deferred per-step-kernel scales into the masters:
            # the epoch kernel keeps its masters current (eager rescale)
            sc = fstate["scales"]
            fstate = {**fstate,
                      "masters": tuple(
                          w * sc[0, i]
                          for i, w in enumerate(fstate["masters"])),
                      "scales": jnp.ones_like(sc)}
            fstate, losses, accs = run(
                fstate, xs, ys[..., None], ws[..., None], seeds)
            losses, accs = losses[:, 0], accs[:, 0]
            return (fstate, jnp.sum(losses * ns) / total,
                    jnp.sum(accs * ns) / total)

        def body(fs, batch):
            x, y, w, sd = batch
            fs, loss, acc = step(fs, x, y, w, sd)
            return fs, (loss, acc, jnp.sum(w))

        fstate, (losses, accs, _) = jax.lax.scan(
            body, fstate, (xs, ys, ws, seeds))
        return (fstate, jnp.sum(losses * ns) / total,
                jnp.sum(accs * ns) / total)

    if epochs_per_call == 1:
        epoch = one_epoch
    else:
        def epoch(fstate, data, labels, perm_key, drop_key, n_true):
            if not reshuffle_inner:
                # hoist the gather: ONE permutation per dispatch
                def body(e, carry):
                    fs, _, _ = carry
                    dk = jax.random.fold_in(drop_key, e)
                    return one_epoch(fs, data, labels, perm_key, dk, n_true)
            else:
                def body(e, carry):
                    fs, _, _ = carry
                    pk = jax.random.fold_in(perm_key, e)
                    dk = jax.random.fold_in(drop_key, e)
                    return one_epoch(fs, data, labels, pk, dk, n_true)
            init = (fstate, jnp.float32(0), jnp.float32(0))
            return jax.lax.fori_loop(0, epochs_per_call, body, init)

    return jax.jit(epoch, static_argnames=("n_true",),
                   donate_argnums=(0,))


def pad_features(spec: FusedStepSpec, x):
    """(N, in_dim) -> (N, pdims[0]) f32 zero-padded feature columns."""
    x = jnp.asarray(x, jnp.float32)
    pad = spec.pdims[0] - spec.dims[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


def unpack_opt_state(spec: FusedStepSpec, fstate, optimizer, params):
    """fstate Adam moments/count -> an optimizer state with
    `adam_optimizer`'s pytree structure, so fused-epoch checkpoints resume
    the Adam trajectory exactly like `Trainer.fit`'s save_best. Valid
    after any `build_fused_epoch_fn` call: the epoch kernel keeps masters
    eagerly rescaled (scales == 1), so the moments pair exactly with the
    params `unpack_params` returns."""
    m = spec.n_layers
    sm = fstate["small"]
    template = optimizer.init(params)

    def moments(prefix, stacked):
        layers = []
        for i in range(m):
            p = {"w": stacked[i][: spec.dims[i], : spec.dims[i + 1]],
                 "b": sm[prefix + "_b"][i, : spec.dims[i + 1]]}
            if i < m - 1 and spec.cfg.batch_norm:
                p["gamma"] = sm[prefix + "_gamma"][i, : spec.dims[i + 1]]
                p["beta"] = sm[prefix + "_beta"][i, : spec.dims[i + 1]]
            layers.append(p)
        return {"layers": layers}

    mu = moments("m", fstate["mw"])
    nu = moments("v", fstate["vw"])
    count = fstate["count"][0]

    def is_adam(x):
        return hasattr(x, "mu") and hasattr(x, "nu")

    def fill(st):
        if not is_adam(st):
            return st
        cast = lambda t, ref: jax.tree.map(  # noqa: E731
            lambda a, r: jnp.asarray(a, r.dtype), t, ref)
        return st._replace(count=jnp.asarray(count, st.count.dtype),
                           mu=cast(mu, st.mu), nu=cast(nu, st.nu))

    return jax.tree.map(fill, template, is_leaf=is_adam)


def epoch_parity_vs_xla(mcfg: MLPConfig, batch: int, data, labels,
                        n_true: int) -> dict:
    """Numeric gate for the Pallas epoch vs the XLA epoch: run ONE
    dropout-0 epoch from the same init with the same permutation on both
    paths and compare params / BN means / loss / accuracy. Used by
    `bench.py` before the pallas arm may take the fused-epoch winner key,
    and by `tools/ab_epoch.py` (VERDICT r4 weak-item 1: a silently-wrong
    fast kernel must never take the headline).

    Dropout is the documented non-bit-matched path (HW PRNG vs threefry —
    module docstring), so the gate runs the divergence-free config; the
    dropout path itself is pinned by tests/test_pallas_train.py. The XLA
    arm runs the bf16 model config — the kernel's documented equivalence
    class.

    Tolerances — divergence model, confirmed on TPU 2026-08-20 (dw .0135,
    db .0210, dmu .0020, dloss 2.7e-4 at the digit recipe, 33 steps; and
    db .0065, dloss 1.4e-4 at a 4-step split): one epoch = n_true/batch
    Adam steps of lr=1e-3; bf16 rounding can flip near-zero gradient
    signs, so two bf16-class implementations random-walk apart at about
    one Adam step per step — with a floor, because early bias-corrected
    updates transiently exceed lr => |dparam| < lr*max(8, 2*steps). BN
    running means accumulate per-step batch-mean rounding ~bf16_eps/
    sqrt(batch) => O(2e-3); gated at 3x that. A WRONG kernel (bad grads,
    mis-wired Adam, broken projection) lands orders of magnitude outside
    every bound; loss/acc at bf16 resolution of O(1) values pin functional
    equivalence directly.

    `data` is (N_pad, in_dim) f32 (row-padded to a batch multiple),
    `labels` (N_pad,) int32. Returns {"ok": bool, per-quantity deltas}.
    """
    import dataclasses

    from ..constraints import make_simple_norm_constraint
    from ..models.mlp import init_mlp
    from ..train.epoch_scan import build_epoch_fn
    from ..train.trainer import adam_optimizer

    cfg0 = dataclasses.replace(mcfg, dropout=(0.0,) * len(mcfg.dropout))
    params, state = init_mlp(cfg0, jax.random.PRNGKey(7))
    pk, dk = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    # pack the fused state BEFORE the XLA arm runs: build_epoch_fn donates
    # its train-state arguments, so params/state buffers die with that call
    spec = FusedStepSpec(cfg=cfg0, batch=batch, rho=0.1, pi_iters=4)
    fs = pack_state(spec, params, state)

    con = make_simple_norm_constraint(0.1, n_iter=4)
    opt = adam_optimizer(1e-3, "float32")
    ep_xla = build_epoch_fn(cfg0.with_bf16(), opt, constraint=con.apply,
                            batch_size=batch, epochs_per_call=1,
                            reshuffle_inner=False)
    px, sx, _, _, loss_x, acc_x = ep_xla(
        params, state, opt.init(params), con.init(params), data, labels,
        pk, dk, n_true=n_true)

    ep_pl = build_fused_epoch_fn(spec, epochs_per_call=1,
                                 reshuffle_inner=False)
    fs2, loss_p, acc_p = ep_pl(fs, pad_features(spec, data), labels, pk,
                               dk, n_true=n_true)
    pp, sp = unpack_params(spec, fs2)

    dw = max(
        float(jnp.max(jnp.abs(a["w"] - b["w"])))
        for a, b in zip(pp["layers"], px["layers"])
    )
    db = max(
        float(jnp.max(jnp.abs(a["b"] - b["b"])))
        for a, b in zip(pp["layers"], px["layers"])
    )
    dmu = float(jnp.max(jnp.abs(sp["layers"][0]["mean"]
                                - sx["layers"][0]["mean"])))
    dloss = abs(float(loss_p) - float(loss_x))
    dacc = abs(float(acc_p) - float(acc_x))
    steps = data.shape[0] // batch
    # one Adam step (lr) of sign-flip walk per step, with a floor: early
    # bias-corrected updates can exceed lr transiently, so few-step gates
    # need headroom (measured 2026-08-20: db 6.5e-3 at 4 steps = 1.6x
    # steps*lr, vs 2.1e-2 at 33 steps = 0.65x). Wrong kernels land orders
    # of magnitude outside either form.
    tol_param = 1e-3 * max(8.0, 2.0 * steps)
    ok = (dw < tol_param and db < tol_param and dmu < 6e-3
          and dloss < 3e-2 and dacc < 3e-2)
    return {"ok": bool(ok), "max_dw": dw, "max_db": db, "max_dmu": dmu,
            "dloss": dloss, "dacc": dacc, "tol_param": tol_param,
            "loss_pallas": float(loss_p), "loss_xla": float(loss_x)}
