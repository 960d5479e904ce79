"""Benchmark: end-to-end robust-ASR pipeline throughput on one TPU chip.

Prints ONE COMPACT JSON line (kept < 1900 chars so the driver's 2000-char
tail capture can always parse it — the round-3 full record overflowed it):
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "headline": {...rounded headline keys...}, "full_record": "bench_full.json"}
The complete measurement record (every backend, precision A/B, FLOP/s,
sanity sentinel) is written to bench_full.json alongside this script.

Pipeline measured (per BASELINE.json north star "MFCC+train utterances/sec/
chip"): fused MFCC featurization + one training epoch (Adam+CCE+BN+dropout +
simple_norm Lipschitz projection, the constrained digit recipe) + FGSM
adversarial eval, on synthetic 1-s utterances, per-utterance wall time
summed across stages. Beyond the composite, the record also carries one
representative throughput per remaining attack family (PGD/JSMA/C&W-L2 at
the reference's ART budgets), warm serving p50/p95 per padding bucket for
f32 AND int16 ingress (serve/engine.py), and — before the pallas arm may
take the fused-epoch winner key — an in-run numeric parity gate against
the XLA epoch (ops/pallas_train.py::epoch_parity_vs_xla). Each stage is timed with a dependency-chained
lax.fori_loop so the runtime cannot cache or overlap identical calls
(the axon tunnel memoizes repeated pure executions — see
.claude/skills/verify/SKILL.md), using paired-length differencing
((t(2n) - t(n)) / n with a dynamic trip count) so the tunnel RTT and its
jitter cancel exactly instead of being subtracted as a separate estimate.

vs_baseline compares against the reference's CPU pipeline cost recorded in
baselines/reference_cpu.json (librosa-equivalent sequential frontend +
Keras CPU fit + per-batch host-SVD constraint + TF gradient FGSM), measured
by baselines/measure_reference_cpu.py on this machine. Re-run that script to
refresh the constants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def _measure_rtt(x0) -> float:
    """Median round-trip of a trivial compute + tiny host fetch."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x, s: jnp.ravel(x)[:4] + s)
    ts = []
    float(np.asarray(f(x0, jnp.float32(0.5)))[0])  # compile
    for i in range(5):
        t0 = time.perf_counter()
        float(np.asarray(f(x0, jnp.float32(i)))[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _paired_time(fetch, fresh, n0: int, rtt: float, target_s: float = 0.25,
                 reps: int = 3) -> tuple[float, int]:
    """Per-iteration wall seconds by PAIRED-LENGTH DIFFERENCING.

    `fetch(x, n)` runs an n-iteration dependency chain on input `x` and
    blocks on a real host fetch; `fresh(i)` returns a never-seen input
    buffer (the axon runtime memoizes identical pure executions). The
    estimate is (t(2n) - t(n)) / n over fresh buffers: the tunnel RTT,
    dispatch, and every other fixed per-fetch cost cancel EXACTLY instead
    of being subtracted as a separately measured median — the subtraction
    scheme mis-reported by up to ~40x once a fast stage's whole chain ran
    shorter than the RTT jitter (observed 2026-08-18: train-step "MFU"
    4.1 > 1.0). n is auto-calibrated so each timed leg runs >= target_s
    above the RTT floor; the trip count is a DYNAMIC argument so one
    compile serves every length. Returns (seconds_per_iteration, n)."""
    n = max(int(n0), 1)
    seq = iter(range(10_000))
    fetch(fresh(next(seq)), n)  # compile + settle
    for _ in range(16):  # calibrate: grow until the n-leg clears target_s
        t0 = time.perf_counter()
        fetch(fresh(next(seq)), n)
        if time.perf_counter() - t0 >= rtt + target_s or n >= 65536:
            break
        n *= 2
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fresh(next(seq)), n)
        t1 = time.perf_counter()
        fetch(fresh(next(seq)), 2 * n)
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / n)
    samples.sort()
    dt = samples[len(samples) // 2]  # median: robust to one jitter spike
    if dt <= 0 and n < 262_144:  # jitter swamped even the calibrated chain
        return _paired_time(fetch, fresh, 4 * n, rtt, target_s, reps)
    if dt <= 0:  # bounded: a stage this fast is below the measurement
        dt = max(max(samples), 1e-9)  # floor; report the least-negative rep
    return dt, n


def _time_chain(fn, x0, n_iter: int, rtt: float) -> float:
    """Wall seconds per fn application: a jitted chain of dependent
    applications where every iteration consumes the FULL output (defeats
    DCE) and feeds a scalar back into the next input (defeats caching/
    hoisting/CSE), timed by paired-length differencing (_paired_time)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            probe = sum(jnp.sum(leaf).astype(jnp.float32)
                        for leaf in jax.tree.leaves(out)) * jnp.float32(1e-20)
            return (x + probe, acc + probe)

        x_fin, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return jnp.ravel(x_fin)[:4] + acc

    def fetch(x, n):
        return float(np.asarray(run(x, n))[0])

    def fresh(i):
        return jax.tree.map(lambda a: a + (2.0 + i), x0)

    dt, _ = _paired_time(fetch, fresh, n_iter, rtt)
    return dt


# bf16 MXU peak per chip, by jax device_kind. Used only to turn measured
# FLOP/s into an MFU fraction; FLOP counts themselves are analytic (below).
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e datasheet: 197 TFLOP/s bf16
    "TPU v5": 459e12,       # v5p
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}


def frontend_flops_per_utt(cfg) -> float:
    """Analytic MXU FLOPs for one utterance through the fused MFCC kernel.

    Dominant GEMMs (ops/mfcc_xla.py): framed windows (F x n_fft) against the
    real+imag DFT bases (n_fft x n_freq each; halved per dft_split_level),
    mel projection (n_freq x n_mels), DCT (n_mels x n_mfcc). 2*M*K*N per GEMM.
    """
    f = cfg.num_frames(cfg.sr)  # 1-second utterance at cfg.sr
    dft = 2.0 * f * cfg.n_fft * cfg.n_freq * 2  # real + imag
    dft /= 2 ** cfg.dft_split_levels
    mel = 2.0 * f * cfg.n_freq * cfg.n_mels
    dct = 2.0 * f * cfg.n_mels * cfg.n_mfcc
    return dft + mel + dct


def frontend_hopdft_flops_per_utt(cfg) -> float:
    """Executed MXU FLOPs for the hop-block rDFT (ops/mfcc_hopdft.py): the
    DFT GEMM contracts hop (not n_fft) samples per block, over
    F + n_fft/hop - 1 non-overlapping blocks — ~4x fewer FLOPs at the digit
    preset. MFU must be judged against the FLOPs the kernel actually
    executes, not the direct-DFT count (ADVICE r2 precedent)."""
    f = cfg.num_frames(cfg.sr)
    n_blocks = f + cfg.n_fft // cfg.hop_length - 1
    dft = 2.0 * n_blocks * cfg.hop_length * cfg.n_freq * 2  # real + imag
    mel = 2.0 * f * cfg.n_freq * cfg.n_mels
    dct = 2.0 * f * cfg.n_mels * cfg.n_mfcc
    return dft + mel + dct


def train_step_flops_per_utt(mcfg) -> float:
    """Analytic matmul FLOPs for one example through one Adam train step:
    2*d_in*d_out per layer forward, 2x that for dW and 2x for dX on the
    backward pass (6x total, standard transformer-accounting convention)."""
    dims = (mcfg.in_dim,) + tuple(mcfg.hidden) + (mcfg.n_classes,)
    fwd = sum(2.0 * a * b for a, b in zip(dims[:-1], dims[1:]))
    return 3.0 * fwd


def _cpu_busy_seconds():
    """Aggregate non-idle CPU seconds across all cores from /proc/stat
    (user+nice+system+irq+softirq+steal; idle and iowait excluded), or
    None where /proc isn't available."""
    try:
        with open("/proc/stat") as f:
            vals = [float(x) for x in f.readline().split()[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)
        return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return None


def measure_tpu(quick: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    # host-load probe anchors (consumed by the sanity sentinel at the end
    # of the run; re-captured per call so the contention retry re-measures)
    _bench_wall0 = time.time()
    _bench_busy0 = _cpu_busy_seconds()
    _bench_self0 = sum(os.times()[:4])

    from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
    from asr_using_robust_nn_tpu.models.mlp import MLPConfig, init_mlp
    from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig, mfcc_xla_batch
    from asr_using_robust_nn_tpu.train import TrainConfig, Trainer
    from asr_using_robust_nn_tpu.attacks.whitebox import fgsm
    from asr_using_robust_nn_tpu.models.mlp import apply_mlp

    rng = np.random.default_rng(0)
    b_mfcc = 512 if quick else 1024
    # per-stage STARTING chain lengths; _paired_time auto-calibrates each
    # stage upward until a chain leg clears the RTT floor by >= 250 ms, so
    # these only set the first probe
    n_iter = 4 if quick else 8          # MFCC: ~9-14 ms/call
    n_iter_train = 16 if quick else 64  # train step: ~0.2 ms/call
    n_iter_fgsm = 64 if quick else 512  # FGSM eval: ~0.02 ms/call
    cfg = FrontendConfig.digit()
    waves = jax.device_put(
        (rng.standard_normal((b_mfcc, 22050)) * 0.1).astype(np.float32)
    )

    rtt = _measure_rtt(waves)

    # Stage 1: frontend. All kernels measured; the int8 digit-decomposition
    # rDFT wins the digit preset on v5e (frontend/mfcc.py decision table),
    # pallas kept for comparison.
    from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch

    t_pallas = None
    try:
        from asr_using_robust_nn_tpu.ops.pallas_mfcc import mfcc_pallas_batch

        if jax.default_backend() in ("tpu", "axon"):
            t_pallas = _time_chain(
                lambda w: mfcc_pallas_batch(w, cfg), waves, n_iter, rtt
            )
    except Exception:
        t_pallas = None
    t_xla = _time_chain(lambda w: mfcc_xla_batch(w, cfg), waves, n_iter, rtt)
    t_int8 = _time_chain(lambda w: mfcc_int8_batch(w, cfg), waves, n_iter, rtt)
    from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
        mfcc_hopdft_batch, mfcc_hopdft_int8_batch)

    t_hop = _time_chain(
        lambda w: mfcc_hopdft_batch(w, cfg), waves, n_iter, rtt)
    t_hop8 = _time_chain(
        lambda w: mfcc_hopdft_int8_batch(w, cfg), waves, n_iter, rtt)
    t_mfcc = min(t for t in (t_pallas, t_xla, t_int8, t_hop, t_hop8)
                 if t is not None)
    mfcc_utts_per_s = b_mfcc / t_mfcc

    # Stage 1b: speaker frontend preset (odd n_fft=441: no radix-2 split,
    # the GEMM formulation's stress shape — VERDICT r1 weak-item 3).
    # Three candidates: the default (bf16_x6 DFT, full parity), the
    # speaker_fast preset (bf16_x3, ~2.4e-3 parity), and the fused bf16x3
    # Pallas kernel (X3 parity + VMEM-resident power spectrogram).
    scfg = FrontendConfig.speaker()
    t_speaker = _time_chain(
        lambda w: mfcc_xla_batch(w, scfg), waves, n_iter, rtt
    )
    scfg_fast = FrontendConfig.speaker_fast()
    t_speaker_x3 = _time_chain(
        lambda w: mfcc_xla_batch(w, scfg_fast), waves, n_iter, rtt
    )
    t_speaker_pallas = None
    try:
        from asr_using_robust_nn_tpu.ops.pallas_mfcc import (
            mfcc_pallas_bf16x3_batch,
        )

        if jax.default_backend() in ("tpu", "axon"):
            t_speaker_pallas = _time_chain(
                lambda w: mfcc_pallas_bf16x3_batch(w, scfg), waves, n_iter,
                rtt,
            )
    except Exception:
        t_speaker_pallas = None
    # HEADLINE = the full-parity default (bf16_x6, 4.9e-4 vs the f64 oracle),
    # matching the parity bar every digit headline is quoted at (VERDICT r3
    # weak-item 4). The reduced-parity modes (bf16_x3, ~2.4e-3) are reported
    # under explicit *_fast keys.
    speaker_utts_per_s = b_mfcc / t_speaker
    speaker_backend = "xla_bf16x6"
    t_speaker_fast = min(t for t in (t_speaker, t_speaker_x3,
                                     t_speaker_pallas) if t is not None)
    speaker_fast_backend = ("xla_bf16x6" if t_speaker_fast == t_speaker
                            else "xla_bf16x3"
                            if t_speaker_fast == t_speaker_x3
                            else "pallas_bf16x3")

    # Stage 2: constrained training step (digit recipe: batch 512, NonNeg +
    # simple_norm rho=0.1 in-step projection). Variants (VERDICT r3 item 2 —
    # attack the step's HBM traffic term):
    #   f32       the baseline recipe
    #   bf16      bf16 Dense compute, f32 everything else (r3's A/B)
    #   lean      f32 compute + bf16-STORED Adam moments + bf16 power-
    #             iteration matvecs (the traffic levers; math stays f32)
    #   lean_bf16 both sets of levers combined
    mcfg = MLPConfig.digit_constrained()
    bs = 512
    trainer_cfg = TrainConfig(batch_size=bs)
    trainer_cfg_lean = TrainConfig(batch_size=bs,
                                   adam_moments_dtype="bfloat16")
    con = make_simple_norm_constraint(0.1, n_iter=4)
    con_lean = make_simple_norm_constraint(0.1, n_iter=4,
                                           matvec_dtype=jnp.bfloat16)
    # lean_pi1: ONE power-iteration sweep per step against the persistent
    # u vector. The projection's dependent matvec chain is ~40% of the
    # lean epoch (paired A/B 2026-08-19); with u carried across steps the
    # weights move slowly enough that one sweep tracks sigma as tightly as
    # four — measured landing sigma 0.10005 (n_iter=1) vs 0.10026
    # (n_iter=4) at rho=0.1 after 32 epochs at reference scale. The
    # reference's own semantics is an EXACT host SVD per batch
    # (Constraints.py:162-167); every n_iter is already the persistent-u
    # approximation of that, landing-gated the same way.
    con_lean_pi1 = make_simple_norm_constraint(0.1, n_iter=1,
                                               matvec_dtype=jnp.bfloat16)
    variants = {
        "f32": (mcfg, trainer_cfg, con),
        "bf16": (mcfg.with_bf16(), trainer_cfg, con),
        "lean": (mcfg, trainer_cfg_lean, con_lean),
        "lean_bf16": (mcfg.with_bf16(), trainer_cfg_lean, con_lean),
        "lean_pi1": (mcfg, trainer_cfg_lean, con_lean_pi1),
    }
    x = jax.device_put(rng.standard_normal((bs, 880)).astype(np.float32))
    y = jax.device_put(rng.integers(0, 10, bs).astype(np.int32))
    key = jax.random.PRNGKey(1)

    def measure_train_step(cfg, tcfg, con):
        params, state = init_mlp(cfg, jax.random.PRNGKey(0))
        trainer = Trainer(cfg, tcfg, constraint=con.apply,
                          constraint_state=con.init(params))
        opt_state = trainer.optimizer.init(params)
        cstate = con.init(params)
        step = trainer.train_step

        @jax.jit
        def train_chain(params, state, opt_state, cstate, x, n):
            def body(i, carry):
                params, state, opt_state, cstate, x = carry
                k = jax.random.fold_in(key, i)
                params, state, opt_state, cstate, loss, acc = step(
                    params, state, opt_state, cstate, x, y, k
                )
                return (params, state, opt_state, cstate, x + 1e-20 * loss)

            out = jax.lax.fori_loop(
                0, n, body, (params, state, opt_state, cstate, x)
            )
            # 4-float probe over every updated tensor, computed in-graph so
            # the host fetch moves 16 bytes, not a weight matrix
            probe = sum(jnp.sum(l).astype(jnp.float32)
                        for l in jax.tree.leaves((out[0], out[1])))
            return out[0], out[1], jnp.ravel(out[4])[:4] + probe

        def fetch(xx, n):
            _, _, pr = train_chain(params, state, opt_state, cstate, xx, n)
            return float(np.asarray(pr)[0])

        t, _ = _paired_time(fetch, lambda i: x + 0.5 * (i + 1), n_iter_train,
                            rtt)
        p2, s2, _ = train_chain(params, state, opt_state, cstate, x,
                                n_iter_train)
        return t, trainer, p2, s2

    t_train_v = {}
    for name, (cfg_v, tcfg_v, con_v) in variants.items():
        t_v, trainer_v, p_v, s_v = measure_train_step(cfg_v, tcfg_v, con_v)
        t_train_v[name] = t_v
        if name == "f32":
            trainer, params2, state2 = trainer_v, p_v, s_v
    train_variant = min(t_train_v, key=t_train_v.get)
    t_train = t_train_v[train_variant]
    train_utts_per_s = bs / t_train

    # Stage 2b: fused device-resident epoch at reference scale (the whole
    # digit train split in HBM, one lax.scan epoch per dispatch —
    # train/epoch_scan.py; headline number promised in BASELINE.md).
    from asr_using_robust_nn_tpu.train.epoch_scan import build_epoch_fn

    n_true = 4096 if quick else 16566  # reference digit train-split rows
    n_epochs_chain = 4 if quick else 8
    n_pad = ((n_true + bs - 1) // bs) * bs
    data = jax.device_put(
        rng.standard_normal((n_pad, 880)).astype(np.float32))
    lab = jax.device_put(
        np.resize(rng.integers(0, 10, n_true).astype(np.int32), n_pad))
    pk, dk = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    def measure_epoch(cfg, opt, con):
        # reshuffle_inner=False is the REFERENCE recipe (tf.data
        # reshuffle_each_iteration=False, SURVEY §2 row 6) and what
        # Trainer.fit dispatches by default; it also lets epoch_scan hoist
        # the 2x-58MB shuffle gather out of the inner epoch loop.
        ep_fn = build_epoch_fn(cfg, opt, constraint=con.apply,
                               batch_size=bs, epochs_per_call=n_epochs_chain,
                               reshuffle_inner=False)

        def fresh_trees(seed):
            p, s = init_mlp(cfg, jax.random.PRNGKey(seed))
            return p, s, opt.init(p), con.init(p)

        def fetch(trees, n_calls):
            # chain n_calls dispatches of the SAME compiled program by
            # threading the updated trees through (fresh inputs each call,
            # so the runtime cannot memoize), fetch once at the end
            out = ep_fn(*trees, data, lab, pk, dk, n_true=n_true)
            for _ in range(n_calls - 1):
                out = ep_fn(out[0], out[1], out[2], out[3], data, lab, pk,
                            dk, n_true=n_true)
            return float(np.asarray(out[4]))

        # paired-length differencing over whole dispatches: RTT cancels
        t_per_call, _ = _paired_time(
            lambda trees, n: fetch(trees, n),
            lambda i: fresh_trees(10 + i), 1, rtt,
        )
        return t_per_call / n_epochs_chain

    from asr_using_robust_nn_tpu.train.trainer import adam_optimizer

    t_epoch_v = {}
    for name, (cfg_v, tcfg_v, con_v) in variants.items():
        opt_v = adam_optimizer(tcfg_v.learning_rate,
                               tcfg_v.adam_moments_dtype)
        t_epoch_v[name] = measure_epoch(cfg_v, opt_v, con_v)

    # Pallas fused-step epoch (ops/pallas_train.py): weights VMEM-resident
    # across fwd+bwd+Adam+projection, grads never in HBM — the round-4
    # answer to the step's HBM roofline (VERDICT r3 item 2).
    pallas_epoch_error = None
    pallas_epoch_parity = None
    try:
        if jax.default_backend() in ("tpu", "axon"):
            from asr_using_robust_nn_tpu.ops.pallas_train import (
                FusedStepSpec, build_fused_epoch_fn, epoch_parity_vs_xla,
                pack_state, pad_features)

            spec = FusedStepSpec(cfg=mcfg, batch=bs, rho=0.1, pi_iters=4)
            ep_pl = build_fused_epoch_fn(spec,
                                         epochs_per_call=n_epochs_chain,
                                         reshuffle_inner=False)
            data_p = pad_features(spec, data)

            def fresh_fs(seed):
                return pack_state(spec,
                                  *init_mlp(mcfg, jax.random.PRNGKey(seed)))

            def fetch_pl(fs, n_calls):
                out = ep_pl(fs, data_p, lab, pk, dk, n_true=n_true)
                for _ in range(n_calls - 1):
                    out = ep_pl(out[0], data_p, lab, pk, dk, n_true=n_true)
                return float(np.asarray(out[1]))

            t_call, _ = _paired_time(fetch_pl, lambda i: fresh_fs(50 + i),
                                     1, rtt)
            t_epoch_v["pallas"] = t_call / n_epochs_chain
            # in-run numeric gate (VERDICT r4 weak-item 1): the pallas arm
            # may only take the winner key if its one-epoch dropout-0
            # output matches the XLA epoch at bf16-class tolerances — a
            # silently-wrong fast kernel must never take the headline
            pallas_epoch_parity = epoch_parity_vs_xla(mcfg, bs, data, lab,
                                                      n_true)
    except Exception as e:  # record, never sink the whole bench
        pallas_epoch_error = f"{type(e).__name__}: {e}"[:300]
    epoch_eligible = {
        k: v for k, v in t_epoch_v.items()
        if k != "pallas" or (pallas_epoch_parity or {}).get("ok")
    }
    epoch_variant = min(epoch_eligible, key=epoch_eligible.get)
    t_epoch = t_epoch_v[epoch_variant]

    # Stage 2c: fused MULTI-RUN epoch (train/multi_run.py) — R independent
    # trainings vmapped into one program on the same HBM-resident split.
    # The reference's protocol is many tiny runs (unseeded re-runs, seed
    # studies, rho grids selected by editing code — SURVEY §2.3/§5).
    # NOTE on expectations: the fused epoch is HBM-bound, not MXU-bound —
    # each run carries its OWN weights/grads/Adam state, so stacking runs
    # multiplies the dominant weight traffic R-fold as well; what fusion
    # buys is shared input/activation reads and one dispatch instead of R.
    # Measured on v5e at R=8 (a seed-study width): 0.83-1.28x aggregate vs
    # 8 sequential single-run epochs across tunnel windows — compute
    # parity, honestly reported as `multi_run_scaling_vs_single`. The
    # wall-clock win of train-multi is amortizing host round-trips and
    # compiles across a whole seeds x rhos grid, not MXU fill.
    from asr_using_robust_nn_tpu.train.multi_run import (
        build_multi_run_epoch_fn, init_multi_run_state)

    n_runs = 8

    def measure_multi_epoch(cfg, opt, con):
        mr_fn = build_multi_run_epoch_fn(
            cfg, opt, con.apply, batch_size=bs,
            epochs_per_call=n_epochs_chain)
        act = jax.device_put(np.ones((n_runs,), bool))

        def fresh_trees(seed):
            st = init_multi_run_state(
                cfg, opt,
                list(range(seed, seed + n_runs)), con.init)
            return st  # (params, state, opt_state, cstate, kp, kd)

        def fetch(st, n_calls):
            p, s, o, c, kp, kd = st
            out = mr_fn(p, s, o, c, data, lab, kp, kd, act, None,
                        n_true=n_true)
            for _ in range(n_calls - 1):
                out = mr_fn(out[0], out[1], out[2], out[3], data, lab, kp,
                            kd, act, None, n_true=n_true)
            return float(np.asarray(out[4])[0])

        t_per_call, _ = _paired_time(
            fetch, lambda i: fresh_trees(100 + i * n_runs), 1, rtt)
        return t_per_call / n_epochs_chain  # seconds per R-run epoch

    t_mr_v = {}
    for name in ("f32", "bf16", "lean", "lean_pi1"):
        cfg_v, tcfg_v, con_v = variants[name]
        opt_v = adam_optimizer(tcfg_v.learning_rate,
                               tcfg_v.adam_moments_dtype)
        t_mr_v[name] = measure_multi_epoch(cfg_v, opt_v, con_v)

    # Pallas multi-run: lax.scan over runs of the epoch-grid kernel — each
    # run keeps the single-run kernel's VMEM residency, so aggregate time
    # tracks R x the single pallas epoch instead of R x the (weight-
    # traffic-multiplied) vmapped XLA epoch (VERDICT r4 weak-item 2). Same
    # winner-eligibility gate as the single-run pallas arm: the kernel's
    # numeric parity verdict.
    mr_pallas_error = None
    try:
        if "pallas" in t_epoch_v:
            from asr_using_robust_nn_tpu.train.multi_run import (
                build_multi_run_fused_epoch_fn, init_multi_run_fused_state)

            mr_pl = build_multi_run_fused_epoch_fn(
                spec, epochs_per_call=n_epochs_chain, reshuffle_inner=False)

            def fresh_mr(seed):
                return init_multi_run_fused_state(
                    spec, list(range(seed, seed + n_runs)))

            def fetch_mr(st, n_calls):
                fs, kps, kds = st
                out = mr_pl(fs, data_p, lab, kps, kds, None, n_true=n_true)
                for _ in range(n_calls - 1):
                    out = mr_pl(out[0], data_p, lab, kps, kds, None,
                                n_true=n_true)
                return float(np.asarray(out[1])[0])

            t_call, _ = _paired_time(
                fetch_mr, lambda i: fresh_mr(500 + i * n_runs), 1, rtt)
            t_mr_v["pallas"] = t_call / n_epochs_chain
    except Exception as e:  # record, never sink the whole bench
        mr_pallas_error = f"{type(e).__name__}: {e}"[:300]
    mr_eligible = {
        k: v for k, v in t_mr_v.items()
        if k != "pallas" or (pallas_epoch_parity or {}).get("ok")
    }
    mr_variant = min(mr_eligible, key=mr_eligible.get)
    t_mr = t_mr_v[mr_variant]

    # Stage 3: FGSM adversarial eval (generate adversarial batch + predict).
    def logits_fn(xx):
        return apply_mlp(mcfg, params2, state2, xx, train=False)[0]

    def fgsm_eval(xx):
        adv = fgsm(logits_fn, xx, y, 0.1)
        return logits_fn(adv)

    t_fgsm = _time_chain(fgsm_eval, x, n_iter_fgsm, rtt)
    fgsm_utts_per_s = bs / t_fgsm

    # Stage 3b: the REST of the attack matrix, one representative config
    # per family at the reference's ART-default budgets (VERDICT r4 item 8;
    # `Voice digit recogniton/attacks.py:493-693`): PGD eps=0.1 /
    # eps_step=0.1 / 100 iters, JSMA theta=10 / gamma=0.1 random targets,
    # C&W-L2 10 binary-search steps x 10 iters with the ART line search.
    from asr_using_robust_nn_tpu.attacks.whitebox import (carlini_l2, jsma,
                                                          pgd)

    kj = jax.random.PRNGKey(9)
    t_pgd = _time_chain(lambda xx: pgd(logits_fn, xx, y, 0.1), x, 2, rtt)
    t_jsma = _time_chain(lambda xx: jsma(logits_fn, xx, key=kj), x, 1, rtt)
    t_cw = _time_chain(lambda xx: carlini_l2(logits_fn, xx, y), x, 1, rtt)
    attack_utts_per_s = {
        "pgd": bs / t_pgd,
        "jsma": bs / t_jsma,
        "cw_l2": bs / t_cw,
    }

    # Stage 4: serving path (serve/engine.py) — warm p50/p95 per padding
    # bucket for f32 AND int16 ingress (VERDICT r4 item 5: the int16 win
    # was implemented + bit-equality-tested in round 4 but never measured).
    # classify() wall time INCLUDES host packing + host->device transfer —
    # on this tunnel the transfer dominates small buckets, which is exactly
    # what the int16 ingress halves. Fresh random audio per request: the
    # axon runtime memoizes repeated pure executions on identical buffers.
    from asr_using_robust_nn_tpu.serve.engine import InferenceEngine

    serve_buckets = (16,) if quick else (16, 64)
    n_serve = 8 if quick else 14
    eng = InferenceEngine(mcfg, cfg, params2, state2, scaler=None,
                          buckets=serve_buckets)
    eng.warmup()
    serving = {}
    for b in serve_buckets:
        for dt in ("float32", "int16"):
            lat = []
            for i in range(n_serve):
                if dt == "int16":
                    w = rng.integers(-3000, 3000, (b, 22050),
                                     dtype=np.int16)
                else:
                    w = (rng.standard_normal((b, 22050)) * 0.1).astype(
                        np.float32)
                lat.append(eng.classify(w)["latency_s"])
            a = np.asarray(lat)
            serving[f"b{b}_{dt}"] = {
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
                "n": n_serve,
            }
    big = serve_buckets[-1]
    serving["requests_per_s"] = 1e3 / serving[f"b{big}_int16"]["p50_ms"]
    serving["utts_per_s"] = big * serving["requests_per_s"]

    # Composite: one utterance featurized + trained on (1 epoch ~ 1 visit) +
    # FGSM-evaluated.
    per_utt = t_mfcc / b_mfcc + t_train / bs + t_fgsm / bs

    # MFU: analytic GEMM FLOPs over measured wall time vs the chip's MXU
    # peak at the precision the kernel actually runs (VERDICT r1 "what's
    # weak" 3 / next-round 10). The int8 rDFT executes on the MXU's int8
    # path at 2x the bf16 rate, so its utilization is judged against the
    # int8 peak — dividing int8 throughput by the bf16 peak would overstate
    # MFU (ADVICE r2).
    peak = _PEAK_BF16.get(jax.devices()[0].device_kind)
    mfcc_backend = ("pallas" if t_mfcc == t_pallas
                    else "hopdft_int8" if t_mfcc == t_hop8
                    else "hopdft" if t_mfcc == t_hop
                    else "int8" if t_mfcc == t_int8 else "xla")
    # Two distinct utilization views (round-3 review):
    #  - mfu_vs_peak: USEFUL work vs the bf16 peak, with the direct-DFT
    #    analytic model as the common yardstick for every digit backend
    #    (flash-attention-style accounting: an algorithm that needs fewer
    #    FLOPs for the same output gets credit). This is the standard MFU
    #    definition.
    #  - mxu_occupancy: ops the kernel actually EXECUTES vs the peak of the
    #    unit it runs on (int8 peak = 2x bf16). precision=highest and the
    #    bf16_x6/x3 DotAlgorithms run 6x/3x bf16 passes per logical GEMM;
    #    the int8 digit decomposition runs 6 digit GEMMs per logical GEMM.
    fe_model = frontend_flops_per_utt(cfg)
    fe_exec_base = (frontend_hopdft_flops_per_utt(cfg)
                    if "hopdft" in mfcc_backend else fe_model)
    fe_exec_mult = 6.0  # highest(X6)/int8 digit pairs — every digit winner
    fe_rate = 2.0 if "int8" in mfcc_backend else 1.0
    sp_model = frontend_flops_per_utt(scfg)
    sp_exec_mult = {"xla_bf16x6": 6.0, "xla_bf16x3": 3.0,
                    "pallas_bf16x3": 3.0}.get(speaker_backend, 6.0)
    fe_flops = fe_model * mfcc_utts_per_s
    sp_flops = sp_model * speaker_utts_per_s
    tr_flops = train_step_flops_per_utt(mcfg) * train_utts_per_s
    ep_flops = train_step_flops_per_utt(mcfg) * n_true / t_epoch
    mr_flops = train_step_flops_per_utt(mcfg) * n_true * n_runs / t_mr

    # Contention sentinel: the shared dev chip occasionally time-slices
    # 10-20x slower for minutes at a stretch (observed 2026-08-18: one full
    # run landed uniformly ~20x slow between two healthy runs). Re-time the
    # already-compiled int8 digit frontend at the END of the run; a large
    # start->end drift marks the WHOLE run suspect so main() can retry once
    # and the recorded JSON carries the evidence either way.
    t_int8_end = _time_chain(
        lambda w: mfcc_int8_batch(w, cfg), waves, n_iter, rtt)
    drift = t_int8_end / t_int8
    # Host-load leg of the sentinel (added after 2026-08-21: a concurrent
    # single-core Keras run inflated the pallas epoch 2.8x while the XLA
    # arms barely moved — dispatch-heavy legs are the load-sensitive ones,
    # and the drift check alone cannot see load that is steady across the
    # whole run). Signal: CPU seconds consumed by OTHER processes during
    # this run — /proc/stat aggregate busy delta minus our own os.times()
    # delta, as a fraction of wall time. Idle-box daemons sit well under
    # 2%; the contaminating Keras fit was ~60% of the core.
    busy1 = _cpu_busy_seconds()
    wall_run = time.time() - _bench_wall0
    other_cpu_frac = None
    if _bench_busy0 is not None and busy1 is not None and wall_run > 0:
        self_cpu = sum(os.times()[:4]) - _bench_self0
        other_cpu_frac = max(0.0, (busy1 - _bench_busy0) - self_cpu) / wall_run
    host_loaded = other_cpu_frac is not None and other_cpu_frac > 0.2
    sanity = {
        "mfcc_int8_ms_start": t_int8 * 1e3,
        "mfcc_int8_ms_end": t_int8_end * 1e3,
        "drift_ratio": drift,
        "other_cpu_frac": (None if other_cpu_frac is None
                           else round(other_cpu_frac, 4)),
        "host_loaded": bool(host_loaded),
        "contention_suspected": bool(
            drift > 1.5 or drift < 1 / 1.5 or host_loaded),
    }
    return {
        "mfcc_utts_per_s": mfcc_utts_per_s,
        "mfcc_backend": mfcc_backend,
        "mfcc_speaker_utts_per_s": speaker_utts_per_s,
        "mfcc_speaker_backend": speaker_backend,
        "mfcc_speaker_parity": 4.9e-4,  # max |err| vs f64 oracle on TPU
        "mfcc_speaker_utts_per_s_fast": b_mfcc / t_speaker_fast,
        "mfcc_speaker_backend_fast": speaker_fast_backend,
        "mfcc_speaker_parity_fast": 2.4e-3,
        "train_utts_per_s": train_utts_per_s,
        "train_precision": train_variant,
        "train_utts_per_s_by_variant": {k: bs / v
                                        for k, v in t_train_v.items()},
        "fused_epoch_ms": t_epoch * 1e3,
        "fused_epoch_precision": epoch_variant,
        "fused_epoch_variant": epoch_variant,
        "fused_epoch_ms_by_variant": {k: v * 1e3
                                      for k, v in t_epoch_v.items()},
        "fused_epoch_pallas_error": pallas_epoch_error,
        "fused_epoch_pallas_parity": pallas_epoch_parity,
        "fused_epoch_rows": n_true,
        "multi_run_epoch_ms": t_mr * 1e3,
        "multi_run_epoch_ms_per_run": t_mr * 1e3 / n_runs,
        "multi_run_n_runs": n_runs,
        "multi_run_precision": mr_variant,
        "multi_run_epoch_ms_by_variant": {k: v * 1e3
                                          for k, v in t_mr_v.items()},
        "multi_run_pallas_error": mr_pallas_error,
        "multi_run_scaling_vs_single": (t_epoch * n_runs) / t_mr,
        "fgsm_utts_per_s": fgsm_utts_per_s,
        "attack_utts_per_s": attack_utts_per_s,
        "serving": serving,
        "pipeline_utts_per_s": 1.0 / per_utt,
        "flops_per_s": {
            "frontend_digit": fe_flops,
            "frontend_speaker": sp_flops,
            "train_step": tr_flops,
            "fused_epoch": ep_flops,
            "multi_run_epoch": mr_flops,
        },
        "mfu_vs_peak": (
            {
                # useful-work MFU: direct-DFT model FLOPs vs bf16 peak —
                # the common yardstick across digit backends
                "frontend_digit": fe_flops / peak,
                "frontend_speaker": sp_flops / peak,
                "train_step": tr_flops / peak,
                "fused_epoch": ep_flops / peak,
                "multi_run_epoch": mr_flops / peak,
                "peak_flops_bf16": peak,
                "device_kind": jax.devices()[0].device_kind,
            }
            if peak
            else None
        ),
        "mxu_occupancy": (
            {
                # executed ops vs the rate-adjusted peak of the unit the
                # kernel runs on (X6/X3 emulation passes and int8 digit
                # GEMMs counted; int8 peak = 2x bf16)
                "frontend_digit": (fe_exec_base * fe_exec_mult
                                   * mfcc_utts_per_s) / (peak * fe_rate),
                "frontend_digit_peak": peak * fe_rate,
                "frontend_speaker": (sp_model * sp_exec_mult
                                     * speaker_utts_per_s) / peak,
            }
            if peak
            else None
        ),
        "rtt_ms": rtt * 1e3,
        "backend": jax.default_backend(),
        "sanity": sanity,
    }


def load_reference_baseline() -> dict | None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baselines", "reference_cpu.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def _backend_reachable(timeout_s: float) -> bool:
    """Initialize the default JAX backend on a daemon thread with a
    deadline. The axon tunnel's PJRT client build blocks INDEFINITELY when
    the tunnel is unreachable (observed 2026-08-17); without this guard an
    outage turns the driver's bench run into an eternal hang instead of a
    diagnosable JSON line. On success the initialized backend is process-
    cached, so the daemon thread's work is not repeated."""
    import threading

    done = threading.Event()

    def _init():
        import jax

        jax.devices()
        done.set()

    threading.Thread(target=_init, daemon=True).start()
    return done.wait(timeout_s)


def main(quick: bool = False) -> int:
    # deadline strictly exceeds one wait window so a slow-but-successful
    # init (observed ~2 min through the tunnel) gets a second chance; after
    # the deadline do one final short recheck — the init thread may have
    # completed just after the last wait expired (the backend is process-
    # cached once any thread finishes)
    deadline = time.monotonic() + (300 if quick else 900)
    while not _backend_reachable(timeout_s=120):
        if time.monotonic() >= deadline and not _backend_reachable(
                timeout_s=5):
            print(json.dumps({
                "metric": "MFCC+train+FGSM pipeline throughput",
                "value": None,
                "unit": "utterances/sec/chip",
                "vs_baseline": None,
                "error": ("JAX default backend failed to initialize before "
                          "the deadline (axon TPU tunnel unreachable: PJRT "
                          "client build blocks). No measurement taken - see "
                          "the last recorded BENCH_r*.json for prior-round "
                          "numbers."),
            }))
            return 1
    stats = measure_tpu(quick=quick)
    if stats.get("sanity", {}).get("contention_suspected"):
        # one bounded retry: keep the faster (less-contended) run, record
        # the discarded composite so the band is visible in the artifact
        retry = measure_tpu(quick=quick)
        keep, drop = ((retry, stats)
                      if retry["pipeline_utts_per_s"]
                      > stats["pipeline_utts_per_s"] else (stats, retry))
        keep["sanity"]["runs"] = 2
        keep["sanity"]["discarded_pipeline_utts_per_s"] = (
            drop["pipeline_utts_per_s"])
        stats = keep
    ref = load_reference_baseline()
    vs = None
    if ref and ref.get("pipeline_utts_per_s"):
        vs = stats["pipeline_utts_per_s"] / ref["pipeline_utts_per_s"]
    full = {
        "metric": "MFCC+train+FGSM pipeline throughput",
        "value": round(stats["pipeline_utts_per_s"], 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": stats,
        "reference_cpu": ref,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    # stdout gets ONE COMPACT line (< ~1500 chars): the round-3 full record
    # outgrew the driver's 2000-char tail capture and landed unparseable
    # (BENCH_r03.json parsed=null — VERDICT r3 item 1). Headline keys are
    # rounded; the complete record lives in bench_full.json.
    mfu = stats.get("mfu_vs_peak") or {}
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "headline": {
            "mfcc_digit_utts_per_s": round(stats["mfcc_utts_per_s"], 1),
            "mfcc_backend": stats["mfcc_backend"],
            "mfcc_speaker_utts_per_s": round(
                stats["mfcc_speaker_utts_per_s"], 1),
            "mfcc_speaker_backend": stats["mfcc_speaker_backend"],
            "train_utts_per_s": round(stats["train_utts_per_s"], 1),
            "train_precision": stats["train_precision"],
            "fused_epoch_ms": round(stats["fused_epoch_ms"], 4),
            "fused_epoch_variant": stats.get("fused_epoch_variant",
                                             stats["fused_epoch_precision"]),
            "multi_run_epoch_ms_per_run": round(
                stats["multi_run_epoch_ms_per_run"], 4),
            "multi_run_variant": stats["multi_run_precision"],
            "multi_run_scaling_vs_single": round(
                stats["multi_run_scaling_vs_single"], 3),
            "fgsm_utts_per_s": round(stats["fgsm_utts_per_s"], 1),
            "attack_utts_per_s": {k: round(v, 1) for k, v in
                                  stats["attack_utts_per_s"].items()},
            "serve_p50_ms": {k: round(v["p50_ms"], 1) for k, v in
                             stats["serving"].items()
                             if isinstance(v, dict)},
            "serve_utts_per_s": round(stats["serving"]["utts_per_s"], 1),
            "fused_epoch_pallas_parity_ok": (
                None if stats["fused_epoch_pallas_parity"] is None
                else stats["fused_epoch_pallas_parity"]["ok"]),
            "mfu_vs_peak": {k: round(v, 4) for k, v in mfu.items()
                            if isinstance(v, float) and v < 1e6},
            "device_kind": mfu.get("device_kind"),
            "backend": stats["backend"],
            "rtt_ms": round(stats["rtt_ms"], 2),
            "contention_suspected": stats["sanity"]["contention_suspected"],
        },
        "full_record": "bench_full.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1900, f"compact bench line too long: {len(line)}"
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(quick="--quick" in sys.argv))
