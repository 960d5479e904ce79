"""Fused-epoch A/B arbiter: XLA lean vs lean_pi1 vs Pallas epoch-grid.

Round-4 left the headline internally contradictory (VERDICT r4 weak-item
1): the in-tree verdict on the Pallas epoch-grid kernel
(`ops/pallas_train.py::_make_epoch_kernel`) recorded 8.6-9.4 ms/epoch —
a measured NEGATIVE vs the XLA lean epoch's 4.75 — from the builder's
2026-08-19 window, while the driver's BENCH_r04.json recorded the SAME
kernel as the fused-epoch winner at 2.07 ms (38.97% MFU), contention
sentinel clean. This script arbitrates: all three arms measured PAIRED
and ORDER-BALANCED inside one tunnel window (each cycle times every arm;
cycle order alternates forward/reverse so slow drift cancels instead of
biasing whichever arm runs last), several cycles, with the int8-frontend
contention sentinel bracketing the whole run — plus the numeric parity
gate (dropout-0 value comparison of the Pallas epoch against the XLA
epoch at bf16-class tolerances) that bench.py now also applies before
letting the pallas arm take the winner key.

Reference hot loop being bested either way:
`Voice digit recogniton/train_google_dataset.py:82-85` (Keras model.fit
on the digit split).

Usage: python tools/ab_epoch.py [--cycles N] [--epochs-per-call E]
Writes tools/ab_epoch_result.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parity_check(mcfg, bs, n_true, data, lab):
    """Delegates to the package-level gate (ops/pallas_train.py::
    epoch_parity_vs_xla) — the SAME function bench.py applies before the
    pallas arm may take the fused-epoch winner key, so the arbiter and
    the bench can never disagree on what "parity" means."""
    from asr_using_robust_nn_tpu.ops.pallas_train import epoch_parity_vs_xla

    return epoch_parity_vs_xla(mcfg, bs, data, lab, n_true)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=4,
                    help="order-balanced timing cycles (half fwd, half rev)")
    ap.add_argument("--epcs", default="8,32",
                    help="epochs-per-call values; TWO values let the fit "
                         "separate per-epoch compute from per-dispatch "
                         "overhead (t(epc) = compute + D/epc)")
    ap.add_argument("--quick", action="store_true",
                    help="small split + 2 cycles (smoke test)")
    args = ap.parse_args()

    import jax

    from bench import _measure_rtt, _paired_time, _time_chain
    from asr_using_robust_nn_tpu.constraints import make_simple_norm_constraint
    from asr_using_robust_nn_tpu.models.mlp import MLPConfig, init_mlp
    from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch
    from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig
    from asr_using_robust_nn_tpu.ops.pallas_train import (
        FusedStepSpec, build_fused_epoch_fn, pack_state, pad_features)
    from asr_using_robust_nn_tpu.train import TrainConfig
    from asr_using_robust_nn_tpu.train.epoch_scan import build_epoch_fn
    from asr_using_robust_nn_tpu.train.trainer import adam_optimizer

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mcfg = MLPConfig.digit_constrained()
    bs = 512
    n_true = 4096 if args.quick else 16566
    epcs = tuple(int(e) for e in args.epcs.split(","))
    cycles = 2 if args.quick else args.cycles
    n_pad = ((n_true + bs - 1) // bs) * bs
    data = jax.device_put(rng.standard_normal((n_pad, 880)).astype(np.float32))
    lab = jax.device_put(
        np.resize(rng.integers(0, 10, n_true).astype(np.int32), n_pad))
    pk, dk = jax.random.PRNGKey(3), jax.random.PRNGKey(4)

    fcfg = FrontendConfig.digit()
    waves = jax.device_put(
        (rng.standard_normal((512, 22050)) * 0.1).astype(np.float32))
    rtt = _measure_rtt(waves)
    t_sent_start = _time_chain(lambda w: mfcc_int8_batch(w, fcfg), waves, 4,
                               rtt)

    parity = parity_check(mcfg, bs, n_true, data, lab)
    print(f"parity gate (dropout-0, 1 epoch): {json.dumps(parity)}",
          flush=True)

    # ---- arm constructors, one per (variant, epochs_per_call) -------------
    # Two epc points per arm let the fit SEPARATE per-epoch compute from
    # per-dispatch overhead: t_per_epoch(epc) = compute + D/epc. The 2026-
    # 08-20 single-epc run showed why this matters — pallas calibrated to a
    # 1-call chain and sampled -34..+54 ms/epoch: its per-DISPATCH cost
    # (large donated operand set through the tunnel) is both large and
    # window-dependent, which is exactly the round-4 contradiction (2.07 ms
    # driver window vs 8.6-9.4 ms builder window) if the two windows had
    # different dispatch overheads baked into different chain lengths.
    tcfg_lean = TrainConfig(batch_size=bs, adam_moments_dtype="bfloat16")

    def xla_arm(n_iter_pi, epc):
        con = make_simple_norm_constraint(0.1, n_iter=n_iter_pi,
                                          matvec_dtype=jnp.bfloat16)
        opt = adam_optimizer(tcfg_lean.learning_rate,
                             tcfg_lean.adam_moments_dtype)
        ep = build_epoch_fn(mcfg, opt, constraint=con.apply, batch_size=bs,
                            epochs_per_call=epc, reshuffle_inner=False)

        def fresh(seed):
            p, s = init_mlp(mcfg, jax.random.PRNGKey(seed))
            return p, s, opt.init(p), con.init(p)

        def fetch(trees, n_calls):
            out = ep(*trees, data, lab, pk, dk, n_true=n_true)
            for _ in range(n_calls - 1):
                out = ep(out[0], out[1], out[2], out[3], data, lab, pk, dk,
                         n_true=n_true)
            return float(np.asarray(out[4]))

        return fetch, fresh

    def pallas_arm(epc):
        spec = FusedStepSpec(cfg=mcfg, batch=bs, rho=0.1, pi_iters=4)
        ep = build_fused_epoch_fn(spec, epochs_per_call=epc,
                                  reshuffle_inner=False)
        data_p = pad_features(spec, data)

        def fresh(seed):
            return pack_state(spec, *init_mlp(mcfg, jax.random.PRNGKey(seed)))

        def fetch(fs, n_calls):
            out = ep(fs, data_p, lab, pk, dk, n_true=n_true)
            for _ in range(n_calls - 1):
                out = ep(out[0], data_p, lab, pk, dk, n_true=n_true)
            return float(np.asarray(out[1]))

        return fetch, fresh

    configs = {}
    for epc in epcs:
        configs[("lean", epc)] = xla_arm(4, epc)
        configs[("lean_pi1", epc)] = xla_arm(1, epc)
        configs[("pallas", epc)] = pallas_arm(epc)

    # ---- calibrate each config ONCE (compile + pick chain length n), then
    # FLOOR n so each timed leg spans >= 128 epochs of compute: short
    # chains put dispatch jitter straight onto the per-epoch estimate ----
    seq = iter(range(100, 100_000))
    n_cfg: dict[tuple, int] = {}
    for key, (fetch, fresh) in configs.items():
        t0 = time.perf_counter()
        _, n = _paired_time(fetch, lambda i, fr=fresh: fr(next(seq)), 1, rtt,
                            reps=1)
        n = max(n, -(-128 // key[1]))
        n_cfg[key] = n
        print(f"calibrated {key[0]}@epc{key[1]}: n={n} "
              f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)

    # ---- order-balanced paired cycles ----
    def one_sample(key):
        fetch, fresh = configs[key]
        n = n_cfg[key]
        t0 = time.perf_counter()
        fetch(fresh(next(seq)), n)
        t1 = time.perf_counter()
        fetch(fresh(next(seq)), 2 * n)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / n / key[1]  # seconds per epoch

    order = list(configs)
    samples = {key: [] for key in configs}
    for c in range(cycles):
        cyc = order if c % 2 == 0 else order[::-1]
        for key in cyc:
            samples[key].append(one_sample(key))
        print(f"cycle {c + 1}/{cycles}: " + " ".join(
            f"{k[0]}@{k[1]}={samples[k][-1] * 1e3:.3f}ms" for k in cyc),
            flush=True)

    t_sent_end = _time_chain(lambda w: mfcc_int8_batch(w, fcfg), waves, 4,
                             rtt)
    drift = t_sent_end / t_sent_start

    def stats(xs):
        xs = sorted(xs)
        return {"median_ms": xs[len(xs) // 2] * 1e3,
                "min_ms": xs[0] * 1e3, "max_ms": xs[-1] * 1e3,
                "samples_ms": [x * 1e3 for x in xs]}

    arm_names = ("lean", "lean_pi1", "pallas")
    arms_out = {}
    for name in arm_names:
        med = {epc: stats(samples[(name, epc)])["median_ms"]
               for epc in epcs}
        entry = {f"epc{epc}": stats(samples[(name, epc)]) for epc in epcs}
        if len(epcs) >= 2:
            e1, e2 = min(epcs), max(epcs)
            # t(epc) = compute + D/epc  =>  D from the two medians
            disp_ms = (med[e1] - med[e2]) / (1.0 / e1 - 1.0 / e2)
            entry["compute_ms_per_epoch"] = med[e2] - disp_ms / e2
            entry["dispatch_ms_per_call"] = disp_ms
        entry["median_ms"] = med[max(epcs)]  # production-dispatch regime
        arms_out[name] = entry

    result = {
        "config": {"n_true": n_true, "batch": bs, "epcs": list(epcs),
                   "cycles": cycles, "rtt_ms": rtt * 1e3,
                   "device_kind": jax.devices()[0].device_kind},
        "parity": parity,
        "arms": arms_out,
        "sentinel": {"int8_ms_start": t_sent_start * 1e3,
                     "int8_ms_end": t_sent_end * 1e3,
                     "drift_ratio": drift,
                     "contention_suspected": bool(drift > 1.5
                                                  or drift < 1 / 1.5)},
    }
    meds = {k: v["median_ms"] for k, v in arms_out.items()}
    winner = min(meds, key=meds.get)
    result["winner"] = winner
    result["verdict"] = (
        f"{winner} wins at {meds[winner]:.3f} ms/epoch at epc={max(epcs)} "
        f"(medians: "
        + ", ".join(f"{k}={v:.3f}" for k, v in meds.items())
        + "; compute-only: "
        + ", ".join(f"{k}={v.get('compute_ms_per_epoch', float('nan')):.3f}"
                    for k, v in arms_out.items())
        + f"); parity_ok={parity['ok']}, "
          f"contention={result['sentinel']['contention_suspected']}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_epoch_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(result["verdict"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
