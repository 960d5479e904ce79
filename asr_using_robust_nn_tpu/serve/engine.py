"""Serving path: raw waveforms -> label, one jitted program per bucket.

The reference has no deployment story — classification at "serving time"
is `model.predict` on pre-extracted `.npy` features (`Voice digit
recogniton/train_google_dataset.py:89-91`) and the attack harness re-runs
the librosa frontend file-by-file on the host
(`VD/attacks.py:105-119`). This module is the production analog built
TPU-first: the entire request path

    waveform batch -> fused MFCC -> standardize -> MLP logits -> probs

is ONE XLA program (the same fusion the attack sweeps use,
`attacks/sweeps.py::fused_audio_sweep`), compiled once per padding bucket
so arbitrary request sizes never retrace. Padding rows are exact no-ops:
inference has no cross-row reduction (the scaler is frozen train-time
moments and BatchNorm uses moving statistics), so padded outputs are
sliced off on the host.

Speaker-task long recordings follow the reference's slicing protocol
(1-second windows, first and last second dropped —
`Speaker recognition/extract_features_construct_dataset.py:203-222`): the
engine classifies every window in one batch and aggregates per recording
by majority vote or mean probability.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from ..models.mlp import MLPConfig, apply_mlp
from ..ops.mfcc_xla import FrontendConfig
from ..train.checkpoints import CheckpointManager, import_keras_h5, \
    validate_model_tree

__all__ = ["InferenceEngine", "load_checkpoint"]

# powers-of-4 ladder: at most ~4x padded waste per request, 4 compiles to
# cover 1..1024 rows; larger requests run in max-bucket chunks
_DEFAULT_BUCKETS = (16, 64, 256, 1024)


def load_checkpoint(path, cfg: MLPConfig):
    """(params, state) from an Orbax ckpt dir (`best/`) or a Keras-layout
    .h5 — the library-level twin of the CLI's `load_model` (which wraps
    errors in SystemExit for shell UX; this raises ValueError)."""
    import os

    if str(path).endswith(".h5"):
        if not os.path.exists(path):
            raise ValueError(f"checkpoint file {path!r} not found")
        return import_keras_h5(path, cfg)
    if not os.path.exists(os.path.join(str(path), "best")):
        raise ValueError(
            f"no checkpoint at {path!r} (expected an Orbax dir with 'best/' "
            f"or a .h5 file)"
        )
    tree, _ = CheckpointManager(path).load_best()
    params, state = tree["params"], tree["state"]
    validate_model_tree(params, state, cfg)
    return params, state


class InferenceEngine:
    """Batched audio classifier with bucketed compile reuse.

    Args:
      model_cfg / frontend_cfg: the task's MLP and MFCC parameterizations
        (`MLPConfig.digit_*` + `FrontendConfig.digit()`, etc.).
      params / state: trained model tree (see `load_checkpoint`).
      scaler: (mean, scale) from train-time standardization
        (`data/pipeline.py::standardize_fit_all` returns them), or None if
        the model was trained on raw features.
      backend: frontend backend name ('auto' picks the measured-fastest
        parity kernel for the platform, `frontend/mfcc.py`).
      buckets: ascending batch-padding ladder; each bucket compiles once.
      wave_width: fixed waveform sample width per program. Default
        1 s at cfg.sr — the reference's canonical utterance/window length
        for both tasks; shorter inputs are masked exactly via per-row
        `lengths`, longer ones truncated (digit MFCCs are cut to 44 frames
        regardless, `VD/extract_features_construct_dataset.py:33-37`).
    """

    def __init__(self, model_cfg: MLPConfig, frontend_cfg: FrontendConfig,
                 params, state, scaler=None, backend: str = "auto",
                 buckets=_DEFAULT_BUCKETS, wave_width: int | None = None):
        from ..frontend.mfcc import Frontend

        if list(buckets) != sorted(set(int(b) for b in buckets)) or \
                min(buckets) < 1:
            raise ValueError(f"buckets must be ascending unique positive "
                             f"ints, got {buckets!r}")
        self.model_cfg = model_cfg
        self.frontend_cfg = frontend_cfg
        self.buckets = tuple(int(b) for b in buckets)
        self.wave_width = int(wave_width or frontend_cfg.sr)
        self._fe = Frontend(frontend_cfg, backend=backend)
        self._params = jax.device_put(params)
        self._state = jax.device_put(state)
        if scaler is not None:
            mean, scale = scaler
            self._scaler = (jax.device_put(jnp.asarray(mean, jnp.float32)),
                            jax.device_put(jnp.asarray(scale, jnp.float32)))
        else:
            self._scaler = None
        self._programs: dict[int, object] = {}
        self.latencies_s: list[float] = []  # per classify() call, warm only
        self._warm: set[int] = set()

    # -- construction helpers ------------------------------------------------

    @classmethod
    def from_checkpoint(cls, task: str, variant: str, ckpt_path,
                        artifacts_dir=None, standardize: bool = True,
                        **kw) -> "InferenceEngine":
        """Build an engine from a trained checkpoint. `artifacts_dir` (the
        `prepare-data` output the model was trained on) re-derives the
        reference's fit-on-all scaler moments; pass standardize=False for
        models trained on raw features."""
        from ..data import load_artifacts, standardize_fit_all

        model_cfg = {
            ("digit", "unconstrained"): MLPConfig.digit_unconstrained,
            ("digit", "constrained"): MLPConfig.digit_constrained,
            ("speaker", "unconstrained"): MLPConfig.speaker_unconstrained,
            ("speaker", "constrained"): MLPConfig.speaker_constrained,
        }[(task, variant)]()
        fe_cfg = (FrontendConfig.digit() if task == "digit"
                  else FrontendConfig.speaker())
        params, state = load_checkpoint(ckpt_path, model_cfg)
        scaler = None
        if standardize:
            if artifacts_dir is None:
                raise ValueError(
                    "standardize=True needs artifacts_dir to re-derive the "
                    "train-time scaler moments (or pass scaler= explicitly "
                    "to InferenceEngine)")
            d = load_artifacts(artifacts_dir)
            _, _, _, mean, scale = standardize_fit_all(
                d.train_data, d.dev_data, d.test_data)
            scaler = (mean, scale)
        return cls(model_cfg, fe_cfg, params, state, scaler=scaler, **kw)

    # -- the compiled request program ----------------------------------------

    def _program(self, bucket: int, dtype: str):
        prog = self._programs.get((bucket, dtype))
        if prog is not None:
            return prog
        mfcc_fn = self._fe._BACKENDS[self._fe.backend]
        fe_cfg, m_cfg = self.frontend_cfg, self.model_cfg
        use_scaler = self._scaler is not None

        @jax.jit
        def request(params, state, waves, lengths, mean, scale):
            if waves.dtype == jnp.int16:
                # int16 PCM ingress: ship half the tunnel bytes and
                # dequantize ON DEVICE. x/32768 is EXACT for PCM-origin
                # audio (a power-of-two division of integers that came
                # from int16 samples — ops/mfcc_int8.py:30-36), so this
                # path is bit-identical to f32 ingress of w/32768
                # (VERDICT r3 item 4: the warm path was transfer-bound).
                waves = waves.astype(jnp.float32) * jnp.float32(1 / 32768)
            feats = mfcc_fn(waves, fe_cfg, lengths=lengths)
            feats = feats.reshape(feats.shape[0], -1)
            if use_scaler:
                feats = (feats - mean) / scale
            logits, _ = apply_mlp(m_cfg, params, state, feats, train=False)
            return jax.nn.softmax(logits, axis=-1)

        self._programs[(bucket, dtype)] = request
        return request

    def warmup(self, buckets=None, dtypes=("float32", "int16")) -> None:
        """Compile (and once-execute) the request program for each
        (bucket, ingress dtype) pair so first real requests don't pay the
        trace+compile latency."""
        for b in buckets if buckets is not None else self.buckets:
            for dt in dtypes:
                w = np.zeros((b, self.wave_width), np.dtype(dt))
                lens = np.full((b,), self.wave_width, np.int64)
                np.asarray(self._run_bucket(w, lens, int(b)))
                self._warm.add((int(b), np.dtype(dt).name))

    def _run_bucket(self, waves, lengths, bucket):
        mean, scale = self._scaler if self._scaler is not None else (
            jnp.float32(0), jnp.float32(1))
        return self._program(bucket, np.asarray(waves).dtype.name)(
            self._params, self._state, waves, lengths, mean, scale)

    # -- public classification API -------------------------------------------

    def classify(self, waves, lengths=None) -> dict:
        """Classify a batch of waveforms.

        `waves`: (B, L) float OR int16-PCM array, or a list of 1-D arrays
        of varying lengths. int16 rows transfer as int16 and dequantize on
        device (bit-identical to f32 ingress of w/32768, at half the
        transfer bytes). Returns {"labels": (B,) int64, "probs":
        (B, n_classes) float32, "latency_s": float}. Rows are padded to the
        enclosing bucket (exact no-op per the module docstring) and
        oversized requests run in max-bucket chunks.
        """
        w, lens = self._pack(waves, lengths)
        n = w.shape[0]
        t0 = time.perf_counter()
        cap = self.buckets[-1]
        probs_out = []
        for start in range(0, n, cap):
            chunk, clens = w[start:start + cap], lens[start:start + cap]
            m = chunk.shape[0]
            bucket = next(b for b in self.buckets if b >= m) if \
                m <= cap else cap
            if m < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - m, self.wave_width),
                                     w.dtype)], 0)
                clens = np.concatenate(
                    [clens, np.full((bucket - m,), self.wave_width,
                                    np.int64)], 0)
            probs = np.asarray(self._run_bucket(chunk, clens, bucket))
            probs_out.append(probs[:m])
        probs = np.concatenate(probs_out, 0)
        dt = time.perf_counter() - t0
        # warm-path latency stats only: a cold call measures XLA compile
        # time, not the serving path (warmth tracked per (bucket, dtype) —
        # the f32 and int16 ingress paths compile separately)
        touched = [(b, w.dtype.name) for b in self._buckets_touched(n)]
        if all(t in self._warm for t in touched):
            self.latencies_s.append(dt)
        else:
            self._warm.update(touched)
        return {"labels": np.argmax(probs, axis=1), "probs": probs,
                "latency_s": dt}

    def classify_windows(self, wave, sr: int | None = None,
                         agg: str = "vote") -> dict:
        """Reference speaker protocol for one long recording: slice into
        1-s windows (first/last second dropped,
        `SR/extract_features_construct_dataset.py:203-222`), classify all
        windows as one batch, aggregate.

        agg: 'vote' (majority over window argmaxes, ties to the lower
        label id — np.argmax on the count vector) or 'mean' (argmax of the
        mean probability). Returns {"label", "window_labels", "probs",
        "n_windows", "latency_s"}; label is None if the recording is too
        short to yield a window.
        """
        from ..data.pipeline import slice_seconds

        if agg not in ("vote", "mean"):
            raise ValueError(f"agg must be 'vote' or 'mean', got {agg!r}")
        windows = slice_seconds(np.asarray(wave, np.float32),
                                sr=sr or self.frontend_cfg.sr)
        if windows.shape[0] == 0:
            return {"label": None, "window_labels": np.zeros((0,), np.int64),
                    "probs": np.zeros((0, self.model_cfg.n_classes),
                                      np.float32),
                    "n_windows": 0, "latency_s": 0.0}
        out = self.classify(windows)
        wl = out["labels"]
        if agg == "vote":
            label = int(np.bincount(wl,
                                    minlength=self.model_cfg.n_classes)
                        .argmax())
        else:
            label = int(out["probs"].mean(axis=0).argmax())
        return {"label": label, "window_labels": wl, "probs": out["probs"],
                "n_windows": int(windows.shape[0]),
                "latency_s": out["latency_s"]}

    def classify_files(self, paths, agg: str | None = None) -> list[dict]:
        """Decode WAVs (C++ fast path + polyphase resample to cfg.sr,
        `utils/audio_io.py`) and classify. With `agg` (speaker task), each
        file goes through `classify_windows`; otherwise each file is one
        utterance. Returns one dict per file (adds "path")."""
        from ..utils.audio_io import load_audio

        results = []
        if agg is not None:
            for p in paths:
                y, _ = load_audio(p, target_sr=self.frontend_cfg.sr)
                r = self.classify_windows(y, agg=agg)
                r["path"] = str(p)
                results.append(r)
            return results
        waves = []
        for p in paths:
            y, _ = load_audio(p, target_sr=self.frontend_cfg.sr)
            waves.append(y)
        out = self.classify(waves)
        for i, p in enumerate(paths):
            results.append({"path": str(p), "label": int(out["labels"][i]),
                            "probs": out["probs"][i],
                            "latency_s": out["latency_s"]})
        return results

    # -- stats ----------------------------------------------------------------

    def latency_stats(self) -> dict:
        """Percentiles over recorded warm classify() calls."""
        if not self.latencies_s:
            return {"n": 0}
        a = np.asarray(self.latencies_s)
        return {"n": int(a.size), "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "p99_ms": float(np.percentile(a, 99) * 1e3),
                "mean_ms": float(a.mean() * 1e3)}

    # -- internals -------------------------------------------------------------

    def _buckets_touched(self, n: int) -> list[int]:
        cap = self.buckets[-1]
        out = []
        left = n
        while left > 0:
            m = min(left, cap)
            out.append(next(b for b in self.buckets if b >= m))
            left -= m
        return out

    def _pack(self, waves, lengths):
        """-> (B, wave_width) f32 OR int16 + (B,) int64 true lengths.

        int16 input stays int16 end-to-end to the device (half the
        host->device tunnel bytes — the dominant warm-path cost, VERDICT r3
        item 4); dequantization happens inside the compiled program and is
        bit-exact for PCM-origin audio. Mixed-dtype lists fall back to f32
        (callers there are already paying a host conversion)."""
        W = self.wave_width
        if isinstance(waves, np.ndarray) and waves.ndim == 2:
            rows = [waves[i] for i in range(waves.shape[0])]
        else:
            rows = [np.asarray(r).reshape(-1) for r in waves]
        if not rows:
            raise ValueError("classify() needs at least one waveform")
        int16_in = all(r.dtype == np.int16 for r in rows)
        dt = np.int16 if int16_in else np.float32
        out = np.zeros((len(rows), W), dt)
        lens = np.empty((len(rows),), np.int64)
        for i, r in enumerate(rows):
            m = min(len(r), W)
            if int16_in:
                out[i, :m] = r[:m]
            elif r.dtype == np.int16:
                # int16 rows ALWAYS mean PCM: a mixed-dtype batch loses the
                # transfer saving but must keep the same interpretation
                out[i, :m] = r[:m].astype(np.float32) / 32768.0
            else:
                out[i, :m] = np.asarray(r[:m], np.float32)
            lens[i] = m
        if lengths is not None:
            lens = np.minimum(np.asarray(lengths, np.int64), W)
        return out, lens
