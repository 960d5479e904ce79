"""Frontend dispatcher: one API over the XLA and Pallas MFCC kernels.

Usage:
    fe = Frontend(FrontendConfig.digit())          # backend='auto'
    feats = fe(waves)                              # (B, 20, 44)
    flat = fe.flat(waves)                          # (B, 880) reference layout

backend='auto' picks the Pallas kernel on TPU and the pure-XLA path
elsewhere (Pallas interpret mode is numerics-inferior on CPU: plain-f32
matmuls vs XLA CPU's f64 upcast under precision=highest).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.mfcc_xla import FrontendConfig, mfcc_xla_batch
from ..ops.pallas_mfcc import mfcc_pallas_batch

__all__ = ["Frontend"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


class Frontend:
    """Batched waveform -> MFCC features, reference layout (B, n_mfcc, T).

    Drop-in, batched replacement for the reference's per-file
    `extract_features(file_path, utterance_length)` (`Voice digit
    recogniton/extract_features_construct_dataset.py:24-39`).
    """

    def __init__(self, cfg: FrontendConfig, backend: str = "auto"):
        if backend == "auto":
            backend = "pallas" if _on_tpu() else "xla"
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown frontend backend {backend!r}")
        self.cfg = cfg
        self.backend = backend

    def __call__(self, waves, lengths=None):
        waves = np.ascontiguousarray(waves, dtype=np.float32) if isinstance(
            waves, np.ndarray
        ) else waves
        if self.backend == "pallas":
            return mfcc_pallas_batch(waves, self.cfg, lengths=lengths)
        return mfcc_xla_batch(waves, self.cfg, lengths=lengths)

    def flat(self, waves, lengths=None):
        """Features flattened to (B, n_mfcc * T) — the .npy artifact layout
        (`compute_mfcc_all_files` flatten, `VD/...:149`)."""
        out = self(waves, lengths=lengths)
        return out.reshape(out.shape[0], -1)
