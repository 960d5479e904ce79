"""Frontend dispatcher: one API over the XLA and Pallas MFCC kernels.

Usage:
    fe = Frontend(FrontendConfig.digit())          # backend='auto'
    feats = fe(waves)                              # (B, 20, 44)
    flat = fe.flat(waves)                          # (B, 880) reference layout

backend='auto' resolves per preset from v5e measurements (RTT-subtracted,
cache/DCE-proof, 1024 utterances, parity vs the f64 oracle in parens;
2026-08-18 TPU window):

    digit (n_fft=2048):  int8 digit-decomposition   9.0 ms (4.8e-4)  <- auto
                         hopdft bf16_x3            10.1 ms (1.1e-3)
                         hopdft bf16_x6            11.5 ms (4.7e-4)
                         hopdft f32 HIGHEST        12.0 ms (4.7e-4)
                         pallas-int8 fused         13.0 ms (4.4e-4)
                         xla precision=HIGHEST     13.6 ms (4.7e-4)
                         hopdft_int8               17.6 ms (4.8e-4)
                           (the 4x DFT-MAC cut loses to the 3x-digit-group
                            int32 phase-combine traffic — measured negative)
                         pallas f32 HIGHEST        19.6 ms (4.5e-4)
    speaker (n_fft=441): xla bf16_x6 DFT        2.4-3.0 ms (4.9e-4)  <- auto
                         xla bf16_x3 DFT            2.2 ms (2.4e-3)
                           (speaker_fast() preset — opt-in parity trade)
                         xla precision=HIGHEST      3.2-4.1 ms (4.7e-4)
                         hopdft bf16_x3             3.6 ms (4.0e-3)
                         hopdft bf16_x6             4.0 ms (4.9e-4)
                         pallas-int8 fused          4.2 ms
                         int8 digit-decomposition   4.6 ms
                         pallas bf16x3 fused        4.7 ms (1.6e-3)

Speaker stage budget (v5e, B=1024, X6): framing 0.83 ms (pure data
movement — the hop=220/width=441 overlap concat), DFT+power ~2.1 ms,
mel+log+DCT ~0.6 ms. The preset is movement+emulation-bound, not
MXU-bound — confirmed experimentally by the round-3 hop-block
generalization (441 = 2*220 + 1 via an s=1 tail matmul): cutting DFT MACs
2x AND removing the framing expansion made it SLOWER (4.0 vs 2.4 ms),
because the phase-combine/3-tap-window stages add elementwise HBM traffic
exactly where the roofline said the bottleneck is. bf16_x3 (fewer DFT
passes, no extra movement) remains the practical fast mode.

The int8 path (ops/mfcc_int8.py) runs the rDFT as six exact int8 digit
products fused into three int8 MXU matmuls — the v5e MXU's 2x
int8-vs-bf16 rate beats HIGHEST's 6-pass bf16 emulation when the DFT
matmul is large (K = n_fft = 2048); at the speaker preset's K=441 the
digitize/accumulate overhead eats the saving, so auto keeps plain XLA
there. The crossover is gated on running on a TPU backend AND
n_fft >= 1024 (off-TPU there is no int8 rate edge). Mosaic's multi-pass f32
matmul keeps the Pallas kernels behind XLA at both presets (the VMEM
power-spectrum saving is smaller than XLA's better matmul schedule); they
stay available via backend='pallas' / 'pallas_int8' as fusion templates.
"""

from __future__ import annotations

import numpy as np

from ..ops.mfcc_hopdft import (
    hopdft_supported,
    mfcc_hopdft_batch,
    mfcc_hopdft_int8_batch,
    validate_hopdft,
)
from ..ops.mfcc_int8 import mfcc_int8_batch
from ..ops.mfcc_xla import FrontendConfig, mfcc_fft_batch, mfcc_xla_batch
from ..ops.pallas_mfcc import (
    mfcc_pallas_batch,
    mfcc_pallas_bf16x3_batch,
    mfcc_pallas_int8_batch,
)

__all__ = ["Frontend"]


def _auto_backend(cfg: FrontendConfig, platform: str) -> str:
    """Measured v5e crossover (module docstring): the int8 rDFT wins only
    where the MXU runs int8 at 2x the bf16 rate AND the DFT matmul is big
    enough to be MXU-bound (large n_fft). Off-TPU there is no int8 rate
    advantage and the six digit products are strictly more work, so every
    other platform keeps the f32 XLA path."""
    if platform in ("tpu", "axon") and cfg.n_fft >= 1024:
        return "int8"
    return "xla"


class Frontend:
    """Batched waveform -> MFCC features, reference layout (B, n_mfcc, T).

    Drop-in, batched replacement for the reference's per-file
    `extract_features(file_path, utterance_length)` (`Voice digit
    recogniton/extract_features_construct_dataset.py:24-39`).
    """

    _BACKENDS = {
        "xla": mfcc_xla_batch,
        "fft": mfcc_fft_batch,
        "int8": mfcc_int8_batch,
        "hopdft": mfcc_hopdft_batch,
        "hopdft_int8": mfcc_hopdft_int8_batch,
        "pallas": mfcc_pallas_batch,
        "pallas_int8": mfcc_pallas_int8_batch,
        "pallas_bf16x3": mfcc_pallas_bf16x3_batch,
    }

    def __init__(self, cfg: FrontendConfig, backend: str = "auto"):
        # 'auto' resolution needs jax.default_backend(), which initializes
        # the JAX backend — a constructor side effect that would pin the
        # platform/device count before callers set XLA flags (the parse-once
        # hazard __graft_entry__ documents). Defer it to the first __call__;
        # by then the caller is about to run on a device anyway.
        if backend != "auto" and backend not in self._BACKENDS:
            raise ValueError(f"unknown frontend backend {backend!r}")
        if backend.startswith("hopdft"):
            # eager domain check (incl. the int8 variant's exact-root
            # requirement) — fail at construction with a readable error,
            # not at first trace
            validate_hopdft(cfg, int8=backend == "hopdft_int8")
        self.cfg = cfg
        self._backend = backend

    @property
    def backend(self) -> str:
        """Resolved backend name (resolves 'auto' on first access)."""
        if self._backend == "auto":
            import jax

            self._backend = _auto_backend(self.cfg, jax.default_backend())
        return self._backend

    def __call__(self, waves, lengths=None):
        if isinstance(waves, np.ndarray):
            if waves.dtype == np.int16:
                # int16-PCM ingress: ship half the host->device bytes and
                # dequantize ON DEVICE — x/32768 is exact for PCM-origin
                # audio (ops/mfcc_int8.py:30-36), so results are
                # bit-identical to f32 ingress of waves/32768 (VERDICT r3
                # item 4). Note this only applies to UNresampled audio:
                # host resampling (utils/audio_io.py) already produces f32.
                import jax.numpy as jnp

                w16 = jnp.asarray(np.ascontiguousarray(waves))
                waves = w16.astype(jnp.float32) * jnp.float32(1 / 32768)
            else:
                waves = np.ascontiguousarray(waves, dtype=np.float32)
        return self._BACKENDS[self.backend](waves, self.cfg, lengths=lengths)

    def flat(self, waves, lengths=None):
        """Features flattened to (B, n_mfcc * T) — the .npy artifact layout
        (`compute_mfcc_all_files` flatten, `VD/...:149`)."""
        out = self(waves, lengths=lengths)
        return out.reshape(out.shape[0], -1)
