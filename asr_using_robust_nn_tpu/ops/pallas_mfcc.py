"""Pallas TPU kernel for the MFCC frontend's hot stage.

The FLOPs of the frontend live in the windowed-rDFT matmuls
(frames @ Cr / frames @ Ci, n_fft x n_freq each) and the mel projection.
This kernel fuses rDFT -> |.|^2 -> mel into one VMEM-resident pass over
row-tiles of the framed signal, so the (B*T, 1+n_fft//2) power spectrogram
never materializes in HBM (the pure-XLA path writes/reads it once):

  grid = (row_tiles, freq_tiles)              # freq innermost
  per program:  F_i (ROW_TILE, n_fft)         # frames, from HBM
                P_ij = (F_i @ Cr_j)^2 + (F_i @ Ci_j)^2      # MXU
                out_i += P_ij @ MelT_j                      # MXU, VMEM accum

Framing itself (slice+concat, pure data movement) and the tiny db+DCT finish
(which needs a per-utterance global max, see ops/frontend_ref.py) run in XLA
around the kernel. Mosaic note: framing cannot live inside the kernel —
reshaping a (B, L) waveform block to hop-sized blocks is an unsupported
vector shape-cast for non-128-aligned hops (verified on v5e).

Reference semantics reproduced: librosa.feature.mfcc as called at
`Voice digit recogniton/extract_features_construct_dataset.py:30` (digit) and
`Speaker recognition/extract_features_construct_dataset.py:227-228` (speaker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mfcc_xla import FrontendConfig, finish_mfcc_from_mel, frame_signal

__all__ = [
    "mel_power_pallas",
    "mfcc_pallas_batch",
    "mel_power_int8_pallas",
    "mfcc_pallas_int8_batch",
    "mel_power_bf16x3_pallas",
    "mfcc_pallas_bf16x3_batch",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dft_power_mel_kernel(frames_ref, cr_ref, ci_ref, melt_ref, out_ref, *, precision):
    j = pl.program_id(1)
    prec = jax.lax.Precision(precision)
    f = frames_ref[:]
    re = jnp.dot(f, cr_ref[:], preferred_element_type=jnp.float32, precision=prec)
    im = jnp.dot(f, ci_ref[:], preferred_element_type=jnp.float32, precision=prec)
    power = re * re + im * im
    mel = jnp.dot(power, melt_ref[:], preferred_element_type=jnp.float32, precision=prec)

    @pl.when(j == 0)
    def _():
        out_ref[:] = mel

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + mel


def _default_tiles(cfg: FrontendConfig) -> tuple[int, int]:
    """(row_tile, k_tile) sized to fit VMEM at precision='highest' (whose
    3x-bf16 operand splits roughly triple live VMEM; 16 MB/core budget).
    Digit (n_fft=2048): (128, 128) — (256, 128) overflows by ~108K with
    double-buffered blocks. Speaker (n_fft=441): (256, 256)."""
    if cfg.n_fft >= 1024:
        return 128, 128
    return 256, 256


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mel_power_pallas(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    row_tile: int | None = None,
    k_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rDFT+power+mel: (B, L) raw waves -> (B, T, n_mels) mel power.

    Applies the librosa center pad (n_fft//2 zeros each side, 'constant'),
    frames in XLA, then runs the fused Pallas GEMM chain.
    """
    dr, dk = _default_tiles(cfg)
    row_tile = row_tile or dr
    k_tile = k_tile or dk
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)

    cr, ci, mel_t, _ = cfg.constants(np.float32)
    n_fft_pad = _round_up(cfg.n_fft, 8)
    n_freq_pad = _round_up(cfg.n_freq, k_tile)
    n_mels = cfg.n_mels

    # Zero-pad constants: extra DFT rows meet zero frame columns; extra freq
    # columns hit zero mel rows — results are exact.
    cr_p = np.zeros((n_fft_pad, n_freq_pad), np.float32)
    ci_p = np.zeros((n_fft_pad, n_freq_pad), np.float32)
    mel_tp = np.zeros((n_freq_pad, n_mels), np.float32)
    cr_p[: cfg.n_fft, : cfg.n_freq] = cr
    ci_p[: cfg.n_fft, : cfg.n_freq] = ci
    mel_tp[: cfg.n_freq] = mel_t

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    frames = frame_signal(ypad, n_frames, cfg.n_fft, cfg.hop_length)
    rows = b * n_frames
    rows_pad = _round_up(rows, row_tile)
    f2d = frames.reshape(rows, cfg.n_fft)
    f2d = jnp.pad(f2d, ((0, rows_pad - rows), (0, n_fft_pad - cfg.n_fft)))

    grid = (rows_pad // row_tile, n_freq_pad // k_tile)
    kernel = functools.partial(_dft_power_mel_kernel, precision=cfg.precision.lower())
    mel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (row_tile, n_fft_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft_pad, k_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft_pad, k_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_tile, n_mels), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, n_mels), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * n_fft_pad * n_freq_pad * 2
            + 2 * rows_pad * n_freq_pad * n_mels,
            bytes_accessed=(rows_pad * n_fft_pad + rows_pad * n_mels) * 4
            + (2 * n_fft_pad * n_freq_pad + n_freq_pad * n_mels) * 4 * grid[0],
            transcendentals=0,
        ),
        interpret=interpret,
    )(f2d, cr_p, ci_p, mel_tp)
    return mel[:rows].reshape(b, n_frames, n_mels)


def _bf16x3_split(x):
    """f32 -> (hi, lo) bf16 digits with x ~= hi + lo; three bf16 products
    hi@hi' + hi@lo' + lo@hi' reproduce the f32 product to ~2^-16 relative —
    the BF16_BF16_F32_X3 algorithm, hand-rolled so the MXU runs native bf16
    passes instead of Mosaic's multi-pass f32 emulation."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dft_power_mel_x3_kernel(
    frames_ref, cr_hi_ref, cr_lo_ref, ci_hi_ref, ci_lo_ref,
    melt_hi_ref, melt_lo_ref, out_ref,
):
    """Fused rDFT -> |.|^2 -> mel with every GEMM as a 3-pass bf16 split:
    6 bf16 MXU dots for the two DFT sides + 3 for the mel projection per
    program, power spectrogram VMEM-resident (never touches HBM)."""
    j = pl.program_id(1)
    f_hi, f_lo = _bf16x3_split(frames_ref[:])

    def x3(a_hi, a_lo, b_hi_ref, b_lo_ref):
        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        return (d(a_hi, b_hi_ref[:]) + d(a_hi, b_lo_ref[:])
                + d(a_lo, b_hi_ref[:]))

    re = x3(f_hi, f_lo, cr_hi_ref, cr_lo_ref)
    im = x3(f_hi, f_lo, ci_hi_ref, ci_lo_ref)
    power = re * re + im * im
    p_hi, p_lo = _bf16x3_split(power)
    mel = x3(p_hi, p_lo, melt_hi_ref, melt_lo_ref)

    @pl.when(j == 0)
    def _():
        out_ref[:] = mel

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + mel


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mel_power_bf16x3_pallas(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    row_tile: int = 256,
    k_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bf16x3 rDFT+power+mel: (B, L) raw waves -> (B, T, n_mels).

    Built for the speaker preset (odd n_fft=441, no radix-2 split, no int8
    win): the X3 dot-algorithm trick hand-rolled as native bf16 MXU dots,
    plus VMEM fusion keeping the (rows, n_freq) power spectrogram out of
    HBM. Parity ~1.6e-3 vs the f64 oracle (X3-class). MEASURED v5e,
    B=1024: 4.7 ms — Mosaic's schedule still loses to XLA's einsum at the
    same algorithm (2.2 ms, `FrontendConfig.speaker_fast()`), so this stays
    an opt-in fusion template like the other Pallas variants
    (frontend/mfcc.py decision table)."""
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)

    cr, ci, mel_t, _ = cfg.constants(np.float32)
    n_fft_pad = _round_up(cfg.n_fft, 128)  # bf16 lane alignment
    n_freq_pad = _round_up(cfg.n_freq, k_tile)
    n_mels = cfg.n_mels

    def split_pad(c, rows, cols, r, k):
        p = np.zeros((rows, cols), np.float32)
        p[:r, :k] = c
        pj = jnp.asarray(p)  # numpy has no bfloat16; split via jnp
        hi = pj.astype(jnp.bfloat16)
        lo = (pj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    cr_hi, cr_lo = split_pad(cr, n_fft_pad, n_freq_pad, cfg.n_fft, cfg.n_freq)
    ci_hi, ci_lo = split_pad(ci, n_fft_pad, n_freq_pad, cfg.n_fft, cfg.n_freq)
    mel_hi, mel_lo = split_pad(mel_t, n_freq_pad, n_mels, cfg.n_freq, n_mels)

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    frames = frame_signal(ypad, n_frames, cfg.n_fft, cfg.hop_length)
    rows = b * n_frames
    rows_pad = _round_up(rows, row_tile)
    f2d = frames.reshape(rows, cfg.n_fft)
    f2d = jnp.pad(f2d, ((0, rows_pad - rows), (0, n_fft_pad - cfg.n_fft)))

    grid = (rows_pad // row_tile, n_freq_pad // k_tile)
    c_spec = pl.BlockSpec((n_fft_pad, k_tile), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((k_tile, n_mels), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    mel = pl.pallas_call(
        _dft_power_mel_x3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, n_fft_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            c_spec, c_spec, c_spec, c_spec, m_spec, m_spec,
        ],
        out_specs=pl.BlockSpec((row_tile, n_mels), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * n_fft_pad * n_freq_pad * 6
            + 2 * rows_pad * n_freq_pad * n_mels * 3,
            bytes_accessed=(rows_pad * n_fft_pad * 4
                            + rows_pad * n_mels * 4)
            + (4 * n_fft_pad * n_freq_pad + 2 * n_freq_pad * n_mels)
            * 2 * grid[0],
            transcendentals=0,
        ),
        interpret=interpret,
    )(f2d, cr_hi, cr_lo, ci_hi, ci_lo, mel_hi, mel_lo)
    return mel[:rows].reshape(b, n_frames, n_mels)


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mfcc_pallas_bf16x3_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
    row_tile: int = 256,
    k_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full MFCC via the fused bf16x3 Pallas kernel + shared XLA db/DCT
    finish. Same contract as ops.mfcc_xla.mfcc_xla_batch."""
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    mel = mel_power_bf16x3_pallas(
        waves, cfg, row_tile=row_tile, k_tile=k_tile, interpret=interpret
    )
    _, _, _, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())
    return finish_mfcc_from_mel(
        mel, cfg, lengths, b, n_frames, jnp.asarray(dct_t), prec
    )


def _int8_dft_power_mel_kernel(
    f0_ref, f1_ref, f2_ref, cr0_ref, cr1_ref, cr2_ref,
    ci0_ref, ci1_ref, ci2_ref, melt_ref, out_ref, *, weights,
):
    """Fused int8-digit rDFT -> |.|^2 -> mel partial (see ops/mfcc_int8.py
    for the decomposition math). 12 int8 MXU dots per program, exact int32
    accumulation, f32 combine; the (rows, n_freq) power spectrogram never
    leaves VMEM."""
    j = pl.program_id(1)
    w00, w01, w10, w11, w02, w20 = [jnp.float32(w) for w in weights]

    def side(c0_ref, c1_ref, c2_ref):
        def d(f_ref, c_ref):
            return jnp.dot(
                f_ref[:], c_ref[:], preferred_element_type=jnp.int32
            )

        acc = d(f0_ref, c2_ref).astype(jnp.float32) * w02
        acc += d(f2_ref, c0_ref).astype(jnp.float32) * w20
        acc += d(f1_ref, c1_ref).astype(jnp.float32) * w11
        acc += d(f0_ref, c1_ref).astype(jnp.float32) * w01
        acc += d(f1_ref, c0_ref).astype(jnp.float32) * w10
        acc += d(f0_ref, c0_ref).astype(jnp.float32) * w00
        return acc

    re = side(cr0_ref, cr1_ref, cr2_ref)
    im = side(ci0_ref, ci1_ref, ci2_ref)
    power = re * re + im * im
    mel = jnp.dot(power, melt_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision("highest"))

    @pl.when(j == 0)
    def _():
        out_ref[:] = mel

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + mel


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mel_power_int8_pallas(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    row_tile: int = 256,
    k_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 rDFT+power+mel: (B, L) raw waves -> (B, T, n_mels) mel
    power at f32 parity (ops/mfcc_int8.py decomposition) and int8 MXU rate.

    Returns mel power with the per-row block scaling ALREADY undone.
    """
    from .mfcc_int8 import _const_digits, _wave_digits, _X_SCALES

    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)

    cr64, ci64 = [m.astype(np.float64) for m in cfg.constants(np.float64)[:2]]
    _, _, mel_t, _ = cfg.constants(np.float32)
    n_fft_pad = _round_up(cfg.n_fft, 128)
    n_freq_pad = _round_up(cfg.n_freq, k_tile)
    n_mels = cfg.n_mels

    def pad_c(c64):
        digs = _const_digits(c64)
        out = []
        for d, s in digs:
            p = np.zeros((n_fft_pad, n_freq_pad), np.int8)
            p[: cfg.n_fft, : cfg.n_freq] = d
            out.append((p, s))
        return out

    cr_d, ci_d = pad_c(cr64), pad_c(ci64)
    mel_tp = np.zeros((n_freq_pad, n_mels), np.float32)
    mel_tp[: cfg.n_freq] = mel_t

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    y_digits, f = _wave_digits(ypad)

    rows = b * n_frames
    rows_pad = _round_up(rows, row_tile)

    def frames_of(d):
        fr = frame_signal(d, n_frames, cfg.n_fft, cfg.hop_length)
        fr = fr.reshape(rows, cfg.n_fft)
        return jnp.pad(fr, ((0, rows_pad - rows), (0, n_fft_pad - cfg.n_fft)))

    f2d = [frames_of(d) for d in y_digits]
    weights = [
        _X_SCALES[0] * cr_d[0][1],  # w00 (cr/ci share scales: same matrix
        _X_SCALES[0] * cr_d[1][1],  # w01  magnitude; asserted below)
        _X_SCALES[1] * cr_d[0][1],  # w10
        _X_SCALES[1] * cr_d[1][1],  # w11
        _X_SCALES[0] * cr_d[2][1],  # w02
        _X_SCALES[2] * cr_d[0][1],  # w20
    ]
    assert [s for _, s in cr_d] == [s for _, s in ci_d], (
        "cr/ci digit scales diverge; pass per-side weights instead"
    )

    grid = (rows_pad // row_tile, n_freq_pad // k_tile)
    row_spec = pl.BlockSpec((row_tile, n_fft_pad), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((n_fft_pad, k_tile), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    mel = pl.pallas_call(
        functools.partial(_int8_dft_power_mel_kernel,
                          weights=tuple(weights)),
        grid=grid,
        in_specs=[row_spec] * 3 + [c_spec] * 6 + [
            pl.BlockSpec((k_tile, n_mels), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n_mels), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * n_fft_pad * n_freq_pad * 12
            + 2 * rows_pad * n_freq_pad * n_mels,
            bytes_accessed=(3 * rows_pad * n_fft_pad
                            + rows_pad * n_mels * 4)
            + (6 * n_fft_pad * n_freq_pad + n_freq_pad * n_mels * 4)
            * grid[0],
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        f2d[0], f2d[1], f2d[2],
        jnp.asarray(cr_d[0][0]), jnp.asarray(cr_d[1][0]),
        jnp.asarray(cr_d[2][0]),
        jnp.asarray(ci_d[0][0]), jnp.asarray(ci_d[1][0]),
        jnp.asarray(ci_d[2][0]),
        jnp.asarray(mel_tp),
    )
    mel = mel[:rows].reshape(b, n_frames, n_mels)
    return mel * (f ** -2)[:, None, None]  # undo per-row block scale


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mfcc_pallas_int8_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
    row_tile: int = 256,
    k_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full MFCC via the fused int8 Pallas kernel + shared XLA db/DCT
    finish. Same contract as ops.mfcc_xla.mfcc_xla_batch."""
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    mel = mel_power_int8_pallas(
        waves, cfg, row_tile=row_tile, k_tile=k_tile, interpret=interpret
    )
    _, _, _, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())
    return finish_mfcc_from_mel(
        mel, cfg, lengths, b, n_frames, jnp.asarray(dct_t), prec
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "row_tile", "k_tile", "interpret")
)
def mfcc_pallas_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
    row_tile: int | None = None,
    k_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full MFCC via the Pallas mel-power kernel + XLA db/DCT finish.

    Same contract as ops.mfcc_xla.mfcc_xla_batch: (B, L) -> (B, n_mfcc,
    utterance_length), with per-utterance length masking.
    """
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    mel = mel_power_pallas(
        waves, cfg, row_tile=row_tile, k_tile=k_tile, interpret=interpret
    )
    _, _, _, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())
    return finish_mfcc_from_mel(
        mel, cfg, lengths, b, n_frames, jnp.asarray(dct_t), prec
    )
