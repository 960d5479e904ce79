"""Int8 digit-decomposition MFCC frontend: f32-parity DFT at int8 MXU rate.

The frontend's FLOPs live in the windowed-rDFT matmul (ops/mfcc_xla.py). At
the required parity (<=5e-4 vs the f64 oracle, BASELINE.md) that matmul must
be f32-exact, which XLA provides only via precision=HIGHEST — a 6-pass bf16
emulation (measured 13.5 ms / 1024 digit utterances on v5e). This module
reaches the same parity floor with six int8 digit products fused into THREE
int8 matmuls (pairs with equal digit-sum share one exact power-of-two
weight, so they concatenate along the contraction axis), and the v5e MXU
runs int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s): measured 9.6 ms —
1.40x the HIGHEST path at equal parity.

Scheme — exact base-128 digit decomposition with power-of-two scales:

    x = d0*2^-6 + d1*2^-13 + d2*2^-20 + r,  |d_i| <= 64,  |r| <= 2^-21
    C = e0*s    + e1*s/128 + e2*s/128^2 + rc                (numpy, static)

    x @ C = sum_{(i,j)} (d_i @ e_j) * (s_i * t_j)           [int8 MXU, exact
                                                             int32 accumulate]

Every product d_i @ e_j is EXACT (|terms| <= 64*64*n_fft < 2^31), so the only
error is the dropped digit tails. Keeping the six pairs with weight >= 128^-2
— (0,0),(0,1),(1,0),(1,1),(0,2),(2,0) — leaves a relative error ~2^-14 of
the smallest retained digit, measured 4.3e-5 absolute on the db-scale MFCC
output vs the f64 oracle (vs 4.5e-4 for plain f32/HIGHEST: the int32
accumulation is exacter than f32 dot products).

Each row is block-scaled by a power of two (exact in f32, undone exactly on
the power spectrum) so its peak lands in (0.5, 1] before digitizing — quiet
rows keep full relative accuracy and loud rows don't clip. For int16-origin
audio (librosa loads PCM as x/32768, `Voice digit
recogniton/extract_features_construct_dataset.py:27`) the x digits are then
EXACT; for arbitrary f32 audio the dropped x tail is <= 2^-21 of the row
peak — both far under the parity budget.

Reference semantics reproduced: librosa.feature.mfcc as called at
`Voice digit recogniton/extract_features_construct_dataset.py:30` and
`Speaker recognition/extract_features_construct_dataset.py:227-228`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mfcc_xla import FrontendConfig, _finish_mfcc, frame_signal

__all__ = ["mfcc_int8_batch", "KEEP_PAIRS", "digit_sum_groups"]

# digit-product pairs kept, in increasing weight order (summed small->large)
KEEP_PAIRS = ((0, 2), (2, 0), (1, 1), (0, 1), (1, 0), (0, 0))

_X_SCALES = (2.0 ** -6, 2.0 ** -13, 2.0 ** -20)


def _const_digits(c: np.ndarray) -> list[tuple[np.ndarray, float]]:
    """Base-128 int8 digits of a static f64 matrix, power-of-two scales."""
    m = float(np.max(np.abs(c)))
    e = int(np.ceil(np.log2(m))) - 6 if m > 0 else -6
    out = []
    res = c.astype(np.float64)
    for i in range(3):
        s = 2.0 ** (e - 7 * i)
        d = np.round(res / s)
        assert np.max(np.abs(d)) <= 64, "digit overflow"
        out.append((d.astype(np.int8), s))
        res = res - d * s
    return out


def _wave_digits(y: jnp.ndarray) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Base-128 int8 digits of per-row block-scaled audio.

    Each row is multiplied by a power-of-two factor f (EXACT in f32) so its
    peak lands in (0.5, 1] before digitizing — quiet rows keep full relative
    digit accuracy. Returns (digits, f); the caller undoes the scaling on
    the power spectrum (power * f^-2), also exact. The DFT is linear and
    power_to_db's ref=max is per-utterance, so semantics are unchanged."""
    y = y.astype(jnp.float32)
    mx = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    ex = jnp.floor(jnp.log2(1.0 / jnp.maximum(mx, 1e-30)))
    f = jnp.where(mx > 0, jnp.exp2(ex), 1.0)
    res = y * f
    digits = []
    for s in _X_SCALES:
        d = jnp.round(res / s)
        digits.append(d.astype(jnp.int8))
        res = res - d * jnp.float32(s)
    return digits, f[:, 0]


def digit_sum_groups(lhs_digits, c_digits):
    """Yield (int32 partials, exact weight) per digit-sum group, SMALLEST
    weight first.

    The digit-pair weight 2^(-6-7i) * s_e*2^(-7j) depends only on i+j, so
    KEEP_PAIRS group by digit-sum k into ONE int8 matmul each (polynomial-
    multiplication structure): sum_{i+j=k} d_i @ e_j = [d_i...] @ [e_j...]
    concatenated along the contraction axis — same FLOPs, 3 dispatches
    instead of 6, larger (more MXU-efficient) K. int32 accumulation stays
    exact: <= 3 * 64*64*K_contraction < 2^25 per entry. Iterating smallest
    weight first keeps the caller's f32 combine tight.

    THE single copy of the grouping/ordering/shared-weight machinery —
    used by both the direct framed path (mfcc_int8_batch, lhs = framed
    digit signals (B, F, n_fft)) and the hop-block path
    (ops/mfcc_hopdft.py, lhs = digit blocks (B, n_blocks, hop))."""
    groups: dict[int, list[tuple[int, int]]] = {}
    for i, j in KEEP_PAIRS:
        groups.setdefault(i + j, []).append((i, j))
    for k in sorted(groups, reverse=True):
        pairs = groups[k]
        lhs = (lhs_digits[pairs[0][0]] if len(pairs) == 1 else
               jnp.concatenate([lhs_digits[i] for i, _ in pairs], axis=2))
        rhs = np.concatenate([c_digits[j][0] for _, j in pairs], axis=0)
        p = jax.lax.dot_general(
            lhs,
            jnp.asarray(rhs),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        w = _X_SCALES[pairs[0][0]] * c_digits[pairs[0][1]][1]
        assert all(
            _X_SCALES[i] * c_digits[j][1] == w for i, j in pairs
        ), "digit-sum groups must share one exact power-of-two weight"
        yield p, w


@functools.partial(jax.jit, static_argnames=("cfg",))
def mfcc_int8_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched MFCC, same contract as mfcc_xla_batch: (B, L) -> (B, n_mfcc,
    utterance_length); the rDFT runs as six int8 MXU matmuls (see module
    docstring), mel/db/DCT finish identical to the XLA path."""
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    cr, ci = [m.astype(np.float64) for m in cfg.constants(np.float64)[:2]]
    _, _, mel_t, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())

    # one dot -> re|im together. (Dropping the identically-zero DC/Nyquist
    # imaginary columns to make N = n_fft = a perfect 128-lane tile was
    # measured SLOWER — 11.2-17.7 ms vs 9.5 ms — the re/im re-assembly
    # copies cost more than the 6% matmul padding they save.)
    c_all = np.concatenate([cr, ci], axis=1)
    c_digits = _const_digits(c_all)

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    y_digits, f = _wave_digits(ypad)

    frames_d = [
        frame_signal(d, n_frames, cfg.n_fft, cfg.hop_length)
        for d in y_digits
    ]

    acc = None
    for p, w in digit_sum_groups(frames_d, c_digits):
        term = p.astype(jnp.float32) * jnp.float32(w)
        acc = term if acc is None else acc + term

    n_freq = cfg.n_freq
    re, im = acc[..., :n_freq], acc[..., n_freq:]
    power = (re * re + im * im) * (f ** -2)[:, None, None]  # undo block scale
    return _finish_mfcc(
        power, cfg, lengths, b, n_frames, jnp.asarray(mel_t),
        jnp.asarray(dct_t), prec,
    )
