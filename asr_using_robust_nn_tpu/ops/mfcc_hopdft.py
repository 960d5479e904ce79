"""Hop-block rDFT MFCC: exploit the 75% frame overlap algebraically.

The digit preset (n_fft=2048, hop=512, win=2048 — librosa defaults at
`Voice digit recogniton/extract_features_construct_dataset.py:30`) reads
every audio sample into r = n_fft/hop = 4 overlapping frames, so the
GEMM-native frontends (ops/mfcc_xla.py, ops/mfcc_int8.py) both expand the
waveform 4x during framing AND spend 4x the necessary DFT matmul FLOPs.
This module removes the redundancy exactly, in two steps:

1. **Hop-block DFT.** Split the padded waveform into NON-overlapping
   hop-sized blocks (a reshape — no gather, no 4x expansion). A frame is r
   consecutive blocks, and its UNWINDOWED DFT decomposes over them:

       X_f[k] = sum_{d=0..r-1} (W_N^{hop*k})^d * G_{f+d}[k],
       G_b[k] = sum_{m<hop} block_b[m] * e^(-2pi*i*k*m/N)

   Each block's partial DFT G_b is ONE (hop x n_freq) matmul shared by all
   r frames that contain the block: the DFT matmul FLOPs drop by ~r (the
   combine coefficients (W_N^{hop*k})^d = (-i)^{k*d} for r=4 are unit
   4th roots — exact {0, +-1} re/im parts, so the recombination is pure
   f32 adds/swaps, introducing no rounding beyond the adds themselves).

2. **Hann in the frequency domain.** The periodic Hann window
   h[n] = 0.5 - 0.5*cos(2*pi*n/N) used by librosa (scipy fftbins=True) is
   three DFT bins, so windowing is EXACTLY the circular 3-tap convolution

       Xw[k] = 0.5*X[k] - 0.25*X[k-1] - 0.25*X[k+1]

   (Hermitian extension at the edges for real input; the upper edge index
   depends on n_fft parity — odd n_fft has no Nyquist bin). This lets the
   block DFTs stay unwindowed — a window that straddles blocks can't be
   folded into the per-block matrix.

Non-dividing hops (round-3 generalization): with n_fft = q*hop + s
(0 < s < hop), a frame is q full hop-blocks plus the FIRST s samples of
block f+q. The tail contributes one thin extra matmul — an (s x n_freq)
DFT with the e^(-2pi*i*k*q*hop/n_fft) phase folded into the constant —
so the decomposition covers the speaker preset too (441 = 2*220 + 1:
q=2, s=1, ~2x fewer DFT MACs and zero framing expansion at a shape that
gets neither the radix-2 split nor the int8 win).

The f32 variant requires only win_length == n_fft and hop <= n_fft; the
int8 variant additionally needs hop | n_fft with exact unit roots (below).

Two entry points, same contract as mfcc_xla_batch:
- `mfcc_hopdft_batch` — f32/precision-controlled block matmuls;
- `mfcc_hopdft_int8_batch` — base-128 int8 digit decomposition of the
  block matmuls (ops/mfcc_int8.py's scheme, applied to the hop-block
  matrix): exact int8 MXU products at 2x the bf16 rate AND ~r-fold fewer
  of them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mfcc_int8 import _const_digits, _wave_digits, digit_sum_groups
from .mfcc_xla import FrontendConfig, _dft_precision, _finish_mfcc

__all__ = [
    "mfcc_hopdft_batch",
    "mfcc_hopdft_int8_batch",
    "hopdft_supported",
    "hopdft_int8_supported",
    "validate_hopdft",
]


def hopdft_supported(cfg: FrontendConfig) -> bool:
    """The f32 decomposition needs a full-frame window (frequency-domain
    Hann assumes the window is periodic over n_fft) and hop <= n_fft;
    non-dividing hops are handled by the s-sample tail matmul and odd
    n_fft by the parity-aware Hermitian edge in _window_and_power."""
    return cfg.win_length == cfg.n_fft and cfg.hop_length <= cfg.n_fft


def hopdft_int8_supported(cfg: FrontendConfig) -> bool:
    """The int8 variant additionally needs hop | n_fft (its exact-int32
    pipeline has no tail-matmul path) with unit r-th roots in {0, +-1}
    (r = n_fft/hop in {1, 2, 4}): the phase combine runs in exact int32,
    and non-integer cos/sin coefficients would silently truncate on the
    dtype cast. The f32 variant handles any hop <= n_fft."""
    return (hopdft_supported(cfg) and cfg.n_fft % cfg.hop_length == 0
            and cfg.n_fft // cfg.hop_length in (1, 2, 4))


def validate_hopdft(cfg: FrontendConfig, int8: bool) -> None:
    """Raise a readable ValueError (eagerly callable — construction time,
    not first-trace time; never stripped by python -O) when cfg is outside
    the decomposition's domain."""
    if not hopdft_supported(cfg):
        raise ValueError(
            f"hop-block DFT needs win == n_fft and hop <= n_fft,"
            f" got n_fft={cfg.n_fft} hop={cfg.hop_length}"
            f" win={cfg.win_length}; use the 'xla'/'int8' backends"
        )
    if int8 and not hopdft_int8_supported(cfg):
        raise ValueError(
            f"int8 hop-block combine needs hop | n_fft with n_fft/hop in "
            f"{{1,2,4}} (exact integer roots), got n_fft={cfg.n_fft} "
            f"hop={cfg.hop_length}; use mfcc_hopdft_batch (backend='hopdft')"
        )


def _block_dft_constants(cfg: FrontendConfig) -> tuple[np.ndarray, np.ndarray]:
    """Unwindowed (hop x n_freq) partial-DFT matrices (cos, -sin), f64."""
    m = np.arange(cfg.hop_length, dtype=np.float64)
    k = np.arange(cfg.n_freq, dtype=np.float64)
    ang = 2.0 * np.pi * m[:, None] * k[None, :] / cfg.n_fft
    return np.cos(ang), -np.sin(ang)


def _tail_dft_constants(cfg: FrontendConfig) -> np.ndarray:
    """(s, 2*n_freq) [cos | -sin] DFT rows of the s tail samples a frame
    reads from block f+q, with the e^(-2pi*i*k*(q*hop+m)/n_fft) phase
    folded into the constant (s = n_fft mod hop; empty when hop | n_fft)."""
    q, s = divmod(cfg.n_fft, cfg.hop_length)
    m = q * cfg.hop_length + np.arange(s, dtype=np.float64)
    k = np.arange(cfg.n_freq, dtype=np.float64)
    ang = 2.0 * np.pi * m[:, None] * k[None, :] / cfg.n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(
        np.float32
    )


def _combine_coeffs(cfg: FrontendConfig) -> tuple[np.ndarray, np.ndarray]:
    """(q, n_freq) re/im of (W_N^{hop*k})^d = e^(-2pi*i*hop*k*d/n_fft),
    d < q = n_fft // hop (the full blocks; a non-dividing hop's tail
    samples are handled separately by _tail_dft_constants).

    For q = n_fft/hop in {1, 2, 4} these are exact {0, +-1} floats (unit
    roots); otherwise they are exact cos/sin values — the combine stays a
    correct linear recombination either way.
    """
    r = cfg.n_fft // cfg.hop_length
    d = np.arange(r, dtype=np.float64)
    k = np.arange(cfg.n_freq, dtype=np.float64)
    ang = 2.0 * np.pi * cfg.hop_length * d[:, None] * k[None, :] / cfg.n_fft
    wr = np.cos(ang)
    wi = -np.sin(ang)
    # snap the 4th-root lattice to exact integers (cos/sin of multiples of
    # pi/2 carry ~1e-16 noise that would otherwise leak into every bin)
    wr = np.where(np.abs(wr - np.round(wr)) < 1e-9, np.round(wr), wr)
    wi = np.where(np.abs(wi - np.round(wi)) < 1e-9, np.round(wi), wi)
    return wr.astype(np.float32), wi.astype(np.float32)


def _blocks(ypad: jnp.ndarray, cfg: FrontendConfig, n_frames: int):
    """(B, L) padded audio -> (B, n_blocks, hop) non-overlapping blocks
    covering every frame (truncates the sub-block tail no frame reads;
    zero-extends when the last frame's tail block runs past the centered
    pad — frames only read its first s samples, which do exist)."""
    q, s = divmod(cfg.n_fft, cfg.hop_length)
    n_blocks = n_frames + q - 1 + (1 if s else 0)
    need = n_blocks * cfg.hop_length
    if ypad.shape[-1] < need:
        ypad = jnp.pad(ypad, ((0, 0), (0, need - ypad.shape[-1])))
    return ypad[:, :need].reshape(ypad.shape[0], n_blocks, cfg.hop_length)


def _combine_phase(gr, gi, cfg: FrontendConfig, n_frames: int):
    """Phase-combine the r shifted block-partial views into whole-frame
    unwindowed DFTs: (B, n_blocks, n_freq) -> (B, n_frames, n_freq) re/im.

    Runs in the input dtype: for the int8 path the partials are EXACT
    int32 and the r=4 coefficients are {0, +-1}, so the combine (where
    the strong Hann-adjacent cancelation happens) is exact integer
    arithmetic — deferring the f32 rounding to after the cancelation."""
    r = cfg.n_fft // cfg.hop_length
    wr, wi = _combine_coeffs(cfg)
    xre = xim = 0
    for d in range(r):
        a = jnp.asarray(wr[d].astype(gr.dtype))
        b = jnp.asarray(wi[d].astype(gr.dtype))
        sr = gr[:, d:d + n_frames, :]
        si = gi[:, d:d + n_frames, :]
        # (a+ib)*(sr+i*si), accumulated
        xre = xre + (a * sr - b * si)
        xim = xim + (a * si + b * sr)
    return xre, xim


def _window_and_power(xre, xim, n_fft: int):
    """Frequency-domain periodic-Hann 3-tap + |.|^2, f32 in/out.

    Circular with Hermitian edges for real input: X[-1] = conj(X[1]) and
    X[n_freq] = conj(X[n_fft - n_freq]), where n_fft - n_freq is
    n_freq - 2 for even n_fft (a real Nyquist bin exists at the stored
    edge) and n_freq - 1 for odd n_fft (no Nyquist bin)."""
    e = -1 if n_fft % 2 else -2
    re_m1 = jnp.concatenate([xre[..., 1:2], xre[..., :-1]], axis=-1)
    im_m1 = jnp.concatenate([-xim[..., 1:2], xim[..., :-1]], axis=-1)
    re_p1 = jnp.concatenate([xre[..., 1:], xre[..., e:][..., :1]], axis=-1)
    im_p1 = jnp.concatenate([xim[..., 1:], -xim[..., e:][..., :1]], axis=-1)
    wre = 0.5 * xre - 0.25 * (re_m1 + re_p1)
    wim = 0.5 * xim - 0.25 * (im_m1 + im_p1)
    return wre * wre + wim * wim


@functools.partial(jax.jit, static_argnames=("cfg",))
def mfcc_hopdft_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched MFCC via hop-block rDFT, same precision contract as
    mfcc_xla_batch: matmuls run at cfg.precision, and the block DFT
    additionally honors cfg.dft_algorithm (bf16_x6/bf16_x3 DotAlgorithm
    presets) — either way ~r-fold cheaper than the direct DFT."""
    validate_hopdft(cfg, int8=False)
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    _, _, mel_t, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())

    cr, ci = _block_dft_constants(cfg)
    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    blocks = _blocks(ypad, cfg, n_frames)
    c_all = jnp.asarray(np.concatenate([cr, ci], axis=1).astype(np.float32))
    g = jnp.einsum("bth,hk->btk", blocks, c_all,
                   precision=_dft_precision(cfg, prec))
    gr, gi = g[..., : cfg.n_freq], g[..., cfg.n_freq:]

    xre, xim = _combine_phase(gr, gi, cfg, n_frames)
    q, s = divmod(cfg.n_fft, cfg.hop_length)
    if s:
        # non-dividing hop: frame f also reads the first s samples of
        # block f+q — one thin matmul with the phase folded in
        tail = blocks[:, q:q + n_frames, :s]
        t = jnp.einsum("bts,sk->btk", tail,
                       jnp.asarray(_tail_dft_constants(cfg)),
                       precision=_dft_precision(cfg, prec))
        xre = xre + t[..., : cfg.n_freq]
        xim = xim + t[..., cfg.n_freq:]
    power = _window_and_power(xre, xim, cfg.n_fft)
    return _finish_mfcc(
        power, cfg, lengths, b, n_frames, jnp.asarray(mel_t),
        jnp.asarray(dct_t), prec,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def mfcc_hopdft_int8_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hop-block rDFT with the base-128 int8 digit decomposition: the
    block partial-DFT runs as three digit-sum-grouped int8 MXU matmuls
    (exact int32 accumulation, ops/mfcc_int8.py's scheme) over a
    contraction of hop instead of n_fft samples. The int8 dots are exact
    (parity is independent of cfg.precision; the mel/DCT finish runs at
    cfg.precision like the direct int8 path)."""
    validate_hopdft(cfg, int8=True)
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    _, _, mel_t, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())

    cr, ci = _block_dft_constants(cfg)
    c_digits = _const_digits(np.concatenate([cr, ci], axis=1))

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    y_digits, f = _wave_digits(ypad)
    blocks_d = [_blocks(d, cfg, n_frames) for d in y_digits]

    # Per digit-sum group (shared machinery: mfcc_int8.digit_sum_groups):
    # int8 matmul -> EXACT int32 partials -> EXACT int32 phase combine (the
    # Hann-adjacent cancelation happens here in integer arithmetic;
    # <= r * 3 * 64*64*hop < 2^27, no overflow) -> f32 scale+sum across
    # groups (3 rounded adds, as in the direct path).
    xre = xim = None
    for p, w in digit_sum_groups(blocks_d, c_digits):
        gre, gim = _combine_phase(
            p[..., : cfg.n_freq], p[..., cfg.n_freq:], cfg, n_frames
        )
        tre = gre.astype(jnp.float32) * jnp.float32(w)
        tim = gim.astype(jnp.float32) * jnp.float32(w)
        xre = tre if xre is None else xre + tre
        xim = tim if xim is None else xim + tim

    power = _window_and_power(xre, xim, cfg.n_fft)
    power = power * (f ** -2)[:, None, None]  # undo the per-row block scale
    return _finish_mfcc(
        power, cfg, lengths, b, n_frames, jnp.asarray(mel_t),
        jnp.asarray(dct_t), prec,
    )
