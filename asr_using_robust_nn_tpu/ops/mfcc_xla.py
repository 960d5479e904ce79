"""Fused, batched MFCC frontend as pure XLA — the GEMM-native formulation.

The reference runs librosa's FFT-based MFCC one file at a time in a Python
loop (`Voice digit recogniton/extract_features_construct_dataset.py:144-150`,
HOT LOOP #1 in SURVEY.md §3.1). On TPU the hot path is re-designed as a chain
of dense contractions that XLA tiles straight onto the MXU:

    frames F (B, T, n_fft)                        # slice/concat, no gather
    P  = (F @ Cr)^2 + (F @ Ci)^2                  # windowed rDFT as 2 matmuls
    M  = P @ MelW^T                               # mel projection
    D  = power_to_db(M)  (per-utterance max)      # fused elementwise + reduce
    C  = D @ Dct^T                                # cepstral projection

All shapes are static; everything vmaps/jits; a Pallas variant of the same
pipeline lives in ops/pallas_mfcc.py and is selected by the frontend
dispatcher when it wins on the target hardware.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import filters

__all__ = ["FrontendConfig", "frame_signal", "mfcc_xla_batch",
           "mfcc_fft_batch"]


def _rdft_power_split(
    ypad: jnp.ndarray, n_frames: int, n_fft: int, hop: int, win_length: int,
    levels: int, prec,
) -> jnp.ndarray:
    """|rDFT|^2 of windowed frames via `levels` radix-2 DIT stages.

    Each level halves the leaf-matmul FLOPs (the dominant cost at
    precision=highest, which runs multi-pass bf16 per f32 matmul and sits at
    the MXU roofline for the direct formulation); butterflies are exact f32
    elementwise ops. Layout-critical detail: the signal is de-interleaved
    into 2^levels phase streams ONCE (stride slices on the (B, L) waveform
    are cheap) and each stream framed independently — strided slicing of the
    (B, T, n_fft) frames tensor instead costs more in relayouts than the
    matmul savings (measured on v5e). Requires 2^(levels+1) | n_fft (every
    intermediate half-length must be even for the conjugate-symmetry
    mirror) and 2^levels | hop.

    Input is the center-padded signal; returns (B, T, 1+n_fft//2).
    """
    p_count = 1 << levels
    if n_fft % (p_count * 2) or hop % p_count:
        raise ValueError(
            f"dft_split_levels={levels} needs 2^(levels+1) | n_fft and "
            f"2^levels | hop (got n_fft={n_fft}, hop={hop})"
        )
    window = filters.pad_center(filters.hann_window(win_length), n_fft)
    n_sub = n_fft // p_count

    frames_p = {}
    for p in range(p_count):
        stream = ypad[:, p::p_count]
        frames_p[p] = frame_signal(stream, n_frames, n_sub, hop // p_count)

    def rec(offset: int, step: int, n: int, lvl: int):
        """-> (re, im), DFT bins 0..n/2 of windowed x[offset::step] (len n)."""
        if lvl == 0:
            w_sub = window[offset::step]
            k = np.arange(n // 2 + 1, dtype=np.float64)
            nn = np.arange(n, dtype=np.float64)
            ang = 2.0 * np.pi * nn[:, None] * k[None, :] / n
            cr = (np.cos(ang) * w_sub[:, None]).astype(np.float32)
            ci = (-np.sin(ang) * w_sub[:, None]).astype(np.float32)
            x = frames_p[offset]
            re = jnp.einsum("...n,nk->...k", x, cr, precision=prec)
            im = jnp.einsum("...n,nk->...k", x, ci, precision=prec)
            return re, im
        m = n // 2
        e_re, e_im = rec(offset, 2 * step, m, lvl - 1)
        o_re, o_im = rec(offset + step, 2 * step, m, lvl - 1)

        def extend(re, im):
            # bins 0..m/2 -> 0..m via conjugate symmetry + period m
            half = m // 2
            re_ext = jnp.concatenate(
                [re, re[..., half - 1 : 0 : -1], re[..., :1]], axis=-1
            )
            im_ext = jnp.concatenate(
                [im, -im[..., half - 1 : 0 : -1], im[..., :1]], axis=-1
            )
            return re_ext, im_ext

        e_re, e_im = extend(e_re, e_im)
        o_re, o_im = extend(o_re, o_im)
        k = np.arange(m + 1, dtype=np.float64)
        tw_re = np.cos(2.0 * np.pi * k / n).astype(np.float32)
        tw_im = (-np.sin(2.0 * np.pi * k / n)).astype(np.float32)
        x_re = e_re + (tw_re * o_re - tw_im * o_im)
        x_im = e_im + (tw_re * o_im + tw_im * o_re)
        return x_re, x_im

    re, im = rec(0, 1, n_fft, levels)
    return re * re + im * im


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Static parameters of one MFCC parameterization (SURVEY.md §2.2).

    Presets: `digit()` reproduces `librosa.feature.mfcc(y, sr)` defaults used
    at `Voice digit recogniton/extract_features_construct_dataset.py:30`;
    `speaker()` reproduces the overrides (win_length=441, n_fft=441,
    hop_length=220) at `Speaker recognition/extract_features_construct_dataset.py:227-228`.
    """

    sr: int = 22050
    n_mfcc: int = 20
    n_mels: int = 128
    n_fft: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    utterance_length: int = 44  # output frames after truncate/pad (:18,:33-37)
    amin: float = 1e-10
    top_db: float = 80.0
    precision: str = "highest"  # MXU precision for the DFT/mel/DCT matmuls
    dft_algorithm: str | None = None  # override for the DFT matmuls only:
    # 'bf16_x6' (6-pass bf16 f32-emulation via an explicit DotAlgorithm —
    # same accuracy as precision=highest but XLA schedules it ~8% faster on
    # v5e at the speaker shape) or 'bf16_x3' (3-pass: 1.4x faster again,
    # parity loosens from ~4.7e-4 to ~2.4e-3 vs the f64 oracle — opt-in).
    # None keeps `precision`. Measured v5e, B=1024 (docs/ARCHITECTURE.md).
    pad_mode: str = "constant"  # STFT center padding. librosa >=0.10 (and
    # hence this port's default) uses 'constant'; the thesis-era librosa
    # (<=0.9) defaulted to 'reflect' — set pad_mode='reflect' to reproduce
    # artifacts built with old librosa. Note: with per-utterance `lengths`
    # masking, 'reflect' is exact only for rows whose true length fills the
    # batch width (the reflection of a zero tail differs from per-file
    # processing); 'constant' is exact always.
    dft_split_levels: int = 0  # radix-2 DIT stages: each halves DFT matmul
    # FLOPs at identical accuracy (exact f32 butterflies); needs
    # 2^(levels+1) | n_fft and 2^levels | hop, so 0 for the speaker preset

    def __post_init__(self):
        if self.dft_algorithm is not None and (
                self.dft_algorithm not in _DFT_ALGORITHMS):
            raise ValueError(
                f"dft_algorithm={self.dft_algorithm!r}: expected one of "
                f"{sorted(_DFT_ALGORITHMS)} or None"
            )

    @staticmethod
    def digit() -> "FrontendConfig":
        return FrontendConfig()

    @staticmethod
    def speaker() -> "FrontendConfig":
        # bf16_x6 DFT: identical parity to precision=highest (4.69e-4 vs
        # the f64 oracle on v5e), ~8% faster at the odd n_fft=441 shape
        # that gets neither the radix-2 split nor the int8 win
        return FrontendConfig(
            n_fft=441, hop_length=220, win_length=441, utterance_length=101,
            dft_algorithm="bf16_x6",
        )

    @staticmethod
    def speaker_fast() -> "FrontendConfig":
        """bf16_x3 DFT: 1.4x the speaker preset's throughput at ~2.4e-3
        parity vs the f64 oracle (5x looser than the default; still ~1e-5
        relative on dB-scale features). Opt-in fast mode."""
        return FrontendConfig(
            n_fft=441, hop_length=220, win_length=441, utterance_length=101,
            dft_algorithm="bf16_x3",
        )

    @property
    def n_freq(self) -> int:
        return filters.n_fft_bins(self.n_fft)

    @property
    def feature_dim(self) -> int:
        return self.n_mfcc * self.utterance_length

    def num_frames(self, n_samples: int) -> int:
        """librosa-exact centered frame count — delegates to the ONE copy
        of the (odd-n_fft-aware) formula in frontend_ref.num_frames."""
        from .frontend_ref import num_frames

        return num_frames(n_samples, self.hop_length, self.n_fft)

    def constants(self, dtype=np.float32):
        """(Cr, Ci, MelW^T, Dct^T) as numpy constants for kernel folding."""
        cr, ci = filters.rdft_matrices(self.n_fft, self.win_length)
        mel_t = filters.mel_filterbank(self.sr, self.n_fft, self.n_mels).T
        dct_t = filters.dct_matrix(self.n_mfcc, self.n_mels).T
        return (
            cr.astype(dtype),
            ci.astype(dtype),
            mel_t.astype(dtype),
            dct_t.astype(dtype),
        )


_DFT_ALGORITHMS = ("bf16_x6", "bf16_x3")


def _dft_precision(cfg, default):
    """Resolve cfg.dft_algorithm to an einsum precision argument."""
    if cfg.dft_algorithm is None:
        return default
    return {
        "bf16_x6": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X6,
        "bf16_x3": jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
    }[cfg.dft_algorithm]


def frame_signal(ypad: jnp.ndarray, n_frames: int, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame a (B, Lpad) center-padded batch into (B, n_frames, n_fft).

    Pure reshape+slice+concat for ANY (n_fft, hop): view the signal as
    hop-sized blocks; frame t is blocks[t..t+k-1] with the last piece cut to
    width n_fft - (k-1)*hop. Zero gather traffic; all shapes static, so XLA
    lays the frames out directly for the MXU. (Replaces the reference's
    per-file Python framing inside librosa, SURVEY.md §3.1 HOT LOOP #1.)
    """
    b = ypad.shape[0]
    k = -(-n_fft // hop)  # ceil: blocks touched by one frame
    need_blocks = n_frames + k - 1
    need_len = need_blocks * hop
    if ypad.shape[-1] < need_len:
        ypad = jnp.pad(ypad, ((0, 0), (0, need_len - ypad.shape[-1])))
    blocks = ypad[:, :need_len].reshape(b, need_blocks, hop)
    pieces = []
    for j in range(k):
        width = min(hop, n_fft - j * hop)
        pieces.append(blocks[:, j : j + n_frames, :width])
    return jnp.concatenate(pieces, axis=-1)


def _valid_frames_mask(cfg, lengths, b, n_frames):
    """Per-utterance valid-frame mask from true sample lengths, using the
    librosa-exact frame-count formula (odd-n_fft aware)."""
    if lengths is None:
        return jnp.ones((b, n_frames), dtype=bool)
    from .frontend_ref import num_frames

    frame_ids = jnp.arange(n_frames)[None, :]
    true_frames = num_frames(lengths[:, None], cfg.hop_length, cfg.n_fft)
    return frame_ids < true_frames


def finish_mfcc_from_mel(mel, cfg, lengths, b, n_frames, dct_t, prec):
    """Shared db->DCT finish with per-utterance masking (used by the XLA,
    FFT, and Pallas backends — keep the top_db/mask semantics in ONE place)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(cfg.amin, mel))
    valid = _valid_frames_mask(cfg, lengths, b, n_frames)
    masked = jnp.where(valid[..., None], log_spec, -jnp.inf)
    utt_max = jnp.max(masked, axis=(1, 2), keepdims=True)
    db = jnp.maximum(log_spec, utt_max - cfg.top_db)
    mfcc = jnp.einsum("btm,mc->btc", db, dct_t, precision=prec)
    mfcc = jnp.where(valid[..., None], mfcc, 0.0)
    t_out = cfg.utterance_length
    if n_frames >= t_out:
        mfcc = mfcc[:, :t_out, :]
    else:
        mfcc = jnp.pad(mfcc, ((0, 0), (0, t_out - n_frames), (0, 0)))
    return jnp.swapaxes(mfcc, 1, 2)  # (B, n_mfcc, T) — reference layout


def _finish_mfcc(power, cfg, lengths, b, n_frames, mel_t, dct_t, prec):
    """mel projection + shared finish."""
    mel = jnp.einsum("btk,km->btm", power, mel_t, precision=prec)
    return finish_mfcc_from_mel(mel, cfg, lengths, b, n_frames, dct_t, prec)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mfcc_fft_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MFCC with the spectrogram computed by a true rFFT instead of the
    DFT-as-matmul formulation: exact f32 butterflies (no multi-pass bf16
    emulation), same contract/output as mfcc_xla_batch. Faster whenever
    XLA's TPU FFT beats 2x n_fft x n_freq matmuls at precision=highest."""
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    _, _, mel_t, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)
    frames = frame_signal(ypad, n_frames, cfg.n_fft, cfg.hop_length)
    window = filters.pad_center(
        filters.hann_window(cfg.win_length), cfg.n_fft
    ).astype(np.float32)
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return _finish_mfcc(
        power, cfg, lengths, b, n_frames, jnp.asarray(mel_t),
        jnp.asarray(dct_t), prec,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def mfcc_xla_batch(
    waves: jnp.ndarray,
    cfg: FrontendConfig,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched MFCC: (B, L) float32 waveforms -> (B, n_mfcc, utterance_length).

    `lengths` (B,) marks the true sample count of each (zero-padded) waveform;
    frames past `1 + length // hop` are excluded from the top_db max and
    zeroed in the output — matching the reference's per-file semantics where
    short files are MFCC'd at native length and then zero-padded on the time
    axis (`Voice digit recogniton/extract_features_construct_dataset.py:33-37`).
    """
    b, n_samples = waves.shape
    n_frames = cfg.num_frames(n_samples)
    cr, ci, mel_t, dct_t = cfg.constants(np.float32)
    prec = jax.lax.Precision(cfg.precision.lower())
    dft_prec = _dft_precision(cfg, prec)

    pad = cfg.n_fft // 2
    ypad = jnp.pad(waves.astype(jnp.float32), ((0, 0), (pad, pad)),
                   mode=cfg.pad_mode)

    if cfg.dft_split_levels > 0:
        power = _rdft_power_split(
            ypad, n_frames, cfg.n_fft, cfg.hop_length, cfg.win_length,
            cfg.dft_split_levels, dft_prec,
        )
    else:
        frames = frame_signal(ypad, n_frames, cfg.n_fft, cfg.hop_length)
        re = jnp.einsum("btn,nk->btk", frames, cr, precision=dft_prec)
        im = jnp.einsum("btn,nk->btk", frames, ci, precision=dft_prec)
        power = re * re + im * im  # (B, T, n_freq)
    return _finish_mfcc(
        power, cfg, lengths, b, n_frames, jnp.asarray(mel_t),
        jnp.asarray(dct_t), prec,
    )
