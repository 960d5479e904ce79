"""Black-box noise attacks: white, Gaussian-mixture impulse, SNR-targeted.

Reference: `Voice digit recogniton/attacks.py:73-294`. Same noise models,
vectorized: the reference loops file-by-file re-running librosa per sweep
point (SURVEY.md §3.5 "HOT: full frontend re-run per sweep point"); here a
whole noisy batch goes through the fused TPU frontend in one call, and the
noise draws themselves are jitted + vmapped.

All functions take an explicit PRNG key (the reference used global
np.random) — pass different keys per sweep point for independent draws.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mfcc_xla import FrontendConfig

__all__ = [
    "add_white_noise",
    "mixtgauss",
    "add_noise",
    "add_white_noise_with_snr",
    "add_white_noise_on_dataset",
    "add_noise_mixture_on_dataset",
    "add_snr_noise_on_dataset",
    "audio_noise_features",
    "audio_noise_features_sliced",
]


def add_white_noise(x: jnp.ndarray, sigma: float, key) -> jnp.ndarray:
    """x + N(0, sigma^2), elementwise (`attacks.py:73-86`)."""
    return x + sigma * jax.random.normal(key, x.shape, x.dtype)


def mixtgauss(shape, p: float, sigma0: float, sigma1: float, key) -> jnp.ndarray:
    """Gaussian mixture noise (`attacks.py:145-162`): impulse locations are
    where |N(0,1)| < p; sigma1 at impulses, sigma0 elsewhere, times an
    independent N(0,1) draw."""
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, shape)
    u = (jnp.abs(q) < p).astype(jnp.float32)
    return (sigma0 * (1.0 - u) + sigma1 * u) * jax.random.normal(k2, shape)


def add_noise(x: jnp.ndarray, p: float, alpha: float, key) -> jnp.ndarray:
    """Mixture noise with sigma0=alpha, sigma1=10*alpha (`attacks.py:165-183`)."""
    return x + mixtgauss(x.shape, p, alpha, 10.0 * alpha, key)


def add_white_noise_with_snr(
    audio: jnp.ndarray, target_snr_db: float, key, length=None
) -> jnp.ndarray:
    """White noise at a target SNR (dB) relative to mean signal power, k=1
    (no signal renormalization) (`attacks.py:222-245`). Works on (..., N).

    `length` (scalar) marks the true sample count of a zero-padded signal:
    the power average runs over the real samples only (the reference
    computes np.mean(sample**2) on the native-length file) and the padded
    tail stays exactly zero."""
    if length is None:
        power = jnp.mean(audio**2, axis=-1, keepdims=True)
        mask = None
    else:
        idx = jnp.arange(audio.shape[-1])
        mask = (idx < length).astype(audio.dtype)
        power = jnp.sum((audio * mask) ** 2, axis=-1, keepdims=True) / jnp.maximum(
            length, 1
        )
    signal_db = 10.0 * jnp.log10(power)
    noise_watts = 10.0 ** ((signal_db - target_snr_db) / 10.0)
    noise = jnp.sqrt(noise_watts) * jax.random.normal(key, audio.shape, audio.dtype)
    if mask is not None:
        noise = noise * mask
    return audio + noise


# noise strengths are traced (not static): a 20-30 point sweep reuses one
# compiled program instead of compiling per point
@jax.jit
def add_white_noise_on_dataset(dataset: jnp.ndarray, sigma: float, key) -> jnp.ndarray:
    """White noise directly on MFCC features (`attacks.py:186-201`),
    whole dataset in one fused op."""
    return add_white_noise(jnp.asarray(dataset, jnp.float32), sigma, key)


@jax.jit
def add_noise_mixture_on_dataset(dataset, p: float, alpha: float, key):
    """Mixture noise on MFCC features (`attacks.py:204-219`)."""
    return add_noise(jnp.asarray(dataset, jnp.float32), p, alpha, key)


@jax.jit
def add_snr_noise_on_dataset(waves, target_snr_db: float, key, lengths=None):
    keys = jax.random.split(key, waves.shape[0])
    if lengths is None:
        return jax.vmap(
            lambda w, k: add_white_noise_with_snr(w, target_snr_db, k)
        )(jnp.asarray(waves, jnp.float32), keys)
    return jax.vmap(
        lambda w, k, l: add_white_noise_with_snr(w, target_snr_db, k, l)
    )(jnp.asarray(waves, jnp.float32), keys, jnp.asarray(lengths))


def noisy_waves(
    waves: jnp.ndarray,
    key,
    sigma: float = 0.0,
    p: float = 0.0,
    alpha: float = 0.0,
    snr_db: float | None = None,
    lengths=None,
) -> jnp.ndarray:
    """Pure (jittable) noise stage of the audio-domain attack. Noise
    selection mirrors the reference: sigma wins, else (p, alpha) mixture,
    else SNR if given, else clean (`attacks.py:105-111`, `:277-294`).

    NOTE the selection is by PYTHON truthiness of sigma/p/alpha, so these
    decide the traced program structure; the VALUES may still be traced
    scalars inside a jit as long as the chosen branch is fixed (pass 0.0 /
    non-zero consistently — `fused_audio_sweep` pins the branch with a
    static `kind` instead)."""
    def _on(v):
        # any STATIC numeric zero means off — int 0 and numpy scalar zeros
        # included (p=0 passed as an int used to slip into the mixture
        # branch); traced jax scalars are none of these types and always
        # pin the branch on
        import numbers

        return v is not None and not (
            isinstance(v, numbers.Number) and float(v) == 0.0
        )

    waves = jnp.asarray(waves, jnp.float32)
    if _on(sigma):
        noisy = add_white_noise(waves, sigma, key)
        masked_noise = True
    elif _on(alpha) and _on(p):
        # the reference's mixture branch requires BOTH p and alpha nonzero
        # (`attacks.py:105-111`); alpha alone with p=0 means clean audio,
        # not sigma=alpha white noise
        keys = jax.random.split(key, waves.shape[0])
        noisy = jax.vmap(lambda w, k: add_noise(w, p, alpha, k))(waves, keys)
        masked_noise = True
    elif snr_db is not None:
        noisy = add_snr_noise_on_dataset(waves, snr_db, key, lengths=lengths)
        masked_noise = False  # SNR path masks internally
    else:
        noisy = waves
        masked_noise = False
    if lengths is not None and masked_noise:
        # keep the padded tail exactly zero: the reference noises the
        # native-length file, and noise past the true end would leak into
        # the last valid frames' analysis windows
        idx = jnp.arange(waves.shape[-1])[None, :]
        noisy = jnp.where(idx < jnp.asarray(lengths)[:, None], noisy, 0.0)
    return noisy


def audio_noise_features(
    waves: np.ndarray,
    cfg: FrontendConfig,
    key,
    sigma: float = 0.0,
    p: float = 0.0,
    alpha: float = 0.0,
    snr_db: float | None = None,
    lengths=None,
    backend: str = "auto",
) -> np.ndarray:
    """Audio-domain attack pipeline: add noise to raw waveforms, re-run the
    MFCC frontend, return flattened features — the batched equivalent of
    `black_box_attack_on_audio_dataset` (`attacks.py:124-142`) and its SNR
    variant (`:277-294`). (For the fully fused noise->MFCC->standardize->
    predict program, see `sweeps.fused_audio_sweep`.)
    """
    from ..frontend.mfcc import Frontend

    noisy = noisy_waves(waves, key, sigma=sigma, p=p, alpha=alpha,
                        snr_db=snr_db, lengths=lengths)
    fe = Frontend(cfg, backend=backend)
    return np.asarray(fe.flat(noisy, lengths=lengths))


def audio_noise_features_sliced(
    waves_list,
    labels,
    cfg: FrontendConfig,
    key,
    sigma: float = 0.0,
    p: float = 0.0,
    alpha: float = 0.0,
    snr_db: float | None = None,
    backend: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Speaker-task audio-domain attack: noise the FULL recording first,
    then slice into 1-s windows (dropping boundary seconds) and MFCC each —
    the order the reference uses (`Speaker recognition/attacks.py:97-146`,
    `:254-295`). Labels are replicated per window.

    waves_list: list of variable-length mono waveforms at cfg.sr.
    """
    from ..data.pipeline import slice_seconds
    from ..frontend.mfcc import Frontend

    rng_keys = jax.random.split(key, max(len(waves_list), 1))
    windows, out_labels = [], []
    for i, (w, lab) in enumerate(zip(waves_list, np.asarray(labels))):
        w = jnp.asarray(w, jnp.float32)
        if sigma != 0.0:
            w = add_white_noise(w, sigma, rng_keys[i])
        elif p != 0.0 and alpha != 0.0:
            w = add_noise(w, p, alpha, rng_keys[i])
        elif snr_db is not None:
            w = add_white_noise_with_snr(w, snr_db, rng_keys[i])
        s = slice_seconds(np.asarray(w), cfg.sr)
        windows.append(s)
        out_labels.extend([lab] * len(s))
    if not windows or sum(len(s) for s in windows) == 0:
        return (np.zeros((0, cfg.feature_dim)),
                np.zeros((0,), dtype=np.int64))
    allw = np.concatenate([s for s in windows if len(s)], axis=0)
    fe = Frontend(cfg, backend=backend)
    feats = np.asarray(fe.flat(allw))
    return feats, np.asarray(out_labels, dtype=np.int64)
