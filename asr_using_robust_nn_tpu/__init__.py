"""asr_using_robust_nn_tpu — a TPU-native JAX framework with the capabilities
of fmazilu/ASR-using-robust-NN (see SURVEY.md for the full reference map).

Layers (bottom-up):
  ops/          low-level kernels: mel/DCT/DFT matrix builders, fused MFCC
                (XLA + Pallas paths), on-device spectral norms (power iteration)
  frontend/     the audio frontend API: FrontendConfig presets (digit/speaker),
                batched waveform -> MFCC feature pipelines
  utils/        WAV IO, polyphase resampling (C++ native fast path + numpy
                fallback), misc numerics
  data/         corpus walking, seeded split, 1-s slicing, .npy artifact store,
                standardizer (reference `fit-on-all` semantics behind a flag)
  models/       MLP model family (digit/speaker x constrained/unconstrained)
                as pure pytrees with BatchNorm/Dropout, Keras-compatible init
  train/        jitted train step (Adam + CCE), early stopping, checkpointing,
                metric logging; constraints applied in-step on device
  constraints/  the four Lipschitz constraint algorithms + analyzers
  attacks/      white-box (FGSM/PGD/JSMA/C&W) and black-box (white/mixture/SNR
                noise) attack suite as vmapped jitted sweeps; dolphin DSP
  parallel/     Mesh construction, data-parallel train/eval via shard_map/pjit
  cli/          non-interactive command surface mirroring the reference's
                interactive decision tree (attacks.py:2-12)
"""

__version__ = "0.1.0"

# Convenience top-level API (the names a reference user reaches for first).
from .frontend import Frontend, FrontendConfig  # noqa: E402,F401
from .models.mlp import MLPConfig  # noqa: E402,F401
from .train import TrainConfig, Trainer  # noqa: E402,F401
