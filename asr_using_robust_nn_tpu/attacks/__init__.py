from .blackbox import (  # noqa: F401
    add_noise,
    add_noise_mixture_on_dataset,
    add_snr_noise_on_dataset,
    add_white_noise,
    add_white_noise_on_dataset,
    add_white_noise_with_snr,
    audio_noise_features,
    audio_noise_features_sliced,
    mixtgauss,
)
from .whitebox import (  # noqa: F401
    carlini_l2,
    carlini_linf,
    fgsm,
    jsma,
    pgd,
)
