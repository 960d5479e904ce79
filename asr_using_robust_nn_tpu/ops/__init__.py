from . import filters, frontend_ref, mfcc_xla, spectral  # noqa: F401
