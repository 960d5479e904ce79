from ..ops.mfcc_xla import FrontendConfig  # noqa: F401
from .mfcc import Frontend  # noqa: F401
