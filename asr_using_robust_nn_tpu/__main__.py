"""`python -m asr_using_robust_nn_tpu` == the asrtpu CLI."""

import sys

from .cli.main import main

if __name__ == "__main__":
    sys.exit(main())
