from .corpus import DIGIT_WORDS, walk_corpus  # noqa: F401
from .pipeline import (  # noqa: F401
    DatasetSplits,
    build_dataset,
    load_artifacts,
    save_artifacts,
    slice_seconds,
    split_files,
    standardize_fit_all,
)
