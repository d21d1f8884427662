from .normalize import (  # noqa: F401
    canonicalize_array,
    canonicalize_col,
    clean_split,
    is_empty_token,
    normalize_text,
    strip_pmc_prefix,
)
from .sampling import hash_sample, hash_split, hash_uniform  # noqa: F401
from .textmetrics import (  # noqa: F401
    corpus_profile,
    detect_lang,
    doc_fingerprint,
    quality_score,
    repetition_stats,
    token_count,
    tokenize,
)
