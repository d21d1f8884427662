from .payload import (  # noqa: F401
    build_payload,
    prune_empty_spans,
    span_signature,
)
from .extraction import extract_triples  # noqa: F401
