from .incremental import (  # noqa: F401
    compact_signature_store,
    incremental_fuzzy_unique_documents,
    incremental_triples,
    incremental_unique_embeddings,
    incremental_unique_documents,
)
from .stateful import (  # noqa: F401
    sessionize_users,
    windowed_event_counts,
)
