from .incremental import (  # noqa: F401
    incremental_triples,
    incremental_unique_documents,
)
from .stateful import (  # noqa: F401
    sessionize_users,
    windowed_event_counts,
)
