from .incremental import incremental_triples  # noqa: F401
