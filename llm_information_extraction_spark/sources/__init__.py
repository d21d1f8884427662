from .catalog import Catalog  # noqa: F401
from .synthetic import generate_documents, generate_gold_triples  # noqa: F401
from .interleave import interleave_flat_documents  # noqa: F401
