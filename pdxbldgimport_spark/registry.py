"""Aggregated query registry: importing this module loads every query
family into queries.QUERIES / queries.ORACLES."""

from . import queries
from . import queries_osm  # noqa: F401  (registers on import)
from . import queries_text  # noqa: F401
from . import queries_multimodal  # noqa: F401
from . import queries_events  # noqa: F401

QUERIES = queries.QUERIES
ORACLES = queries.ORACLES
