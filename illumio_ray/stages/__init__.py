"""map_batches stages for the flagship pipeline.

parse (stateless tasks) → enrich (actor pool with broadcast lookups) →
route (stateless tasks: event_class + wire serialization).
"""

from .enrich import Enricher, broadcast_lookups  # noqa: F401
from .route import route_batch  # noqa: F401
