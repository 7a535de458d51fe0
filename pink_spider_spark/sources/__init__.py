from .schemas import (  # noqa: F401
    ENCLOSURE_SCHEMA,
    ENTRY_SCHEMA,
    FRONTIER_SCHEMA,
    METRICS_SCHEMA,
    PAGES_SCHEMA,
    PROVIDER_CATALOG_SCHEMA,
    ROBOTS_SCHEMA,
    SEEN_SCHEMA,
)
from .tables import SnapshotTable, TableStore  # noqa: F401
