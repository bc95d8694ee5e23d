from . import catalog_ext  # noqa: F401  (registers extension queries)
from . import catalog_more  # noqa: F401  (registers additional coverage)
from . import catalog_scale  # noqa: F401  (registers scale-technique queries)
from .catalog import CATALOG, oracle_sql_map, queries_map

__all__ = ["CATALOG", "queries_map", "oracle_sql_map"]
