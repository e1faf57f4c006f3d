from .files import ColumnEntry, read_typed_csv  # noqa: F401
from .jdbc import range_split_predicates, quantile_split_predicates, read_jdbc_split  # noqa: F401
from .tables import expand_sharded_tables, read_sharded  # noqa: F401
