from .fs import HadoopTableFS, LocalTableFS  # noqa: F401
from .table import LakeTable, Snapshot, TableSchema  # noqa: F401
from .merge import merge_upsert  # noqa: F401
from .sync import sync_table  # noqa: F401
