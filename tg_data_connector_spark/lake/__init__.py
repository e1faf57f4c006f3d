from .fs import HadoopTableFS, LocalTableFS  # noqa: F401
from .table import LakeTable, Snapshot, TableSchema  # noqa: F401
from .merge import delta_append, merge_upsert  # noqa: F401
from .lookup import bucket_of, murmur3_x86_32  # noqa: F401
from .sync import sync_table  # noqa: F401
from .maintain import (  # noqa: F401
    MaintenanceAction,
    plan_maintenance,
    run_maintenance,
)
