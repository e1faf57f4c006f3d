from .foreach import (  # noqa: F401
    changelog_stream_schema,
    stream_dedup_ingest,
    stream_replay,
    stream_view_maintenance,
)
from .stateful import sessionize_stream  # noqa: F401
