from .foreach import stream_replay, changelog_stream_schema  # noqa: F401
from .stateful import sessionize_stream  # noqa: F401
