from .foreach import stream_replay, changelog_stream_schema  # noqa: F401
