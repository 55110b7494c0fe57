from .stream import (  # noqa: F401
    stream_corpus,
    streaming_git_operations,
    streaming_protocol_counts,
    streaming_sessionize,
)
