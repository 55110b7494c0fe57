from .analyses import (  # noqa: F401
    OP_TYPES,
    concurrency_by_hour,
    concurrency_timeline,
    count_requests,
    duration_percentiles,
    git_operations,
    max_concurrent,
    pair_requests,
    pairing_stats,
    protocol_by_hour,
    protocol_counts,
    repository_stats,
    request_durations,
)
from .enrich import (  # noqa: F401
    default_ip_datacenter,
    default_repo_project,
    enrich,
    ip_prefix_expr,
)
