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
from .joins import asof_join, range_join_buckets  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    exact_dedup_keep_first,
    jaccard_pairs_bruteforce,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
)
from .similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from .textstats import fingerprint, lang_scores, text_stats  # noqa: F401
