"""Custom join operators Spark lacks as built-ins (SURVEY.md §3.4 J5).

* :func:`asof_join` — "most recent right row at or before the left
  row's time". Implemented as the scalable union+window composition:
  tag sides, union, ONE shuffle on the by-key, sort within partition,
  ``last(value, ignorenulls=True)`` forward-fill, keep left rows.
  O(n log n) per key group, no theta/BroadcastNestedLoopJoin, no
  row explosion — this is the canonical distributed as-of join shape
  (same idea as pandas merge_asof, re-expressed for shuffles).
* :func:`range_join_buckets` — point-in-interval join via grid-cell
  bucketing: intervals explode to the cells they overlap, points map to
  one cell, equi-join on the cell then exact-filter. Turns an
  unbounded theta join into a shuffle join whose cost tracks the
  number of true matches (cell width = tuning knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` of the most recent right
    row with the same by-key and ``on_right <= on_left`` (backward
    as-of). Right rows at exactly ``on_left`` ARE matched.

    ``tolerance_seconds`` optionally voids matches older than the
    tolerance (values become null), like pandas merge_asof(tolerance).
    """
    lcols = left.columns
    lt = left.select(
        *lcols,
        F.col(by_left).alias("_by"),
        F.col(on_left).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(by_right).alias("_by"),
        F.col(on_right).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy("_by")
        .orderBy("_t", "_is_left")  # right row sorts before left at equal t
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_rt"),
    ).filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_rt").isNotNull()
            & (
                F.col("_t").cast("timestamp_ltz").cast("long")
                - F.col("_rt").cast("timestamp_ltz").cast("long")
                <= tolerance_seconds
            )
        )
        sel = [F.when(in_tol, F.col(f"_f_{c}")).alias(c_out) for c, c_out in zip(value_cols, value_cols)]
    else:
        sel = [F.col(f"_f_{c}").alias(c) for c in value_cols]
    return filled.select(*lcols, *sel)


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell_width: float,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point <= hi``.

    Each interval is exploded to ceil(span/width)+1 grid cells; each
    point hashes to exactly one cell, so every true pair meets in one
    cell and appears exactly once — no dedup pass needed.
    """
    cell = lambda c: F.floor(c / F.lit(float(cell_width))).cast("long")  # noqa: E731
    p = points.withColumn("_cell", cell(F.col(point_col)))
    i = intervals.withColumn(
        "_cell",
        F.explode(F.sequence(cell(F.col(lo_col)), cell(F.col(hi_col)))),
    )
    joined = p.join(i, "_cell").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("_cell")


def fuzzy_match_pairs(
    df: DataFrame,
    key_col: str,
    max_distance: int = 2,
    len_band: int = 2,
) -> DataFrame:
    """Blocked fuzzy self-match (record linkage): key pairs within
    Levenshtein ``max_distance``, found without the O(n²) all-pairs
    scan via the classic blocking discipline — candidates must share a
    block key (first character) and sit within ``len_band`` of each
    other's length; only candidates pay the edit-distance verify.

    This is the same audited-approximation shape as the LSH banding
    joins: blocking bounds the join at Σ per-block C(n_b, 2) instead
    of C(n, 2), at a DOCUMENTED recall cost — a pair whose first
    character differs is unreachable BY CONSTRUCTION (at web scale
    you widen recall with multiple redundant blockings — prefix,
    suffix, sorted-neighborhood — and union the candidates; the
    single-blocking form keeps the shape honest and oracle-exact).
    Levenshtein is integer and engine-identical, so the output
    value-hashes across engines."""
    keys = df.select(F.col(key_col).alias("k")).distinct()
    ks = keys.select(
        "k",
        F.substring("k", 1, 1).alias("_blk"),
        F.length("k").alias("_ln"),
    )
    a, b = ks.alias("a"), ks.alias("b")
    cand = a.join(
        b,
        (F.col("a._blk") == F.col("b._blk"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.abs(F.col("a._ln") - F.col("b._ln")) <= len_band),
    )
    return (
        cand.select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.levenshtein(F.col("a.k"), F.col("b.k")).cast("long").alias(
                "distance"
            ),
        )
        .filter(F.col("distance") <= max_distance)
        .orderBy("key_a", "key_b")
    )


def bloom_semi_audit(
    probe: DataFrame,
    dim: DataFrame,
    probe_key: str,
    dim_key: str,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter semi-join pruning with a false-positive audit —
    the runtime-filter device behind Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled``: build a
    Bloom filter from the (selective) dim-side keys, probe the fact
    side through it BEFORE the shuffle, and measure how many
    non-matching keys leak through (the FP rate that decides whether
    the filter pays for itself).

    Engine-portable construction: hash_j(key) = the j-th 4-hex-char
    slice of md5(key) — 16-bit buckets, ``n_hashes`` ≤ 8 independent
    slices, so "bit positions" are (j, hex4) STRING pairs and the
    identical filter materializes on any engine with md5 (no
    platform-hash divergence, the sample_mixture discipline). The
    filter relation is n_hashes·|dim_keys| rows, distinct-compressed —
    broadcast-sized exactly when a Bloom filter would be worthwhile.
    A probe key passes iff ALL n_hashes slices hit the filter: one
    broadcast join + a count == n_hashes group — never a shuffle of
    the fact table. The audit compares against the exact semi-join.

    Returns ONE row: dim/probe key counts, filter size, pass/true/FP
    counts and the FP rate among true negatives."""
    if not 1 <= n_hashes <= 8:
        # md5 is 32 hex chars = eight 4-hex slices; a 9th slice would be
        # the empty string for EVERY key, always hit, and silently
        # inflate the audit (round-4 advice).
        raise ValueError(f"n_hashes must be in [1, 8], got {n_hashes}")
    dkeys = dim.select(F.col(dim_key).cast("string").alias("k")).distinct()
    pkeys = probe.select(F.col(probe_key).cast("string").alias("k")).distinct()

    def slices(df):
        h = F.md5(F.col("k"))
        pos = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.substring(h, 1 + 4 * j, 4).alias("pos"),
                )
                for j in range(n_hashes)
            ]
        )
        return df.select("k", F.explode(pos).alias("e")).select(
            "k", F.col("e.j").alias("j"), F.col("e.pos").alias("pos")
        )

    bloom = slices(dkeys).select("j", "pos").distinct()
    hits = (
        slices(pkeys)
        .join(F.broadcast(bloom), ["j", "pos"], "left_semi")
        .groupBy("k")
        .agg(F.count("*").alias("nh"))
        .filter(F.col("nh") == n_hashes)
        .select("k")
    )
    true_pos = pkeys.join(dkeys, "k", "left_semi")
    stats = (
        pkeys.agg(F.count("*").alias("n_probe_keys"))
        .crossJoin(dkeys.agg(F.count("*").alias("n_dim_keys")))
        .crossJoin(bloom.agg(F.count("*").alias("n_filter_entries")))
        .crossJoin(hits.agg(F.count("*").alias("n_pass")))
        .crossJoin(true_pos.agg(F.count("*").alias("n_true")))
    )
    from stash_log_parser_spark.operators.textstats import round6

    return stats.select(
        F.col("n_dim_keys").cast("long").alias("n_dim_keys"),
        F.col("n_probe_keys").cast("long").alias("n_probe_keys"),
        F.col("n_filter_entries").cast("long").alias("n_filter_entries"),
        F.col("n_pass").cast("long").alias("n_pass"),
        F.col("n_true").cast("long").alias("n_true"),
        (F.col("n_pass") - F.col("n_true")).cast("long").alias("n_false_pos"),
        round6(
            (F.col("n_pass") - F.col("n_true"))
            / F.greatest(F.col("n_probe_keys") - F.col("n_true"), F.lit(1))
        ).alias("fp_rate"),
    )


def join_size_stats(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Exact equi-join cardinality from per-side key censuses WITHOUT
    executing the join — |A ⋈ B| = Σ_k cA(k)·cB(k). This is the
    statistic a cost-based planner needs to choose broadcast vs
    shuffle-hash vs sort-merge, computed the way a 100 TB job must:
    census each side first (map-side-combinable hash-aggs, |keys|
    partial rows per input partition), then join the two CENSUSES —
    never the fact tables.

    Returns ONE row: distinct keys per side and in the intersection,
    the exact join row count, and the max per-key fanout (the skew
    signal — a fanout near join_rows means one hot key dominates and
    the real join wants salting; see shuffle_skew_report)."""
    lc = (
        left.select(F.col(left_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("cl"))
    )
    rc = (
        right.select(F.col(right_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("cr"))
    )
    both = lc.join(rc, "k").select(
        (F.col("cl") * F.col("cr")).alias("fan")
    )
    sl = lc.agg(F.count("*").cast("long").alias("n_keys_left"))
    sr = rc.agg(F.count("*").cast("long").alias("n_keys_right"))
    sj = both.agg(
        F.count("*").cast("long").alias("n_keys_both"),
        F.coalesce(F.sum("fan"), F.lit(0)).cast("long").alias("join_rows"),
        F.coalesce(F.max("fan"), F.lit(0)).cast("long").alias("max_key_fanout"),
    )
    return sj.crossJoin(F.broadcast(sl)).crossJoin(F.broadcast(sr)).select(
        "n_keys_left",
        "n_keys_right",
        "n_keys_both",
        "join_rows",
        "max_key_fanout",
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_col: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: replicate the DIM side ``n_salt`` ways
    and scatter each fact row to one replica, so a hot join key's rows
    land on ``n_salt`` shuffle partitions instead of one.

    This is the manual fallback for the case AQE's skew-join split does
    NOT cover: a single hot KEY (not a hot partition) on a join that
    must shuffle both sides — e.g. a fork-bomb repository joined to its
    per-repo config at 10^12 rows, where one task would otherwise
    receive the whole hot key. The fact side's salt is deterministic
    (``pmod(xxhash64(salt_col), n_salt)`` over a unique fact column —
    never rand(), which breaks retry idempotency: a re-executed task
    must re-derive identical salts or rows duplicate/vanish under
    speculative execution); the dim side explodes a 0..n_salt-1 array.
    Join keys become (key, salt) so co-partitioning still holds.

    Result == plain ``fact ⨝ dim`` exactly (the salt columns are
    dropped); only the shuffle layout changes. n_salt trades dim
    duplication (×n_salt rows moved) for hot-key parallelism — size it
    to the ratio hot-key-rows / healthy-partition-rows, not higher.
    """
    if not 1 <= n_salt <= 4096:
        raise ValueError(f"n_salt must be in [1, 4096], got {n_salt}")
    f_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt)).cast("int")
    )
    d_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    cond = (f_salted[fact_key] == d_salted[dim_key]) & (
        f_salted["_salt"] == d_salted["_salt"]
    )
    out = f_salted.join(d_salted, cond, "inner")
    return out.select(
        *[f_salted[c] for c in fact.columns],
        *[d_salted[c] for c in dim.columns if c != dim_key],
    )
