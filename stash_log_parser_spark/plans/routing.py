"""Fan-out routing: one parse, many per-analysis sinks, resumable.

The reference runs one analysis per CLI invocation over the same files
(Main.hs mode dispatch [K]); at 10^12 rows re-parsing per analysis is
the dominant cost, so the rebuild parses ONCE into a day-partitioned
parsed STAGE table and fans every sink out as a column-pruned scan of
it (SURVEY.md §8.1 M6). The stage is lineage-committed like any sink,
so incremental runs never re-parse committed days, and it doubles as a
queryable artifact (the "parsed logs" table a log platform would keep).

Incremental / resumable semantics mirror the reference's "progressive"
file-level resume (File.hs:~50 createPredicate [K]) at day granularity:
the routing day is the date embedded in the source *filename*
(``atlassian-stash-access-YYYY-MM-DD.N.log`` — File.hs:~30
sortLogFiles [K]), every sink is day-partitioned, and a restart skips
(sink, day) partitions already recorded in the ``_lineage`` table.
Partition writes are whole-day overwrites, so a crash between data and
lineage commits is repaired by an idempotent rewrite.

Scale design: per-day aggregates are MERGEABLE partials — global
repositoryStats / protocolStats roll up from the daily sinks without
touching raw data; exact global percentiles come from the routed
request_durations raw sink. Lineage row-counts come from the write
job itself (Observation); an Iceberg backend would read them from the
commit snapshot instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.parse import parse_corpus
from ..operators import analyses as A
from ..operators.enrich import enrich
from ..sources.catalog import SinkCatalog

_FILE_DAY_RE = r"(\d{4}-\d{2}-\d{2})"


def _with_day(df: DataFrame, from_hour_string: str | None = None) -> DataFrame:
    if from_hour_string:
        return df.withColumn("day", F.substring(F.col(from_hour_string), 1, 10))
    return df


def _sink_git_operations(p: DataFrame) -> DataFrame:
    return _with_day(A.git_operations(p), "hour")


def _sink_protocol_by_hour(p: DataFrame) -> DataFrame:
    return _with_day(A.protocol_by_hour(p), "hour")


def _sink_concurrency_by_hour(p: DataFrame) -> DataFrame:
    df = A.concurrency_by_hour(p, two_level=True).withColumn(
        "day", F.date_format("hour", "yyyy-MM-dd")
    )
    return df.withColumn("hour", F.date_format("hour", "yyyy-MM-dd HH"))


def _sink_protocol_counts_daily(p: DataFrame) -> DataFrame:
    return (
        p.filter(F.col("is_parsed"))
        .groupBy("file_day", "protocol")
        .agg(F.count("*").alias("n"))
        .withColumnRenamed("file_day", "day")
    )


def _sink_repository_stats_daily(p: DataFrame) -> DataFrame:
    ops = p.filter(F.col("op_type").isNotNull() & F.col("repo_slug").isNotNull())
    aggs = [
        F.sum((F.col("op_type") == op).cast("long")).alias(plural)
        for op, plural in A._OP_PLURAL.items()
    ]
    return (
        ops.groupBy("file_day", "repo_slug").agg(*aggs).withColumnRenamed("file_day", "day")
    )


def _sink_request_durations(p: DataFrame) -> DataFrame:
    """Routed RAW rows — carries the original tokens (BASELINE.json:15).

    The stage table stores tokens alongside the parsed columns, so this
    sink is a pure pruned scan + filter + write: no join, no shuffle."""
    return p.filter(
        F.col("op_type").isNotNull() & F.col("duration_ms").isNotNull()
    ).select(
        "doc_id", "tokens", "op_type", "duration_ms", "username", "client_ip",
        "project_key", "datacenter", "ts_raw",
        F.col("file_day").alias("day"),
    )


def _sink_pairing_daily(p: DataFrame) -> DataFrame:
    pairs = A.pair_requests(p)
    return (
        pairs.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.sum((F.col("ts_in").isNotNull() & F.col("ts_out").isNotNull()).cast("long")).alias("matched_pairs"),
            F.sum(F.col("ts_out").isNull().cast("long")).alias("unmatched_incoming"),
            F.sum(F.col("ts_in").isNull().cast("long")).alias("unmatched_outgoing"),
        )
    )


def _sink_metrics(p: DataFrame) -> DataFrame:
    """Per-(day, source) parse metrics — malformed lines are counted here,
    never silently dropped (SURVEY.md §3.3 F5)."""
    return (
        p.groupBy(F.col("file_day").alias("day"), "source")
        .agg(
            F.count("*").alias("total_lines"),
            F.sum(F.col("is_parsed").cast("long")).alias("parsed_lines"),
            F.sum((~F.col("is_parsed")).cast("long")).alias("malformed_lines"),
        )
    )


SINKS: dict[str, callable] = {
    "git_operations": _sink_git_operations,
    "protocol_by_hour": _sink_protocol_by_hour,
    "concurrency_by_hour": _sink_concurrency_by_hour,
    "protocol_counts_daily": _sink_protocol_counts_daily,
    "repository_stats_daily": _sink_repository_stats_daily,
    "request_durations": _sink_request_durations,
    "pairing_daily": _sink_pairing_daily,
    "metrics": _sink_metrics,
}


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output: str,
    run_id: str = "run-0",
    force: bool = False,
    use_sql_decode: bool = False,
    sinks: dict | None = None,
) -> dict:
    """Parse → enrich → route the corpus at ``input_path`` into per-analysis
    day-partitioned sinks under ``output``. Returns a summary dict.

    Resume: (sink, day) partitions already in ``_lineage`` are skipped
    (``force=True`` reprocesses everything). Days still pending for ANY
    sink are parsed once into the stage table and fanned out.
    """
    import time

    t_start = time.perf_counter()
    timings: dict[str, float] = {}

    def mark(name: str, t0: float) -> None:
        timings[name] = round(time.perf_counter() - t0, 2)

    sinks = sinks or SINKS
    # defensive: callers may bring their own session (driver harness);
    # small Arrow batches are required for the tokens-through parse
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    catalog = SinkCatalog(spark, output)
    committed = set() if force else catalog.committed()

    t0 = time.perf_counter()
    raw = spark.read.parquet(input_path).select("doc_id", "tokens", "n_tok", "source")
    raw = raw.withColumn("file_day", F.regexp_extract("source", _FILE_DAY_RE, 1))
    all_days = sorted(r.file_day for r in raw.select("file_day").distinct().collect())
    mark("discover_days", t0)

    pending: dict[str, list[str]] = {
        name: [d for d in all_days if (name, d) not in committed] for name in sinks
    }
    days_needed = sorted({d for ds in pending.values() for d in ds})
    summary = {"run_id": run_id, "days_total": len(all_days), "days_parsed": len(days_needed), "sinks": {}}
    if not days_needed:
        return summary

    # ---- phase 1: the parsed STAGE table --------------------------------
    # One full parse materialized as a day-partitioned parquet/Iceberg
    # table (tokens included, array intermediates dropped). Chosen over
    # DataFrame caching after measurement: the columnar cache build cost
    # ~3x the parse itself and did not scale with cores, while a parquet
    # stage writes in parallel and gives every sink a column-PRUNED scan
    # (the heavy tokens column is only read by the routed raw-row sink).
    # The stage is lineage-committed per day, so a resume never re-parses
    # committed days - the parsed table is itself a useful artifact.
    from pyspark.sql import Observation

    stage_days = [d for d in days_needed if ("parsed_stage", d) not in committed]
    t0 = time.perf_counter()
    if stage_days:
        scoped = raw.filter(F.col("file_day").isin(stage_days))
        # Defend against under-partitioned inputs (few giant files): the
        # parse stage is CPU-bound, so fewer input splits than cores
        # leaves the cluster idle. A production Iceberg table is
        # range-partitioned into many files and never hits this branch.
        target = spark.sparkContext.defaultParallelism * 2
        if scoped.rdd.getNumPartitions() < target // 2:
            scoped = scoped.repartition(target)
        parsed = enrich(
            parse_corpus(scoped, use_sql_decode=use_sql_decode, with_tokens=True)
        ).withColumn("file_day", F.regexp_extract("source", _FILE_DAY_RE, 1))
        stage_df = parsed.select(
            "doc_id", "tokens", "n_tok", "source", "is_parsed",
            "protocol", "req_dir", "req_counter", "username", "client_ip",
            "ts", "ts_raw", "repo_slug", "duration_ms", "op_type", "cache_hit",
            "hour", F.col("file_day").alias("day"), "project_key", "datacenter",
        )
        # File-count note: input shards are expected day-aligned (a real
        # ingest table is range-partitioned by date — SURVEY.md S3), so
        # each write task emits into ONE day-partition and the commit
        # moves O(tasks) files. A round-robin-sharded input instead
        # yields tasks×days files; we accept that rather than paying a
        # full-payload reshuffle here.
        obs = Observation()
        stage_df = stage_df.observe(obs, F.count(F.lit(1)).alias("rows"))
        catalog.write_partitions(stage_df, "parsed_stage")
        catalog.commit(
            [("parsed_stage", d, int(obs.get["rows"])) for d in stage_days], run_id
        )
    mark("parse_stage", t0)
    summary["stage_days_written"] = len(stage_days)

    stage = catalog.read("parsed_stage").withColumn("file_day", F.col("day"))

    # ---- phase 2: fan-out over pruned stage scans ------------------------
    for name, fn in sinks.items():
        t0 = time.perf_counter()
        days = pending[name]
        if not days:
            summary["sinks"][name] = {"days_written": 0, "rows": 0}
            continue
        df = fn(stage.filter(F.col("file_day").isin(days)))
        df = df.filter(F.col("day").isin(days))
        # row count comes from the write job itself (Observation) -
        # no second pass over the sink frame.
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        catalog.write_partitions(df, name)
        batch_rows = int(obs.get["rows"])
        # lineage rows is the batch total (the commit-mark granularity
        # is (sink, day); exact per-day line counts live in the
        # metrics sink).
        entries = [(name, d, batch_rows) for d in days]
        catalog.commit(entries, run_id)
        summary["sinks"][name] = {"days_written": len(days), "rows": batch_rows}
        mark(f"sink_{name}", t0)
    timings["total"] = round(time.perf_counter() - t_start, 2)
    summary["timings"] = timings
    return summary


# -- global rollups from the mergeable daily sinks ---------------------------


def repository_stats_global(catalog: SinkCatalog) -> DataFrame:
    daily = catalog.read("repository_stats_daily")
    sums = [F.sum(c).alias(c) for c in A._OP_PLURAL.values()]
    return daily.groupBy("repo_slug").agg(*sums).orderBy(F.desc("clones"), F.asc("repo_slug"))


def protocol_counts_global(catalog: SinkCatalog) -> DataFrame:
    return (
        catalog.read("protocol_counts_daily")
        .groupBy("protocol")
        .agg(F.sum("n").alias("n"))
        .orderBy("protocol")
    )


def duration_percentiles_global(catalog: SinkCatalog, approx: bool = False) -> DataFrame:
    durs = catalog.read("request_durations")
    pcts = [0.5, 0.9, 0.95, 0.99]
    names = ["p50", "p90", "p95", "p99"]
    fn = F.percentile_approx if approx else F.percentile
    agg = fn(F.col("duration_ms"), F.array(*[F.lit(p) for p in pcts]))
    exploded = [F.get(F.col("_p"), i).cast("double").alias(n) for i, n in enumerate(names)]
    return (
        durs.groupBy("op_type")
        .agg(F.count("*").alias("n"), agg.alias("_p"))
        .select("op_type", "n", *exploded)
        .orderBy("op_type")
    )
