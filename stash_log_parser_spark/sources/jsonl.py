"""JSON-Lines ingest front door (fluentd/filebeat-style envelope).

Real log shipping rarely delivers raw ``.log`` files to the warehouse:
collectors wrap each line in a JSON envelope ``{"line": ..., "source":
...}`` and ship newline-delimited, gzip-rotated ``.jsonl.gz``. This
module is that third front door (next to the tokenized-parquet and
plain-text readers): Spark's text source scans the shipped files (gzip
transparent, one split per .gz file — the same per-file parallelism
grain as the raw-log reader), ``from_json`` in PERMISSIVE mode unwraps
the envelope, and the same ``parse_lines`` grok used by the plain-text
door takes over — every analysis downstream is source-format-agnostic.

F5 discipline extends to the ENVELOPE layer: a corrupt envelope (broken
JSON, or valid JSON missing the ``line`` key) is COUNTED as a malformed
row, never dropped and never an exception. ``from_json`` on a column is
used instead of ``spark.read.json`` because the JSON *source*'s
PERMISSIVE corrupt-record column cannot be queried alone (Spark raises
on filter-only references to the internal corrupt column); the
column-level form has no such restriction and keeps the raw text
available for diagnostics.

JSON string escaping round-trips exactly (``to_json`` escapes the
quotes inside HTTP action fields, ``from_json`` unescapes them), so the
parquet, plain-text, and JSONL doors land on identical parsed frames —
oracle-checked by ``log_jsonl_front_door``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENVELOPE_SCHEMA = "line string, source string, _corrupt string"


def write_jsonl_logs(
    corpus: DataFrame, out_dir: str, corrupt_per_day: int = 2
) -> None:
    """Materialize a corpus frame as day-partitioned ``.jsonl.gz``
    envelope files (the test/bench harness for the JSONL door — a
    production deployment receives these files from the log collector
    instead). Plants ``corrupt_per_day`` deterministic broken-JSON
    envelopes per day so the corrupt-envelope path is always exercised.
    """
    env = corpus.select(
        F.col("day"),
        F.to_json(F.struct("line", "source")).alias("value"),
    )
    days = corpus.select("day").distinct()
    corrupt = (
        days.crossJoin(
            F.broadcast(
                days.sparkSession.range(corrupt_per_day).select(
                    F.col("id").alias("_i")
                )
            )
        )
        .select(
            "day",
            F.concat(
                F.lit('{"broken envelope #'),
                F.col("_i").cast("string"),
                F.lit(" day "),
                F.col("day"),
            ).alias("value"),
        )
    )
    env.unionByName(corrupt).write.mode("overwrite").partitionBy(
        "day"
    ).option("compression", "gzip").text(out_dir)


def read_jsonl_lines(spark: SparkSession, path: str) -> DataFrame:
    """Shipped ``.jsonl[.gz]`` files → (line, source, env_corrupt).

    ``env_corrupt`` is true when the envelope itself failed (broken
    JSON or missing ``line``); such rows keep the raw envelope text in
    ``line`` for diagnostics and must be counted malformed downstream.
    """
    raw = spark.read.text(path)
    env = raw.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            ENVELOPE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("e"),
    )
    return env.select(
        F.coalesce(F.col("e.line"), F.col("value")).alias("line"),
        F.col("e.source").alias("source"),
        F.col("e.line").isNull().alias("env_corrupt"),
    )


def parse_jsonl_logs(spark: SparkSession, path: str) -> DataFrame:
    """JSONL door → the standard parsed frame: grok every intact
    envelope's line; corrupt envelopes come through as is_parsed=false
    rows (their raw text rides in ``line``), so the F5 malformed census
    covers BOTH failure layers with one flag."""
    from stash_log_parser_spark.functions.parse import parse_lines

    env = read_jsonl_lines(spark, path)
    parsed = parse_lines(env, line_col="line")
    return parsed.withColumn(
        "is_parsed", F.col("is_parsed") & ~F.col("env_corrupt")
    )
