"""Plain access-log file source (the reference's native input mode).

A user of the reference feeds ``atlassian-stash-access-YYYY-MM-DD.N.log``
(optionally ``.gz``) files; this module gives the rebuild the same
front door (SURVEY.md §3.1 S1–S4):

* S1 multi-file scan  → ``spark.read.text(paths)`` (one row per line)
* S2 gzip decompress  → transparent: Spark's text source decodes ``.gz``
  by codec; no code needed
* S3 filename-date order → the date is parsed out of ``input_file_name``
  into a ``file_day`` column; analyses bucket by timestamp anyway, so
  ordering is metadata, not a physical sort
* S4 date-range file filter → ``file_day`` predicate; with a
  directory-partitioned layout this prunes whole files before reading
  (and under Iceberg, partition pruning)

The decoded lines feed the SAME grok (functions.parse.parse_lines) and
therefore every analysis unchanged.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FILENAME_DATE_RE = r"(\d{4}-\d{2}-\d{2})"


def read_log_files(
    spark: SparkSession,
    paths: str | list[str],
    since: str | dt.date | None = None,
    until: str | dt.date | None = None,
) -> DataFrame:
    """Read raw access-log file(s) into (line, source, file_day, doc_id).

    ``since``/``until`` (inclusive ISO dates) filter by the date embedded
    in the file name — the reference's ``sortLogFiles``/``createPredicate``
    semantics (File.hs:~30/~50 [K]) expressed as a prunable predicate.

    ``doc_id`` is synthesized as ``<file>#<hash>`` where the hash is
    ``xxhash64(line, occurrence-among-identical-lines)`` — STABLE across
    scans, retries, and partition-layout changes (a
    monotonically_increasing_id, as in round 1, re-keys on every read
    and silently mis-joins the routed raw-row re-attach). Identical
    duplicate lines are interchangeable, so the occurrence number's
    arbitrary assignment still yields a stable id MULTISET. The
    occurrence window costs one shuffle — keyed on
    ``(source, xxhash64(line))``, NOT the line text itself, so the
    exchange hashes/compares 8-byte keys while the line rides as row
    payload (round-2 review: the full-line key was the last
    payload-keyed shuffle in the repo). Hash collisions merely co-locate
    two distinct lines in one window partition; the within-partition
    sort on ``line`` keeps each line's occurrence numbering contiguous
    and deterministic, so doc_ids stay stable. A production ingest
    assigns row ids at write time (e.g. Iceberg) and skips this — the
    raw-file front door favors correctness over that one pass.
    """
    from pyspark.sql import Window

    df = spark.read.text(paths)
    src = F.element_at(F.split(F.input_file_name(), "/"), -1)
    df = (
        df.withColumn("source", src)
        .withColumn("file_day", F.regexp_extract("source", FILENAME_DATE_RE, 1))
        .withColumnRenamed("value", "line")
        .withColumn("_lh", F.xxhash64("line"))
    )
    occ = F.row_number().over(Window.partitionBy("source", "_lh").orderBy("line"))
    df = df.withColumn(
        "doc_id",
        F.format_string("%s#%016x", F.col("source"), F.xxhash64("line", occ)),
    ).drop("_lh")
    if since is not None:
        df = df.filter(F.col("file_day") >= str(since))
    if until is not None:
        df = df.filter(F.col("file_day") <= str(until))
    return df


def parse_log_files(
    spark: SparkSession,
    paths: str | list[str],
    since: str | dt.date | None = None,
    until: str | dt.date | None = None,
) -> DataFrame:
    """Raw log files → fully parsed LogEntry frame (same schema as the
    tokenized-corpus path, minus the tokens column)."""
    from ..functions.parse import parse_lines

    lines = read_log_files(spark, paths, since, until)
    return parse_lines(lines).drop("line")


def sort_log_files(names: list[str]) -> list[str]:
    """Filename-date (then sequence-number) ordering of log file names —
    the reference's sortLogFiles, for callers that enumerate files
    themselves."""

    def key(name: str):
        m = re.search(FILENAME_DATE_RE, name)
        n = re.search(r"\.(\d+)\.log", name)
        return (m.group(1) if m else "", int(n.group(1)) if n else 0, name)

    return sorted(names, key=key)
