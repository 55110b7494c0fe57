"""Reference-parity CLI: the stash-log-parser command surface on Spark.

The reference is invoked as ``logparser <command> <access-log files>``
and prints pipe-separated tables for gnuplot (Main.hs cmdargs modes,
Output.hs plot formatting [K] — SURVEY.md §4). This module gives the
rebuild the same front door over raw ``.log``/``.log.gz`` files (and,
with ``--tokenized``, over tokenized parquet corpora):

    python -m stash_log_parser_spark gitOperations /var/log/stash/
    python -m stash_log_parser_spark maxConn access-log.gz
    python -m stash_log_parser_spark repositoryStats --since 2012-09-08 logs/

Commands (reference CLI modes → analyses):
  countRequests · maxConn · concurrentConn · concurrentConnMinute ·
  gitOperations · protocolStats · repositoryStats · requestDurations
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _print_df(df, sep: str = "|") -> None:
    cols = df.columns
    print(sep.join(cols))
    for row in df.collect():
        print(sep.join("" if v is None else str(v) for v in row))


def main(argv: list[str] | None = None) -> int:
    from .operators import analyses as A

    commands = {
        "countRequests": lambda p: A.count_requests(p),
        "maxConn": lambda p: A.max_concurrent(p),
        "concurrentConn": lambda p: A.concurrency_by_hour(p).select(
            F.date_format("hour", "yyyy-MM-dd HH").alias("hour"), "max_concurrent"
        ),
        "concurrentConnMinute": lambda p: A.concurrency_by_hour(p, bucket="minute").select(
            F.date_format("minute", "yyyy-MM-dd HH:mm").alias("minute"), "max_concurrent"
        ),
        "gitOperations": lambda p: A.git_operations(p),
        "protocolStats": lambda p: A.protocol_by_hour(p),
        "repositoryStats": lambda p: A.repository_stats(p),
        "requestDurations": lambda p: A.request_durations(p).drop("tokens"),
        "durationPercentiles": lambda p: A.duration_percentiles(p),
    }

    ap = argparse.ArgumentParser(prog="stash_log_parser_spark")
    ap.add_argument("command", choices=sorted(commands))
    ap.add_argument("paths", nargs="+", help="log files/dirs (.log/.log.gz), or parquet with --tokenized")
    ap.add_argument("--since", default=None, help="inclusive filename-date lower bound YYYY-MM-DD")
    ap.add_argument("--until", default=None, help="inclusive filename-date upper bound YYYY-MM-DD")
    ap.add_argument("--tokenized", action="store_true",
                    help="paths are tokenized-sequence parquet, not raw log text")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .session import build_session

    spark = build_session(app_name=f"logparser-{args.command}", master=args.master)
    if args.tokenized:
        from .functions.parse import parse_corpus

        parsed = parse_corpus(spark.read.parquet(*args.paths))
        if args.since:
            parsed = parsed.filter(F.col("day") >= args.since)
        if args.until:
            parsed = parsed.filter(F.col("day") <= args.until)
    else:
        from .sources.logfiles import parse_log_files

        parsed = parse_log_files(spark, args.paths, since=args.since, until=args.until)

    _print_df(commands[args.command](parsed))
    return 0


if __name__ == "__main__":
    sys.exit(main())
