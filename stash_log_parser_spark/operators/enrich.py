"""J3/J4 enrichment: broadcast lookup joins (repo→project, IP→datacenter).

Absent in the reference (a single-process CLI) but required by the
rebuild spec (BASELINE.json:6 "broadcast lookup joins"). Both lookups are
small dimension tables → ``F.broadcast`` forces a BroadcastHashJoin so
the 10^12-row fact side never shuffles for enrichment.

The IP→datacenter match is a /24-prefix match, made equi-joinable by
projecting the first three octets (SURVEY.md §3.4 J4) — broadcast makes
a theta/range join unnecessary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Default lookup contents mirror FIXTURES.md §3 plus the synthetic corpus
# repo universe (corpus.py REPOS).
_REPO_PROJECT = [
    ("conf/confluence", "CONF", "Confluence Project"),
    ("conf/teams", "CONF", "Confluence Project"),
    ("teams/website", "TEAMS", "Teams Project"),
    ("jira/jira-core", "JIRA", "Jira Project"),
    ("bamb/bamboo", "BAMB", "Bamboo Project"),
    ("stash/stash", "STASH", "Stash Project"),
    ("fe/frontend", "FE", "Frontend Project"),
    ("ops/deploy-tools", "OPS", "Ops Project"),
]

_IP_DATACENTER = [
    ("172.16.1", "dc-syd"),
    ("10.0.0", "dc-ams"),
    ("63.246.22", "external"),
    ("192.168.1", "dc-lab"),
]


def default_repo_project(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _REPO_PROJECT, "repo_slug string, project_key string, project_name string"
    )


def default_ip_datacenter(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_IP_DATACENTER, "ip_prefix string, datacenter string")


def ip_prefix_expr(ip: Column) -> Column:
    """First three octets of an IPv4 address — the /24 equi-join key."""
    return F.regexp_extract(ip, r"^(\d+\.\d+\.\d+)\.", 1)


def enrich(
    parsed: DataFrame,
    repo_project: DataFrame | None = None,
    ip_datacenter: DataFrame | None = None,
) -> DataFrame:
    """Left-join project and datacenter attributes onto the parsed frame.

    Both joins are explicit broadcasts: the fact side keeps its
    partitioning (no shuffle), each executor hash-probes the ~KB-sized
    dimension. Verified by tests to plan as BroadcastHashJoin.
    """
    spark = parsed.sparkSession
    repo_project = repo_project or default_repo_project(spark)
    ip_datacenter = ip_datacenter or default_ip_datacenter(spark)
    out = parsed.join(F.broadcast(repo_project), on="repo_slug", how="left")
    out = out.withColumn("ip_prefix", ip_prefix_expr(F.col("client_ip")))
    out = out.join(F.broadcast(ip_datacenter), on="ip_prefix", how="left")
    return out.drop("ip_prefix")
