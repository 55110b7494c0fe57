"""J3/J4 broadcast-enrichment goldens (FIXTURES.md §4 'Enrichment')."""

from pyspark.sql import functions as F

from stash_log_parser_spark.operators.enrich import enrich


def test_enrichment_goldens(parsed):
    e = enrich(parsed)
    rows = {r.doc_id: r for r in e.collect()}
    assert rows["L05"].project_key == "CONF" and rows["L05"].datacenter == "dc-syd"
    assert rows["L08"].project_key == "TEAMS" and rows["L08"].datacenter == "external"
    assert rows["L14"].datacenter == "dc-lab"
    assert rows["L13"].project_key is None  # malformed row enriches to nulls


def test_enrichment_preserves_rowcount_and_keys(parsed, fixture_corpus):
    e = enrich(parsed)
    assert e.count() == 14  # left joins never drop or duplicate
    joined = e.join(fixture_corpus, "doc_id")
    assert joined.count() == 14


def test_enrichment_plans_as_broadcast_join(parsed):
    plan = enrich(parsed)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
