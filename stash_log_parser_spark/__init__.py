"""stash_log_parser_spark — a PySpark-native log-analytics engine.

A brand-new parse → enrich → route → aggregate pipeline with the query
capabilities of the Haskell CLI ``juretta/stash-log-parser`` (Atlassian
Stash / Bitbucket Server access-log analytics), re-expressed Spark-first:

* input: tables of pre-tokenized sequences
  ``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``
  where ``tokens`` are the UTF-8 bytes of one access-log line;
* decode: ONE vectorized pandas/Arrow UDF (never per-row Python);
* grok: native Catalyst expressions (split / regexp_extract / try_cast);
* analyses: Spark SQL group-bys and window aggregates
  (maxConn, gitOperations, protocolStats, repositoryStats,
  requestDurations percentiles);
* enrich: broadcast lookup joins (repo→project, IP→datacenter);
* route: fan-out to per-analysis sinks with per-partition lineage +
  idempotent checkpoint resume;
* plus large-scale training-data operators over document/embedding
  tables: dedup (exact / MinHash-LSH / SimHash / Jaccard), ANN search,
  text quality/language stats.

Reference semantics: juretta/stash-log-parser (see SURVEY.md; the
reference is a single-process Haskell CLI — this is NOT a port, the
architecture is DataFrame/Catalyst-native).
"""

__version__ = "0.1.0"
