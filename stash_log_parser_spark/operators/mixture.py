"""Corpus mixture and sequence packing — the two ops that turn a curated
document table into actual pretraining batches.

* :func:`sample_mixture` — deterministic per-source Bernoulli sampling
  by md5 threshold (domain re-weighting: "20 % of crawl, 100 % of
  books"). Membership depends only on (doc_id, source), so the sample
  is stable across runs, engines, partitionings, and corpus growth —
  the same property the train/test split builds on (textstats
  .train_test_split), and the reason this is a hash threshold and not
  ``df.sample()`` (whose output changes with partitioning and seed
  plumbing). Pure Catalyst, shuffle-free, trivially SQL-mirrored.

* :func:`pack_sequences` — document-boundary packing: each source's
  docs (in doc_id order) are laid out on a tape and cut every
  ``budget`` tokens; a document belongs to the pack where it STARTS
  (packs may overflow by up to one document — the policy long-context
  pipelines call "document-boundary packing with overflow"). One
  window cumsum per source partition: a single hash shuffle on the
  source key, no Python, closed-form → exactly SQL-mirrorable.

* :func:`pack_sequences_greedy` — exact greedy bin-fill (running total
  resets when a doc would cross ``budget``; oversized docs get their
  own pack). The reset recurrence is not expressible as a window
  function, so this is the engine's canonical "custom stateful
  operator as applyInPandas" shape: one Python call per source
  partition, a vectorless numpy loop inside, keys-only shuffle. Output
  is deterministic, so it oracles against a committed golden (and a
  pytest pins it to a pure-python reference).

At 10^12 docs: sampling is embarrassingly parallel; both packings
shuffle once on (source) — at real scale partition the window by
(source, day-shard) so no single source serializes into one task, and
re-number pack_ids by adding a per-shard base offset (pack counts per
shard are exact, so the offsets are one tiny agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SCALE = 16**6  # threshold resolution: first 6 md5 hex chars


def rate_threshold(rate: float) -> str:
    """Map a sampling rate in [0, 1] to the 6-hex-char threshold string
    compared lexicographically against substr(md5(key), 1, 6). Hex
    strings compare like their numeric values (both engines emit
    lowercase hex), so P(key < threshold) = rate to 1/16^6."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    if rate >= 1.0:
        return "zzzzzz"  # lexicographically above every hex string: keep all
    return format(int(rate * _HEX_SCALE), "06x")


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Keep each row iff substr(md5(doc_id:source),1,6) < its source's
    threshold. Unlisted sources use ``default_rate``."""
    key = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.col(source_col))), 1, 6
    )
    thr = F.lit(rate_threshold(default_rate))
    for src in sorted(rates):
        thr = F.when(
            F.col(source_col) == src, F.lit(rate_threshold(rates[src]))
        ).otherwise(thr)
    return docs.filter(key < thr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    len_col: str = "n_tok",
) -> DataFrame:
    """Document-boundary packing (see module docstring). Returns
    (id, source, length, start_offset, pack_id, offset_in_pack)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(len_col).over(w) - F.col(len_col)).cast("long")
    return docs.select(
        id_col,
        source_col,
        F.col(len_col).cast("long").alias("length"),
        start.alias("start_offset"),
        F.floor(start / budget).cast("long").alias("pack_id"),
        (start % budget).cast("long").alias("offset_in_pack"),
    )


def pack_sequences_greedy(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    len_col: str = "n_tok",
) -> DataFrame:
    """Exact greedy bin-fill per source (reset recurrence — the window
    form can't express it; applyInPandas per source partition)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType),
            T.StructField(source_col, T.StringType()),
            T.StructField("length", T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("offset_in_pack", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lengths = pdf["_len"].to_numpy()
        pack_ids = []
        offsets = []
        cur_pack, cur_fill = 0, 0
        for ln in lengths:
            if cur_fill and cur_fill + ln > budget:
                cur_pack += 1
                cur_fill = 0
            pack_ids.append(cur_pack)
            offsets.append(cur_fill)
            cur_fill += int(ln)
            if cur_fill >= budget:  # full (or oversized doc): next doc opens a pack
                cur_pack += 1
                cur_fill = 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                source_col: pdf[source_col],
                "length": pdf["_len"],
                "pack_id": pack_ids,
                "offset_in_pack": offsets,
            }
        )

    narrowed = docs.select(
        id_col, source_col, F.col(len_col).cast("long").alias("_len")
    )
    return narrowed.groupBy(source_col).applyInPandas(pack, schema=out_schema)


def quality_stratified_sample(
    docs: DataFrame,
    score_col: str,
    tiers: list[tuple[float, float]],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware sampling: keep each row with the rate of the FIRST
    tier (descending ``(min_score, rate)`` order) whose min_score the
    row's quality reaches — high-quality docs kept densely, boilerplate
    thinned, the standard quality-curriculum knob composed from the
    same deterministic md5-threshold device as :func:`sample_mixture`
    (stable across runs / engines / partitionings / corpus growth; the
    ':q' salt decorrelates it from any other hash decision on the same
    ids). Pure Catalyst, shuffle-free; the score column is whatever
    upstream quality signal the caller computed (e.g. text_stats
    quality_score, itself round6-quantized so tier boundary compares
    are engine-exact)."""
    key = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit("q"))), 1, 6
    )
    thr = F.lit(rate_threshold(default_rate))
    for min_score, rate in sorted(tiers, key=lambda t: t[0]):
        thr = F.when(
            F.col(score_col) >= min_score, F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return docs.filter(key < thr)
