"""Loop-maintained DSIR state: importance weights that update O(batch).

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") scores every raw doc by the log-likelihood
ratio of its hashed n-gram features under a target-domain bag-of-ngrams
model vs the raw-corpus model. The registry query
(`queries_ml.q_dsir_importance_resample`) computes this in one shot —
correct, but at crawl scale the expensive part (explode + hash every
caption's uni+bigrams) would re-run over the WHOLE corpus on every
refresh even though a doc's features never change after fetch.

This module persists the two halves of that computation as sidecar
tables in the vindex SnapshotStore, folded incrementally on each
maintenance tick (round-4 candidate 3 — the same anti-join delta
pattern as `corpus_bands` / the pq_codes sidecar):

  * `dsir_feats`  — (doc_id, f, cnt): per-doc hashed uni+bigram feature
    multiplicities. Tokenize-once: a doc is exploded and hashed exactly
    one time, on the tick that first sees it. Hash-bucketed by doc_id so
    cascade deletes CoW-prune to the victims' buckets.
  * `dsir_counts` — (f, c_r, c_t): the raw and target feature
    distributions, <= B = 4096 rows. Folded by exact integer deltas
    (+new docs' counts, -deleted docs' counts) and rewritten whole each
    tick (one bucket, a few KB) in the SAME atomic commit as the feats
    merge — the two tables can never disagree.

Scoring (`dsir_weights`) is then a <=B-row broadcast of the per-feature
log-ratios onto the persisted feats table plus one doc_id agg: the
corpus text is never re-parsed, and the corpus never shuffles on
anything wider than (doc_id, f, cnt) longs.

Invariants (tests/test_dsir.py): loop-maintained feats + counts are
bit-identical to a from-scratch recompute over the final corpus (the
deltas are exact longs, so the fold is associative); upkeep is
idempotent (unchanged corpus -> zero commits); membership derives from
the corpus by anti-join, so a crash between the main-store commit and
the sidecar commit self-heals on the next tick; a cascade delete
subtracts the victims' exact contribution.

Target membership is deterministic on the 60-bit doc hash
(doc_id % 17 == 3), the same stand-in the registry query uses — a
deployment swaps in a real domain classifier under the same
(doc_id, is_target) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dsir_is_target(doc_id_col) -> F.Column:
    """The ONE definition of target-domain membership for loop DSIR —
    deterministic on the doc hash, same literals as the registry query
    (queries_ml._DSIR_MOD/_DSIR_RES)."""
    from crawler_spark.queries_ml import _DSIR_MOD, _DSIR_RES

    return (doc_id_col % F.lit(_DSIR_MOD)) == F.lit(_DSIR_RES)


def dsir_feat_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> DSIR_FEATS rows: hashed uni+bigram feature
    multiplicities, via the SAME tokenizer + md5-prefix hash the
    registry query locksteps with DuckDB (queries_ml._words/_shingles).
    One explode + one map-side-combinable (doc_id, f) agg; hashes leave
    the explode as longs, never strings."""
    from crawler_spark.queries import md5h
    from crawler_spark.queries_ml import _DSIR_B, _shingles, _words

    return (
        docs.select(
            "doc_id",
            F.explode(
                F.concat(_words(F.col("text")), _shingles(F.col("text"), 2))
            ).alias("s"),
        )
        .select("doc_id", (md5h(F.col("s")) % F.lit(_DSIR_B)).alias("f"))
        .groupBy("doc_id", "f")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_count_rows(feats: DataFrame) -> DataFrame:
    """DSIR_FEATS rows -> the two feature distributions (f, c_r, c_t).
    Collapses to <= B rows; target membership re-derived from doc_id so
    the feats table stays three longs wide."""
    t = dsir_is_target(F.col("doc_id"))
    return feats.groupBy("f").agg(
        F.sum("cnt").alias("c_r"),
        F.sum(F.when(t, F.col("cnt")).otherwise(F.lit(0))).alias("c_t"),
    )


def fold_counts(old: DataFrame, plus: DataFrame, minus: DataFrame) -> DataFrame:
    """old + plus - minus by exact integer sums; rows whose raw count
    reaches zero leave the table (no live doc holds the feature), so the
    fold stays bit-identical to a from-scratch recompute."""

    def tagged(df, sign):
        return df.select(
            "f",
            (F.col("c_r") * sign).alias("d_r"),
            (F.col("c_t") * sign).alias("d_t"),
        )

    folded = (
        tagged(old, F.lit(1))
        .unionByName(tagged(plus, F.lit(1)))
        .unionByName(tagged(minus, F.lit(-1)))
        .groupBy("f")
        .agg(F.sum("d_r").alias("c_r"), F.sum("d_t").alias("c_t"))
    )
    return folded.filter(F.col("c_r") > 0)


def dsir_weights(feats: DataFrame, counts: DataFrame) -> DataFrame:
    """(doc_id, is_target, n_feats, log_w) from the persisted state —
    the same add-one-smoothed log-likelihood-ratio formula and 4dp
    rounding as the oracle-checked registry query, but the text is never
    re-parsed: totals and per-feature ratios collapse from the <=B-row
    counts table and broadcast onto the feats stream; one doc_id agg."""
    from crawler_spark.queries_ml import _DSIR_B

    tot = counts.agg(
        F.sum("c_r").alias("n_r"),
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("n_t"),
    )
    llr = counts.crossJoin(F.broadcast(tot)).select(
        "f",
        (
            F.log((F.col("c_t") + F.lit(1.0)) / (F.col("n_t") + F.lit(_DSIR_B)))
            - F.log((F.col("c_r") + F.lit(1.0)) / (F.col("n_r") + F.lit(_DSIR_B)))
        ).alias("llr"),
    )
    return (
        feats.join(F.broadcast(llr), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.round(F.sum(F.col("cnt") * F.col("llr")) + F.lit(1e-9), 4).alias(
                "log_w"
            ),
        )
        .select(
            "doc_id",
            dsir_is_target(F.col("doc_id")).alias("is_target"),
            "n_feats",
            "log_w",
        )
    )
