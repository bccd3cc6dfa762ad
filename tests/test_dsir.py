"""Loop-maintained DSIR sidecar (operators/dsir.py): the persisted-state
scoring path ties out against the oracle-checked registry query, the
incremental fold is bit-identical to a from-scratch recompute, upkeep is
idempotent / self-healing / delete-exact, and the CoW merge rewrites
only dirty feat buckets."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from crawler_spark.operators import dsir
from crawler_spark.operators.vindex import corpus_minhash_docs
from crawler_spark.tables import SnapshotStore
from tests.conftest import SF_SMALL

LOOP_PARAMS = dict(universe=600, n_seeds=12, k_per_host=4, tick_secs=6 * 3600,
                   lineage_hashes=False)


def _state(st: SnapshotStore) -> dict:
    return {
        t: sorted(tuple(r) for r in st.read(t).collect())
        for t in ("dsir_feats", "dsir_counts")
    }


def _recompute_state(spark, sched):
    """From-scratch DSIR state over the scheduler's FINAL corpus — the
    ground truth the incremental fold must match bit-for-bit."""
    docs = corpus_minhash_docs(
        sched.store.read("corpus").select("image_id", "caption")
    )
    feats = dsir.dsir_feat_rows(docs).persist()
    got = {
        "dsir_feats": sorted(tuple(r) for r in feats.collect()),
        "dsir_counts": sorted(
            tuple(r) for r in dsir.dsir_count_rows(feats).collect()
        ),
    }
    feats.unpersist()
    return got


def test_persisted_state_scoring_matches_registry_query(spark):
    """dsir_weights over (feats, counts) state built from the sf0.001
    documents must reproduce the oracle-checked registry query's top-K
    exactly — the persisted-state path and the one-shot path are the
    same computation."""
    from crawler_spark.queries_ml import _DSIR_K

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    feats = dsir.dsir_feat_rows(docs).persist()
    got = (
        dsir.dsir_weights(feats, dsir.dsir_count_rows(feats))
        .orderBy(F.col("log_w").desc(), F.col("doc_id").asc())
        .limit(_DSIR_K)
        .collect()
    )
    feats.unpersist()
    want = E.queries()["dsir_importance_resample"](spark, SF_SMALL).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_loop_maintained_dsir_equals_recompute(spark, tmp_path_factory):
    """After N batches with maintenance on, the folded sidecar tables
    must be bit-identical to a from-scratch recompute over the final
    corpus, and the weights view must agree with weights computed from
    the recomputed state."""
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = str(tmp_path_factory.mktemp("crawl_dsir"))
    s = CrawlScheduler(spark, root, maintenance_every=2, maintain_dsir=True,
                       **LOOP_PARAMS)
    s.run(4)
    assert s.store.read("corpus").count() > 0
    got = _state(s.vindex.store)
    want = _recompute_state(spark, s)
    assert got["dsir_counts"] == want["dsir_counts"]
    assert got["dsir_feats"] == want["dsir_feats"]
    # the O(batch)-maintained weights == weights from recomputed state
    docs = corpus_minhash_docs(
        s.store.read("corpus").select("image_id", "caption")
    )
    feats = dsir.dsir_feat_rows(docs).persist()
    direct = dsir.dsir_weights(feats, dsir.dsir_count_rows(feats))
    a = sorted(tuple(r) for r in s.dsir_weights().collect())
    b = sorted(tuple(r) for r in direct.collect())
    feats.unpersist()
    assert a == b and a


def test_dsir_upkeep_idempotent_on_unchanged_corpus(spark, tmp_path_factory):
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = str(tmp_path_factory.mktemp("crawl_dsir_idem"))
    s = CrawlScheduler(spark, root, maintenance_every=2, maintain_dsir=True,
                       **LOOP_PARAMS)
    s.run(2)
    sid = s.vindex.store.snapshot_id
    stats = s._dsir_upkeep(
        s.store.read("corpus").select("image_id", "phash", "caption")
    )
    assert stats == {"dsir_new": 0, "dsir_removed": 0}
    assert s.vindex.store.snapshot_id == sid


def test_dsir_self_heals_after_late_enable(spark, tmp_path_factory):
    """Batches run with the sidecar disabled (the crash window between
    the main commit and the sidecar commit, writ large) must converge to
    the uninterrupted state on the first enabled tick."""
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = str(tmp_path_factory.mktemp("crawl_dsir_resume"))
    s1 = CrawlScheduler(spark, root, maintenance_every=2, **LOOP_PARAMS)
    s1.run(3)
    s2 = CrawlScheduler(spark, root, maintenance_every=2, maintain_dsir=True,
                        **LOOP_PARAMS)
    s2.run(1)  # batch 4 -> maintenance tick bootstraps the sidecar
    assert _state(s2.vindex.store) == _recompute_state(spark, s2)


def test_dsir_cascade_delete_subtracts_exact_contribution(
    spark, tmp_path_factory
):
    """A blacklist cascade must purge the victims' feat rows AND
    subtract exactly their counts — folded state == recompute after the
    delete."""
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = str(tmp_path_factory.mktemp("crawl_dsir_del"))
    s = CrawlScheduler(spark, root, maintenance_every=2, maintain_dsir=True,
                       **LOOP_PARAMS)
    s.run(2)
    corpus = s.store.read("corpus")
    victim = corpus.select("image_id").orderBy("image_id").limit(1).collect()[0][0]
    doomed = corpus.filter(F.col("image_id") == victim).select(
        F.conv(F.substring(F.md5("image_id"), 1, 15), 16, 10)
        .cast("long").alias("h")
    ).collect()[0]["h"]
    s.apply_blacklist([int(doomed)])
    stats = s.vindex_upkeep()
    assert stats["dsir_removed"] >= 1
    assert (
        s.vindex.store.read("dsir_feats")
        .filter(F.col("doc_id") == F.lit(int(doomed)))
        .count()
        == 0
    )
    assert _state(s.vindex.store) == _recompute_state(spark, s)


def test_dsir_fold_rewrites_only_dirty_feat_buckets(spark, tmp_path_factory):
    """The incremental tick's feats merge is CoW: buckets untouched by
    the batch's new doc_ids carry forward by reference."""
    from crawler_spark.streaming.scheduler import CrawlScheduler

    root = str(tmp_path_factory.mktemp("crawl_dsir_cow"))
    s = CrawlScheduler(spark, root, maintenance_every=2, maintain_dsir=True,
                       **LOOP_PARAMS)
    s.run(2)  # tick 1: bootstrap
    st = s.vindex.store
    before = dict(st.current_manifest()["tables"]["dsir_feats"]["buckets"])
    # fold in exactly ONE new doc: its bucket is dirty, the other 15
    # must carry forward by reference
    corpus = s.store.read("corpus").select("image_id", "phash", "caption")
    extra = spark.createDataFrame(
        [("img-cow-probe", 12345, "a brand new caption for the cow test")],
        "image_id string, phash long, caption string",
    )
    stats = s._dsir_upkeep(corpus.unionByName(extra))
    assert stats == {"dsir_new": 1, "dsir_removed": 0}
    after = dict(st.current_manifest()["tables"]["dsir_feats"]["buckets"])
    # labels only ever grow (the new doc may populate an empty bucket)
    assert set(before) <= set(after)
    carried = [lbl for lbl in before if before[lbl] == after[lbl]]
    touched = [lbl for lbl in after if after.get(lbl) != before.get(lbl)]
    assert len(touched) == 1, f"one new doc dirtied {len(touched)} buckets"
    assert len(carried) >= len(before) - 1
    assert carried, "every bucket rewritten — merge is not CoW"
