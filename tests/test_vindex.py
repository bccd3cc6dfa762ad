"""Persisted similarity indexes: partition-pruned probes, incremental
(CoW) maintenance equivalence, and clean-partition carry-forward."""

import os

from pyspark.sql import functions as F

import __spark_entry__ as E
from crawler_spark.operators.vindex import (
    SimilarityIndex,
    doc_minhash_rows,
    emb_lsh_rows,
    index_for,
)
from tests.conftest import SF_SMALL

QUERIES = E.queries()


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")


def test_lsh_probe_scans_only_query_bucket(spark):
    """The point of the index: the ANN probe's scan must touch ONLY the
    files of the query's bucket partition — never the whole table."""
    ix = index_for(spark, SF_SMALL)
    qb = int(
        emb_lsh_rows(_emb(spark).filter(F.col("vec_id") == 0)).collect()[0]["bucket"]
    )
    probe = ix.lsh_partition(qb)
    files = probe.inputFiles()
    assert files, "probe reads no files"
    assert all(f"__bucket={qb}/" in f for f in files)
    # and the full index genuinely has more partitions than the probe read
    all_files = ix.store.read("emb_lsh").inputFiles()
    assert len(all_files) > len(files)


def test_indexed_queries_match_recompute(spark):
    """Probe-over-index == recompute-over-raw for all three index-backed
    queries (their DuckDB oracles are the recompute SQL; here we compare
    Spark-vs-Spark so the equality is engine-internal too)."""
    for indexed, recompute in [
        ("knn_ann_indexed_topk", "knn_ann_lsh_topk"),
        ("knn_ivf_indexed_topk", "knn_ivf_topk"),
        ("dedup_minhash_indexed", "dedup_minhash_lsh"),
    ]:
        a = {tuple(r) for r in QUERIES[indexed](spark, SF_SMALL).collect()}
        b = {tuple(r) for r in QUERIES[recompute](spark, SF_SMALL).collect()}
        assert a == b, f"{indexed} != {recompute}"


def test_incremental_upsert_equals_full_build(spark, tmp_path_factory):
    """Index built incrementally (half, then the rest) must equal a
    from-scratch build — the seen_sketch-style maintenance contract."""
    emb, docs = _emb(spark), _docs(spark)
    full = SimilarityIndex(spark, str(tmp_path_factory.mktemp("vx_full")))
    full.build(emb=emb, docs=docs)
    inc = SimilarityIndex(spark, str(tmp_path_factory.mktemp("vx_inc")))
    inc.build(emb=emb.filter(F.col("vec_id") % 2 == 0),
              docs=docs.filter(F.col("doc_id") % 2 == 0))
    inc.upsert(emb=emb.filter(F.col("vec_id") % 2 == 1),
               docs=docs.filter(F.col("doc_id") % 2 == 1))

    def rows(ix, table, key):
        return sorted(
            (tuple(r) for r in ix.store.read(table).collect()),
            key=lambda t: t[:1],
        )

    for table in ("emb_lsh", "emb_ivf", "doc_minhash"):
        assert rows(full, table, 0) == rows(inc, table, 0), table


def test_upsert_rewrites_only_dirty_partitions(spark, tmp_path_factory):
    """CoW: re-upserting vectors that land in a subset of buckets must
    carry every clean bucket's files forward BY REFERENCE (same dirs in
    the manifest), rewriting only the dirty ones."""
    emb = _emb(spark)
    ix = SimilarityIndex(spark, str(tmp_path_factory.mktemp("vx_cow")))
    ix.build(emb=emb)
    before = dict(ix.store.current_manifest()["tables"]["emb_lsh"]["buckets"])
    one = emb.limit(1)
    dirty = {r["bucket"] for r in emb_lsh_rows(one).select("bucket").collect()}
    ix.upsert(emb=one)
    after = dict(ix.store.current_manifest()["tables"]["emb_lsh"]["buckets"])
    assert set(before) == set(after)
    for label, path in before.items():
        if int(label) in dirty:
            assert after[label] != path, "dirty bucket not rewritten"
        else:
            assert after[label] == path, "clean bucket was rewritten"


def test_minhash_sig_table_shape(spark, tmp_path_factory):
    sigs = doc_minhash_rows(_docs(spark).limit(10)).collect()
    assert all(len(r["sig"]) == 8 for r in sigs)
    assert all(all(isinstance(v, int) and v >= 0 for v in r["sig"]) for r in sigs)


def test_index_root_is_reused_within_process(spark):
    a = index_for(spark, SF_SMALL)
    b = index_for(spark, SF_SMALL)
    assert a is b
    assert os.path.isdir(a.store.root)


def test_multiprobe_scans_only_probe_buckets(spark):
    """Multiprobe reads the query bucket + its one-flip neighbors and
    NOTHING else: every input file belongs to one of the probed
    partitions, and buckets outside the probe set stay untouched."""
    from crawler_spark.operators.vindex import index_for
    from crawler_spark.queries_index import _query_vec
    from crawler_spark.queries_ml import _ANN_BITS

    sf_dir = "/root/testdata/sf0.001"
    _, qb = _query_vec(spark, sf_dir, with_cell=False)
    probes = {qb} | {qb ^ (1 << i) for i in range(_ANN_BITS)}
    ix = index_for(spark, sf_dir)
    files = ix.lsh_partitions(probes).inputFiles()
    assert files, "multiprobe reads no files"
    assert all(any(f"__bucket={b}/" in f for b in probes) for f in files)
    all_files = ix.store.read("emb_lsh").inputFiles()
    assert len(all_files) > len(files), "probe did not prune the index scan"


def test_batch_indexed_matches_recompute(spark):
    """The batched index probe must reproduce the recompute-form batch
    query row-for-row, while reading only the batch's bucket partitions."""
    from crawler_spark.queries_index import q_knn_batch_indexed_topk
    from crawler_spark.queries_media import q_knn_batch_topk

    a = {tuple(r) for r in q_knn_batch_indexed_topk(spark, SF_SMALL).collect()}
    b = {tuple(r) for r in q_knn_batch_topk(spark, SF_SMALL).collect()}
    assert a == b and a


def test_batch_probe_scans_only_batch_buckets(spark):
    """The batched probe's scan must touch only the partitions of the
    batch's distinct query buckets (file-level pruning, like the
    single-probe and multiprobe forms)."""
    from crawler_spark.queries_media import _BATCH_Q_MOD

    ix = index_for(spark, SF_SMALL)
    qb = {
        int(r["bucket"])
        for r in emb_lsh_rows(
            _emb(spark).filter(F.col("vec_id") % _BATCH_Q_MOD == 0)
        ).select("bucket").collect()
    }
    probe = ix.lsh_partitions(qb)
    files = probe.inputFiles()
    assert files
    assert all(any(f"__bucket={b}/" in f for b in qb) for f in files)
