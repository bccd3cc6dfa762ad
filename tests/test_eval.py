"""ann_recall_report / minhash_calibration invariants (beyond the oracle
lockstep, which tests/test_queries_oracle.py covers for every registry
entry): the recall report must show the dominance relations the index
designs claim, and the calibration columns must be well-formed."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def recall_rows(spark):
    from crawler_spark.queries_eval import q_ann_recall_report

    rows = {r["method"]: r for r in q_ann_recall_report(spark, SF).collect()}
    assert set(rows) == {"lsh", "lsh_multiprobe", "ivf", "ivf_multiprobe"}
    return rows


def test_multiprobe_recall_dominates(recall_rows):
    # a multiprobe candidate set is a superset of the single-probe set,
    # so its top-k can only get closer to ground truth
    assert recall_rows["lsh_multiprobe"]["recall"] >= recall_rows["lsh"]["recall"]
    assert recall_rows["ivf_multiprobe"]["recall"] >= recall_rows["ivf"]["recall"]


def test_multiprobe_pays_bounded_probe_cost(recall_rows, spark):
    # dominance is bought with more candidates — but every strategy must
    # still PRUNE: probe cost stays well under the brute-force N-1 scan.
    # (No tight multiple-of-single-probe bound: the 2nd-nearest cell can
    # legitimately be larger than the query's own cell.)
    assert recall_rows["lsh_multiprobe"]["avg_cand"] >= recall_rows["lsh"]["avg_cand"]
    assert recall_rows["ivf_multiprobe"]["avg_cand"] >= recall_rows["ivf"]["avg_cand"]
    n = spark.read.parquet(SF + "/embeddings.parquet").count()
    for r in recall_rows.values():
        assert r["avg_cand"] <= 0.7 * (n - 1)


def test_recall_is_a_fraction(recall_rows):
    for r in recall_rows.values():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["avg_cand"] >= 0.0


def test_calibration_columns_well_formed(spark):
    from crawler_spark.queries_eval import q_minhash_calibration

    rows = q_minhash_calibration(spark, SF).collect()
    assert rows, "sf0.001 must produce candidate pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        # 8 lanes -> estimator is k/8 (rounded to 4dp with the +1e-9 nudge)
        assert any(
            abs(r["est_jaccard"] - k / 8.0) < 2e-4 for k in range(9)
        ), r["est_jaccard"]
        assert 0.0 <= r["exact_jaccard"] <= 1.0


def test_calibration_estimator_tracks_truth_on_average(spark):
    # E[est] = true Jaccard (Broder). At sf0.001 the candidate pairs are
    # real near-dups, so the MEAN estimator error must be small even
    # though any one 8-lane estimate is coarse (sd ~ 0.17).
    from crawler_spark.queries_eval import q_minhash_calibration

    rows = q_minhash_calibration(spark, SF).collect()
    mean_err = sum(r["est_jaccard"] - r["exact_jaccard"] for r in rows) / len(rows)
    assert abs(mean_err) < 0.2


# ---------------------------------------------------------------------------
# PQ distortion / recall dominance (the residual-IVFPQ design claims)
# ---------------------------------------------------------------------------


def test_residual_pq_distortion_beats_raw(spark):
    # the whole point of quantizing residuals: same 4x8 code budget,
    # strictly lower corpus-average reconstruction error than raw-vector
    # codebooks (residuals concentrate near the origin)
    from crawler_spark.queries_eval import q_pq_distortion_report

    rows = {r["scheme"]: r for r in q_pq_distortion_report(spark, SF).collect()}
    assert set(rows) == {"pq_raw", "pq_residual"}
    assert rows["pq_residual"]["avg_err"] < rows["pq_raw"]["avg_err"]


def test_pq_recall_report_well_formed(spark):
    # cell-scoped rows: recall@5 vs the exact-L2 top-5 within the probed
    # cell(s), candidate set non-empty and a strict subset of the corpus.
    # global rows: ground truth is the exact top-5 over the WHOLE corpus
    # (FAISS convention), so n_cand is exactly the n-1 non-query vectors.
    from crawler_spark.queries_eval import q_pq_recall_report

    rows = {r["scheme"]: r for r in q_pq_recall_report(spark, SF).collect()}
    cell_scoped = {"pq_raw", "pq_residual", "pq_residual_multiprobe"}
    glob = {"pq_residual_global", "pq_residual_mp_global"}
    assert set(rows) == cell_scoped | glob
    n = spark.read.parquet(SF + "/embeddings.parquet").count()
    for r in rows.values():
        assert 0.0 <= r["recall_at_5"] <= 1.0
        assert r["n_hit"] == round(r["recall_at_5"] * 5)
    for s in cell_scoped:
        assert 0 < rows[s]["n_cand"] < n - 1
    for s in glob:
        assert rows[s]["n_cand"] == n - 1
    # probe widening: the multiprobe candidate set strictly contains the
    # single-cell set, and on the FIXED global target the multiprobe's
    # recall can only match or beat the single-cell probe's
    assert (rows["pq_residual_multiprobe"]["n_cand"]
            > rows["pq_residual"]["n_cand"])
    assert (rows["pq_residual_mp_global"]["recall_at_5"]
            >= rows["pq_residual_global"]["recall_at_5"])


def test_dsir_selects_target_looking_docs(spark, tmp_path):
    """DSIR semantics on a constructed corpus: docs written in the target
    domain's vocabulary — whether actually in the target subset
    (doc_id % 17 == 3) or planted raw lookalikes — must outrank every
    background doc, because their hashed-ngram features carry positive
    target-vs-raw log-likelihood ratios. Pins that the weight is a
    property of CONTENT, not of target membership."""
    from crawler_spark.queries_ml import (
        _DSIR_MOD, _DSIR_RES, q_dsir_importance_resample,
    )

    target_ids = {i for i in range(100) if i % _DSIR_MOD == _DSIR_RES}
    planted = {10, 40}                      # raw docs written in target voice
    assert planted.isdisjoint(target_ids)
    voice_a = "quantum flux entropy lattice boson photon spin orbital"
    voice_b = "market ledger invoice tariff escrow broker futures bond"
    rows = [
        (i, voice_a if (i in target_ids or i in planted) else voice_b)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = q_dsir_importance_resample(spark, str(tmp_path)).collect()
    assert len(got) == 100                   # K=200 > corpus: total order
    want_top = target_ids | planted
    top = got[: len(want_top)]
    assert {r["doc_id"] for r in top} == want_top
    assert all(r["is_target"] == (r["doc_id"] in target_ids) for r in got)
    # strict score separation between the two voices
    assert min(r["log_w"] for r in top) > max(
        r["log_w"] for r in got[len(want_top):]
    )
