"""Quality-evaluation queries for the similarity / dedup stack.

The round-3/4 index work added four ANN probe strategies (sign-LSH,
LSH multiprobe, IVF single-cell, IVF multiprobe) and a minhash candidate
generator — all oracle-checked for *plan equivalence*, but none of them
measured for *retrieval quality*. These queries close the "measure,
don't guess" gap:

  * ann_recall_report      — recall@k and probe cost of every ANN
    strategy against exact brute-force ground truth, over a BATCH of
    query vectors (Lv et al. multiprobe-LSH evaluation protocol).
  * minhash_calibration    — estimated Jaccard (signature lane
    agreement, Broder's estimator) vs exact shingle Jaccard for every
    LSH candidate pair.

Scale shape (100 TB): recall eval always runs over a bounded SAMPLE of
queries — the ground-truth scorer is then one broadcast-join scan of the
corpus (sample x corpus), which is exactly how production recall QA jobs
run; the per-method candidate sets reuse the same scored frame by
filter, so the corpus is scanned ONCE for all five strategies. The
calibration query touches full shingle sets only for docs that appear
in a candidate pair (semi-join prune before the shingle explode)."""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.queries import _t, register, track_persist
from crawler_spark.queries_media import (
    _BATCH_Q_MOD,
    _CENTROIDS,
    _IVF_CELLS,
    _bucket_col,
    _bucket_terms_sql,
    _cell_dots_sql,
)
from crawler_spark.queries_ml import (
    _ANN_BITS,
    _H1_SQL,
    _H2_SQL,
    _LSH_BUCKET_CAP,
    _bands_sql,
    _shingles,
    _shingles_sql,
    _sig_lanes_sql,
    bands_from_sig_table,
    lsh_band_pairs,
    md5h,
    minhash_lane_hashes,
    minhash_sig_from_hashes,
)

# ---------------------------------------------------------------------------
# ANN recall report: recall@k + probe cost per strategy vs brute force
# ---------------------------------------------------------------------------

_RECALL_K = 5
_RECALL_NPROBE = 2  # same nprobe as knn_ivf_multiprobe_topk


def _dsum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


_RECALL_SQL = """
    WITH b AS (
      SELECT vec_id, embedding, {terms} AS bucket, [{dots}] AS d FROM embeddings
    ),
    c AS (
      SELECT vec_id, embedding, bucket, d,
             array_position(d, list_max(d)) AS cell
      FROM b
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS qv, bucket AS qb, cell AS qc, d AS qd
      FROM c WHERE vec_id % {m} = 0
    ),
    pc AS (
      SELECT q_id, i AS pcell FROM (
        SELECT q.q_id, t.i,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY q.qd[t.i] DESC, t.i ASC) AS rn
        FROM q, LATERAL unnest(range(1, {cellsp1})) AS t(i)
      ) WHERE rn <= {nprobe}
    ),
    pairs AS (
      SELECT q.q_id, c.vec_id, c.bucket, c.cell, q.qb, q.qc,
             round(1e-9 +
               list_sum(list_transform(list_zip(c.embedding, q.qv),
                                       p -> p[1]::DOUBLE * p[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
             4) AS cosine
      FROM c, q WHERE c.vec_id != q.q_id
    ),
    gt AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rk
        FROM pairs
      ) WHERE rk <= {k}
    ),
    cand AS (
      SELECT 'lsh' AS method, q_id, vec_id, cosine FROM pairs WHERE bucket = qb
      UNION ALL
      SELECT 'lsh_multiprobe' AS method, q_id, vec_id, cosine FROM pairs
      WHERE bucket = qb{flips}
      UNION ALL
      SELECT 'ivf' AS method, q_id, vec_id, cosine FROM pairs WHERE cell = qc
      UNION ALL
      SELECT 'ivf_multiprobe' AS method, p.q_id, p.vec_id, p.cosine
      FROM pairs p JOIN pc ON pc.q_id = p.q_id AND pc.pcell = p.cell
    ),
    top AS (
      SELECT method, q_id, vec_id FROM (
        SELECT method, q_id, vec_id,
               row_number() OVER (PARTITION BY method, q_id
                                  ORDER BY cosine DESC, vec_id ASC) AS rk
        FROM cand
      ) WHERE rk <= {k}
    ),
    nq AS (SELECT count(*) AS n FROM q),
    hits AS (
      SELECT method, count(*) AS n_hit
      FROM top JOIN gt USING (q_id, vec_id) GROUP BY method
    ),
    nc AS (SELECT method, count(*) AS n_cand FROM cand GROUP BY method)
    SELECT nc.method AS method,
           round(1e-9 + coalesce(n_hit, 0)::DOUBLE / ({k} * nq.n), 4) AS recall,
           round(1e-9 + n_cand::DOUBLE / nq.n, 4) AS avg_cand
    FROM nc LEFT JOIN hits ON hits.method = nc.method, nq
""".format(
    terms=_bucket_terms_sql,
    dots=_cell_dots_sql,
    m=_BATCH_Q_MOD,
    cellsp1=_IVF_CELLS + 1,
    nprobe=_RECALL_NPROBE,
    k=_RECALL_K,
    flips="".join(
        f" OR bucket = xor(qb, {1 << i}::BIGINT)" for i in range(_ANN_BITS)
    ),
)


@register("ann_recall_report", _RECALL_SQL)
def q_ann_recall_report(spark, sf_dir):
    """Recall@k + probe cost of the four ANN strategies vs brute force.

    Every _BATCH_Q_MOD-th vector is a query. Ground truth is the exact
    cosine top-k from a broadcast-join scan (the scored frame is
    persisted once and shared); each strategy's candidate set is a
    FILTER of that frame — bucket equality (sign-LSH), the bucket plus
    its one-bit flips (multiprobe LSH, Lv et al.), the argmax IVF cell,
    and the query's nprobe nearest cells. recall = |top_k ∩ gt_k| /
    (k * n_queries); avg_cand = candidates scored per query (the probe-
    cost axis: multiprobe must buy its recall with bounded extra I/O).
    At 100 TB this is the offline QA job for the persisted indexes in
    operators/vindex.py — sampled queries, one corpus scan, never an
    all-pairs materialization."""
    emb = _t(spark, sf_dir, "embeddings")
    dots = F.array(*[
        _dsum(F.zip_with(
            "embedding",
            F.array(*[F.lit(v) for v in cent]),
            lambda a, b: a.cast("double") * b,
        ))
        for cent in _CENTROIDS
    ])
    c = emb.select(
        "vec_id", "embedding",
        _bucket_col().alias("bucket"),
        dots.alias("d"),
    ).withColumn("cell", F.array_position(F.col("d"), F.array_max("d")))

    q = c.filter(F.col("vec_id") % _BATCH_Q_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
        F.col("cell").alias("qc"),
        F.col("d").alias("qd"),
    )
    # the query's nprobe nearest cells: sort 8 (−dot, cell) structs inside
    # the row (struct sort = dot desc, cell-id tiebreak — the oracle's
    # ORDER BY qd[i] DESC, i ASC), take the first nprobe cell ids
    cells_by_dot = F.array_sort(F.array(*[
        F.struct(
            (-F.element_at(F.col("qd"), i + 1)).alias("nd"),
            F.lit(i + 1).cast("long").alias("cell"),
        )
        for i in range(_IVF_CELLS)
    ]))
    q = q.withColumn(
        "qcells",
        F.slice(F.transform(cells_by_dot, lambda s: s["cell"]), 1, _RECALL_NPROBE),
    ).drop("qd")

    dot = _dsum(F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")))
    ne = F.sqrt(_dsum(F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))))
    nq_ = F.sqrt(_dsum(F.transform("qv", lambda x: x.cast("double") * x.cast("double"))))
    # ONE corpus scan scores every (query, vector) pair; ground truth and
    # all four candidate sets are filters/ranks over this persisted frame
    pairs = track_persist(
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", "bucket", "cell", "qb", "qc", "qcells",
            F.round(dot / (ne * nq_) + F.lit(1e-9), 4).alias("cosine"),
        )
    )

    by_q = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    gt = (
        pairs.withColumn("rk", F.row_number().over(by_q))
        .filter(F.col("rk") <= F.lit(_RECALL_K))
        .select("q_id", "vec_id")
    )

    mp_pred = reduce(
        or_,
        [F.col("bucket") == F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(_ANN_BITS)],
        F.col("bucket") == F.col("qb"),
    )
    methods = {
        "lsh": F.col("bucket") == F.col("qb"),
        "lsh_multiprobe": mp_pred,
        "ivf": F.col("cell") == F.col("qc"),
        "ivf_multiprobe": F.array_contains(F.col("qcells"), F.col("cell")),
    }
    cand = None
    for name, pred in methods.items():
        one = pairs.filter(pred).select(
            F.lit(name).alias("method"), "q_id", "vec_id", "cosine"
        )
        cand = one if cand is None else cand.unionByName(one)

    by_mq = Window.partitionBy("method", "q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    top = (
        cand.withColumn("rk", F.row_number().over(by_mq))
        .filter(F.col("rk") <= F.lit(_RECALL_K))
        .select("method", "q_id", "vec_id")
    )
    hits = top.join(gt, ["q_id", "vec_id"]).groupBy("method").agg(
        F.count("*").alias("n_hit")
    )
    ncand = cand.groupBy("method").agg(F.count("*").alias("n_cand"))
    nq_df = q.agg(F.count("*").alias("nq"))
    return (
        ncand.join(hits, "method", "left")
        .crossJoin(F.broadcast(nq_df))
        .select(
            "method",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / (F.lit(_RECALL_K) * F.col("nq"))
                + F.lit(1e-9), 4,
            ).alias("recall"),
            F.round(F.col("n_cand") / F.col("nq") + F.lit(1e-9), 4).alias("avg_cand"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash calibration: estimated vs exact Jaccard on every candidate pair
# ---------------------------------------------------------------------------

_lane_eq_sql = " + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(8))

_CALIBRATION_SQL = """
    WITH sh0 AS (
      SELECT doc_id, unnest({shingles}) AS shingle FROM documents
    ),
    sh AS (SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM sh0),
    sig AS (SELECT doc_id, {lanes} FROM sh GROUP BY doc_id),
    bands AS ({bands}),
    posts AS (
      SELECT band, k1, k2, list_sort(list(DISTINCT doc_id)) AS docs
      FROM bands GROUP BY band, k1, k2
    ),
    rawpairs AS (
      SELECT a.x AS doc_a, b.y AS doc_b
      FROM posts, UNNEST(docs) AS a(x), UNNEST(docs) AS b(y)
      WHERE len(docs) BETWEEN 2 AND {cap} AND a.x < b.y
      UNION ALL
      SELECT docs[1] AS doc_a, u.y AS doc_b
      FROM posts, UNNEST(docs[2:]) AS u(y)
      WHERE len(docs) > {cap}
    ),
    cp AS (SELECT DISTINCT doc_a, doc_b FROM rawpairs),
    sdist AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h
      FROM sh0
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sdist GROUP BY doc_id),
    common AS (
      SELECT cp.doc_a, cp.doc_b, count(*) AS c
      FROM cp
      JOIN sdist a ON a.doc_id = cp.doc_a
      JOIN sdist b ON b.doc_id = cp.doc_b AND b.sh_h = a.sh_h
      GROUP BY 1, 2
    )
    SELECT cp.doc_a, cp.doc_b,
           round(1e-9 + ({laneeq}) / 8.0, 4) AS est_jaccard,
           round(1e-9 + coalesce(c, 0)::DOUBLE
                 / (za.n + zb.n - coalesce(c, 0)), 4) AS exact_jaccard
    FROM cp
    JOIN sig sa ON sa.doc_id = cp.doc_a
    JOIN sig sb ON sb.doc_id = cp.doc_b
    JOIN sizes za ON za.doc_id = cp.doc_a
    JOIN sizes zb ON zb.doc_id = cp.doc_b
    LEFT JOIN common ON common.doc_a = cp.doc_a AND common.doc_b = cp.doc_b
""".format(
    shingles=_shingles_sql("text"),
    h1=_H1_SQL,
    h2=_H2_SQL,
    lanes=_sig_lanes_sql,
    bands=_bands_sql,
    cap=_LSH_BUCKET_CAP,
    laneeq=_lane_eq_sql,
)


@register("minhash_calibration", _CALIBRATION_SQL)
def q_minhash_calibration(spark, sf_dir):
    """Broder's Jaccard estimator vs ground truth, per candidate pair.

    For every dedup_minhash_lsh candidate pair: est_jaccard = fraction
    of the 8 signature lanes that agree (E[est] = true Jaccard);
    exact_jaccard = |A∩B|/|A∪B| over the full distinct shingle sets.
    Star-edge pairs from over-cap buckets legitimately show low exact
    Jaccard — that's the report's point: it quantifies what the banding
    parameters (4x2) trade for their candidate bound.

    Scale shape: candidate pairs are LSH-bounded; exact Jaccard is
    computed ONLY for docs appearing in a pair (semi-join prune BEFORE
    the shingle explode), so the expensive set intersection never runs
    corpus-wide — it's pairs x shingle-set size, the same bound a human
    reviewer of a dedup run pays."""
    from crawler_spark.queries_ml import _docs

    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", minhash_lane_hashes(F.col("text")).alias("hs"))
    sig = d.select("doc_id", minhash_sig_from_hashes(F.col("hs")).alias("sig"))
    pairs = track_persist(
        lsh_band_pairs(bands_from_sig_table(sig), _LSH_BUCKET_CAP)
    )

    # estimator: lane-agreement fraction of the two persisted signatures
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    lane_matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = pairs.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b",
        F.round(lane_matches / F.lit(8.0) + F.lit(1e-9), 4).alias("est_jaccard"),
    )

    # exact Jaccard over full distinct shingle sets — but only for docs
    # that actually appear in a candidate pair (semi-join prune before
    # the shingle explode touches text)
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    s = (
        docs.join(members, "doc_id", "semi")
        .select(
            "doc_id",
            F.explode(F.transform(_shingles(F.col("text")), md5h)).alias("sh_h"),
        )
        .dropDuplicates(["doc_id", "sh_h"])
    )
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa_sh = s.select(F.col("doc_id").alias("doc_a"), "sh_h")
    sb_sh = s.select(F.col("doc_id").alias("db"), F.col("sh_h").alias("sh_hb"))
    common = (
        pairs.join(sa_sh, "doc_a")
        .join(sb_sh, (F.col("doc_b") == F.col("db")) & (F.col("sh_h") == F.col("sh_hb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    c0 = F.coalesce(F.col("c"), F.lit(0))
    return (
        est.join(common, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a", "doc_b", "est_jaccard",
            F.round(c0 / (F.col("na") + F.col("nb") - c0) + F.lit(1e-9), 4)
            .alias("exact_jaccard"),
        )
    )

# ---------------------------------------------------------------------------
# IVF partition-balance report
# ---------------------------------------------------------------------------
# ann_recall_report measures RECALL; this measures the other failure
# axis of an IVF layout: partition skew. A hot cell is the ANN analogue
# of a hot shuffle key — probe cost and index-maintenance I/O both scale
# with the loaded cell, not the average one, so the load_ratio column is
# the number an operator alerts on before re-training the quantizer.
# Same Lloyd's chain and 6dp/9dp rounding lockstep as ivf_train_kmeans;
# the report itself is one groupBy over the final assignment (distances
# come from the SAME frame the argmin rank already computed).

from crawler_spark.queries_media import _KM_DIM, _KM_ITERS, _KM_K, _km_iter_sql

_BAL_SQL = """
    WITH e AS (
      SELECT vec_id, i AS dim, embedding[i]::DOUBLE AS val
      FROM embeddings, LATERAL unnest(range(1, {dimp1})) AS t(i)
    ),
    c0 AS (
      SELECT vec_id AS cell, dim, round(1e-9 + val, 6) AS v
      FROM e WHERE vec_id BETWEEN 1 AND {k}
    ),
    {iters},
    df AS (
      SELECT e.vec_id, c.cell,
             round(1e-12 + sum((e.val - c.v) * (e.val - c.v)), 9) AS d
      FROM e JOIN c{last} c USING (dim) GROUP BY e.vec_id, c.cell
    ),
    af AS (
      SELECT vec_id, cell, d FROM (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cell ASC) AS rk
        FROM df
      ) WHERE rk = 1
    ),
    per AS (
      SELECT cell, count(*) AS n_members,
             round(1e-9 + avg(d), 6) AS avg_d,
             round(1e-9 + max(d), 6) AS max_d
      FROM af GROUP BY cell
    )
    SELECT cell, n_members, avg_d, max_d,
           round(1e-9 + n_members / (avg(n_members) OVER ()), 4) AS load_ratio
    FROM per
""".format(
    dimp1=_KM_DIM + 1, k=_KM_K, last=_KM_ITERS,
    iters=",".join(_km_iter_sql(i) for i in range(1, _KM_ITERS + 1)).lstrip(",\n "),
)


@register("ivf_balance_report", _BAL_SQL)
def q_ivf_balance_report(spark, sf_dir):
    """Per trained-IVF-cell load report: member count, mean/max squared
    distance to the centroid, and load relative to the mean cell — the
    skew gauge for the index partition layout. Lloyd's chain identical
    to ivf_train_kmeans; distances reuse the argmin frame."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "val0")
    ).select(
        "vec_id", (F.col("dim0") + 1).alias("dim"),
        F.col("val0").cast("double").alias("val"),
    )
    c = e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _KM_K)).select(
        F.col("vec_id").alias("cell"), "dim",
        F.round(F.col("val") + F.lit(1e-9), 6).alias("v"),
    )

    def assign(cents):
        d = (
            e.join(cents, "dim")
            .groupBy("vec_id", "cell")
            .agg(F.round(
                F.sum((F.col("val") - F.col("v")) * (F.col("val") - F.col("v")))
                + F.lit(1e-12), 9).alias("d"))
        )
        rk = F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cell").asc())
        )
        return d.withColumn("rk", rk).filter(F.col("rk") == 1)

    for _ in range(_KM_ITERS):
        a = assign(c).select("vec_id", "cell")
        n = (
            e.join(a, "vec_id")
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("val") + F.lit(1e-9), 6).alias("v2"))
        )
        c = c.join(n, ["cell", "dim"], "left").select(
            "cell", "dim", F.coalesce("v2", "v").alias("v")
        )
    af = assign(c)
    per = af.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("d") + F.lit(1e-9), 6).alias("avg_d"),
        F.round(F.max("d") + F.lit(1e-9), 6).alias("max_d"),
    )
    ratio = F.round(
        F.col("n_members") / F.avg("n_members").over(Window.partitionBy())
        + F.lit(1e-9),
        4,
    )
    return per.select(
        "cell", "n_members", "avg_d", "max_d", ratio.alias("load_ratio")
    )


# ---------------------------------------------------------------------------
# PQ distortion report: raw-vector vs residual codebooks
# ---------------------------------------------------------------------------
# The quantitative case for residual IVFPQ (Jégou et al.): with the SAME
# code budget (4 subspaces x 8 codewords), quantizing r = x - c_cell(x)
# instead of x itself should yield strictly lower reconstruction error,
# because residuals concentrate near the origin and the codebook spends
# its codewords on within-cell structure. This report measures exactly
# that: per-vector squared reconstruction error = the sum of the four
# subspace argmin distances (the assignment distance IS the subspace
# error — reconstruction is the chosen codeword), averaged and maxed
# over the corpus, one row per scheme.
#
# Scale shape: two trained-codebook assignments (each one join + agg on
# the exploded work table, identical to what the trainers already run)
# and a per-vector sum — no new shuffle structure beyond the training
# queries themselves. Rounding: per-sub d at 9dp (training lockstep),
# per-vector total at 6dp, corpus avg at 4dp; max is over 6dp-rounded
# totals so it is order-independent.

from crawler_spark.queries_media import (
    _PQ_TRAIN_CTES,
    _PQR_TRAIN_CTES,
    _PQT_ITERS,
    _pq_assign,
    _pq_explode,
    _pq_train_centroids,
    _pqr_frames,
    _pqr_train_centroids,
)


def _pq_dist_block(scheme: str, ctes: str, tbl: str = "e") -> str:
    return """
    SELECT * FROM (
      WITH {ctes},
      pdf AS (
        SELECT e.vec_id, c.sub, c.cid,
               round(1e-12 + sum((e.val - c.v) * (e.val - c.v)), 9) AS d
        FROM {tbl} e JOIN pc{last} c ON c.dim = e.dim
        GROUP BY e.vec_id, c.sub, c.cid
      ),
      paf AS (
        SELECT vec_id, sub, d FROM (
          SELECT vec_id, sub, d,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY d ASC, cid ASC) AS rk
          FROM pdf
        ) WHERE rk = 1
      ),
      tot AS (
        SELECT vec_id, round(1e-9 + sum(d), 6) AS td
        FROM paf GROUP BY vec_id
      )
      SELECT '{scheme}' AS scheme,
             round(1e-9 + avg(td), 4) AS avg_err,
             max(td) AS max_err
      FROM tot
    )""".format(scheme=scheme, ctes=ctes.strip(), last=_PQT_ITERS, tbl=tbl)


_PQ_DISTORTION_SQL = "{raw}\n    UNION ALL\n{res}".format(
    raw=_pq_dist_block("pq_raw", _PQ_TRAIN_CTES),
    res=_pq_dist_block("pq_residual", _PQR_TRAIN_CTES, tbl="re"),
)


def _sub_min_d(e, cents):
    """Per (vector, subspace) argmin assignment distance — _pq_assign
    with the distance KEPT (it is the subspace reconstruction error)."""
    d = (
        e.drop("sub").join(cents, "dim")
        .groupBy("vec_id", "sub", "cid")
        .agg(F.round(
            F.sum((F.col("val") - F.col("v")) * (F.col("val") - F.col("v")))
            + F.lit(1e-12), 9).alias("d"))
    )
    rk = F.row_number().over(
        Window.partitionBy("vec_id", "sub").orderBy(F.col("d").asc(), F.col("cid").asc())
    )
    return d.withColumn("rk", rk).filter(F.col("rk") == 1).select("vec_id", "sub", "d")


@register("pq_distortion_report", _PQ_DISTORTION_SQL)
def q_pq_distortion_report(spark, sf_dir):
    """Reconstruction error of the two trained PQ schemes over the whole
    corpus: one row per scheme with corpus-average and corpus-max
    per-vector squared error. pq_residual's avg_err is the number that
    should beat pq_raw's — the measured justification for the residual
    codebooks feeding knn_ivfpq_residual_topk."""
    def per_scheme(scheme, e, cents):
        td = (
            _sub_min_d(e, cents)
            .groupBy("vec_id")
            .agg(F.round(F.sum("d") + F.lit(1e-9), 6).alias("td"))
        )
        return td.agg(
            F.lit(scheme).alias("scheme"),
            F.round(F.avg("td") + F.lit(1e-9), 4).alias("avg_err"),
            F.max("td").alias("max_err"),
        )

    e_raw = _pq_explode(spark, sf_dir)
    c_raw = _pq_train_centroids(spark, sf_dir)
    _, e_res = _pqr_frames(spark, sf_dir)
    c_res = _pqr_train_centroids(spark, sf_dir)
    return per_scheme("pq_raw", e_raw, c_raw).unionByName(
        per_scheme("pq_residual", e_res, c_res)
    )


# ---------------------------------------------------------------------------
# PQ recall report: end-to-end retrieval quality of the two IVFPQ schemes
# ---------------------------------------------------------------------------
# pq_distortion_report measures RECONSTRUCTION error; this measures what
# a user of the index actually observes — recall@5 of each scheme's ADC
# top-5 against the EXACT-L2 top-5 over raw vectors, restricted to the
# scheme's own probed cell (so the number isolates quantization error,
# not cell-pruning loss, which ann_recall_report already covers for the
# coarse layer). Within one cell ||x-y|| == ||r_x - r_y||, so exact-L2
# over raw vectors IS the target the residual ADC approximates.
#
# Both ADC top-5 sets COMPOSE the registered knn queries
# (knn_ivfpq_topk / knn_ivfpq_residual_topk on the Spark side; their
# shared CTE chains on the oracle side), so this report stays in
# lockstep with each probe's own checked definition by construction.
#
# Scale shape: the ground-truth scorer is one broadcast-join scan of the
# probed CELL (not the corpus) per scheme — the same bounded-sample
# recall-QA shape as ann_recall_report; the single-partition rank window
# only ever sees one cell's candidates. Rounding: exact distances at 9dp
# with the 1e-12 nudge (the kd/pdf training lockstep rule), recall at
# 4dp.

from crawler_spark.queries_media import (
    _pq_trained_adc_sql,
    _pq_trained_dist_ctes,
    _pqr_dist_ctes,
    q_knn_ivfpq_residual_topk,
    q_knn_ivfpq_topk,
)

_PQ_RECALL_K = 5

_PQ_RECALL_TAIL = """
    cand AS (
      {cand}
    ),
    adc5 AS (
      SELECT vec_id FROM (
        SELECT c.vec_id,
               row_number() OVER (ORDER BY round(1e-9 + {adc}, 4) ASC,
                                  c.vec_id ASC) AS rk
        {adc_from}
      ) WHERE rk <= {k}
    ),
    gt5 AS (
      SELECT vec_id FROM (
        SELECT vec_id, row_number() OVER (ORDER BY d ASC, vec_id ASC) AS rk
        FROM (
          SELECT e2.vec_id,
                 round(1e-12 + sum((e2.val - q.val) * (e2.val - q.val)), 9) AS d
          FROM e e2
          JOIN e q ON q.dim = e2.dim AND q.vec_id = 0
          JOIN cand ON cand.vec_id = e2.vec_id
          GROUP BY e2.vec_id
        )
      ) WHERE rk <= {k}
    ),
    h AS (SELECT count(*)::BIGINT AS n_hit FROM adc5 JOIN gt5 USING (vec_id))
    SELECT '{scheme}' AS scheme,
           (SELECT count(*) FROM cand)::BIGINT AS n_cand,
           h.n_hit AS n_hit,
           round(h.n_hit / {k}.0 + 1e-9, 4) AS recall_at_5
    FROM h"""


def _pq_recall_block(
    scheme: str, head: str, cells: str,
    cand: str | None = None, adc: str | None = None,
    adc_from: str = "FROM pcodes c JOIN cand USING (vec_id), pq",
) -> str:
    return "    SELECT * FROM (\n      WITH {head},\n{tail}\n    )".format(
        head=head.strip(),
        tail=_PQ_RECALL_TAIL.format(
            cand=cand or ("SELECT l.vec_id FROM {cells} l, qc\n"
                          "      WHERE l.cell = qc.cell AND l.vec_id != 0"
                          ).format(cells=cells),
            adc=adc or _pq_trained_adc_sql,
            adc_from=adc_from, k=_PQ_RECALL_K, scheme=scheme,
        ),
    )


_PQ_RECALL_RAW_HEAD = """
    {train},
    {dist},
    cells AS (
      SELECT vec_id, array_position(d, list_max(d)) AS cell
      FROM (SELECT vec_id, [{dots}] AS d FROM embeddings)
    ),
    qc AS (SELECT cell FROM cells WHERE vec_id = 0)
""".format(train=_PQ_TRAIN_CTES.strip(), dist=_pq_trained_dist_ctes.strip(),
           dots=_cell_dots_sql)

_PQ_RECALL_RES_HEAD = """
    {train},
    {dist},
    qc AS (SELECT cell FROM kaf WHERE vec_id = 0)
""".format(train=_PQR_TRAIN_CTES.strip(), dist=_pqr_dist_ctes.strip())

def _pq_recall_mp_block() -> str:
    """Third scheme row: the residual multiprobe's ADC top-5 (per-cell
    query LUT, the registered knn_ivfpq_residual_multiprobe_topk chain)
    vs exact-L2 top-5 within the UNION of the nprobe probed cells —
    quantifies what widening the probe buys end-to-end."""
    from crawler_spark.queries_index import _pqr_mp_parts

    mp_ctes, adcm = _pqr_mp_parts()
    head = "{train},\n    {dist},\n    {mp}".format(
        train=_PQR_TRAIN_CTES.strip(), dist=_pqr_dist_ctes.strip(),
        mp=mp_ctes)
    return _pq_recall_block(
        "pq_residual_multiprobe", head, "kaf",
        cand=("SELECT l.vec_id FROM kaf l JOIN probe p ON l.cell = p.cell\n"
              "      WHERE l.vec_id != 0"),
        adc=adcm,
        adc_from=("FROM pcodes c JOIN cand USING (vec_id)\n"
                  "        JOIN kaf l ON l.vec_id = c.vec_id\n"
                  "        JOIN pqm m ON m.cell = l.cell"),
    )


# Global-scope rows (FAISS-convention recall curves): ground truth is
# the exact-L2 top-5 over the WHOLE corpus, the probe keeps its own
# cell restriction — so these rows price cell-pruning loss + ADC error
# together, the number a user of the index actually experiences. The
# pair (pq_residual_global, pq_residual_mp_global) is the direct
# single-cell-vs-multiprobe comparison on a FIXED target.
_PQ_GLOBAL_CAND = "SELECT DISTINCT vec_id FROM e WHERE vec_id != 0"


def _pq_recall_global_blocks() -> str:
    from crawler_spark.queries_index import _pqr_mp_parts

    mp_ctes, adcm = _pqr_mp_parts()
    mp_head = "{train},\n    {dist},\n    {mp}".format(
        train=_PQR_TRAIN_CTES.strip(), dist=_pqr_dist_ctes.strip(),
        mp=mp_ctes)
    single = _pq_recall_block(
        "pq_residual_global", _PQ_RECALL_RES_HEAD, "kaf",
        cand=_PQ_GLOBAL_CAND,
        adc_from=("FROM pcodes c JOIN cand USING (vec_id)\n"
                  "        JOIN kaf l ON l.vec_id = c.vec_id\n"
                  "        JOIN qc ON l.cell = qc.cell\n"
                  "        CROSS JOIN pq"),
    )
    multi = _pq_recall_block(
        "pq_residual_mp_global", mp_head, "kaf",
        cand=_PQ_GLOBAL_CAND,
        adc=adcm,
        adc_from=("FROM pcodes c JOIN cand USING (vec_id)\n"
                  "        JOIN kaf l ON l.vec_id = c.vec_id\n"
                  "        JOIN pqm m ON m.cell = l.cell"),
    )
    return "{s}\n    UNION ALL\n{m}".format(s=single, m=multi)


_PQ_RECALL_SQL = (
    "{raw}\n    UNION ALL\n{res}\n    UNION ALL\n{mp}\n    UNION ALL\n{g}"
).format(
    raw=_pq_recall_block("pq_raw", _PQ_RECALL_RAW_HEAD, "cells"),
    res=_pq_recall_block("pq_residual", _PQ_RECALL_RES_HEAD, "kaf"),
    mp=_pq_recall_mp_block(),
    g=_pq_recall_global_blocks(),
)


def _exact_cell_topk(emb, cand, k: int):
    """Exact-L2 top-k over RAW vectors restricted to the candidate set
    (one probed cell): broadcast the 1-row query vector, zip_with the
    squared diff, rank with the vec_id tiebreak."""
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    d = (
        emb.join(cand, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                _dsum(F.zip_with(
                    "embedding", "qv",
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                )) + F.lit(1e-12), 9).alias("d"),
        )
    )
    rk = F.row_number().over(Window.orderBy(F.col("d").asc(), F.col("vec_id").asc()))
    return d.withColumn("rk", rk).filter(F.col("rk") <= k).select("vec_id")


@register("pq_recall_report", _PQ_RECALL_SQL)
def q_pq_recall_report(spark, sf_dir):
    """recall@5 of each trained-ADC scheme's top-5 (the registered
    knn_ivfpq_topk / knn_ivfpq_residual_topk results, composed) against
    the exact-L2 top-5 within the scheme's probed cell; one row per
    scheme with the candidate-set size."""
    emb = _t(spark, sf_dir, "embeddings")

    def raw_cells():
        cell_dots = F.array(*[
            _dsum(F.zip_with(
                "embedding", F.array(*[F.lit(v) for v in cent]),
                lambda a, b: a.cast("double") * b,
            ))
            for cent in _CENTROIDS
        ])
        return emb.select(
            "vec_id",
            F.array_position(cell_dots, F.array_max(cell_dots)).alias("cell"),
        )

    def score(scheme, cand, adc5):
        gt5 = _exact_cell_topk(emb, cand, _PQ_RECALL_K)
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
        n_hit = adc5.join(gt5, "vec_id").agg(F.count(F.lit(1)).alias("n_hit"))
        return n_cand.crossJoin(n_hit).select(
            F.lit(scheme).alias("scheme"), "n_cand", "n_hit",
            F.round(F.col("n_hit") / _PQ_RECALL_K + F.lit(1e-9), 4)
            .alias("recall_at_5"),
        )

    def per_scheme(scheme, cells, adc5):
        qc = cells.filter(F.col("vec_id") == 0).select(F.col("cell").alias("qc"))
        cand = (
            cells.crossJoin(F.broadcast(qc))
            .filter((F.col("cell") == F.col("qc")) & (F.col("vec_id") != 0))
            .select("vec_id")
        )
        return score(scheme, cand, adc5)

    kaf, _ = _pqr_frames(spark, sf_dir)
    raw = per_scheme(
        "pq_raw", raw_cells(),
        q_knn_ivfpq_topk(spark, sf_dir).select("vec_id"),
    )
    res = per_scheme(
        "pq_residual", kaf,
        q_knn_ivfpq_residual_topk(spark, sf_dir).select("vec_id"),
    )
    # third row: the multiprobe, against exact-L2 within the UNION of
    # its nprobe probed cells — what widening the probe buys end-to-end
    from crawler_spark.queries_index import (
        q_knn_ivfpq_residual_multiprobe_topk,
        query_pqr_probe_cells,
    )

    pcells = [int(c) for c in query_pqr_probe_cells(spark, sf_dir)]
    mp_cand = kaf.filter(
        F.col("cell").isin(pcells) & (F.col("vec_id") != 0)
    ).select("vec_id")
    mp = score(
        "pq_residual_multiprobe", mp_cand,
        q_knn_ivfpq_residual_multiprobe_topk(spark, sf_dir).select("vec_id"),
    )
    # global rows (FAISS convention): ground truth = exact-L2 top-5 over
    # the WHOLE corpus, probe keeps its cell restriction — prices
    # cell-pruning loss + ADC error together on a FIXED target, making
    # single-cell vs multiprobe directly comparable. The full-corpus
    # exact scan is the recall-QA sample cost, not a serving path.
    all_cand = emb.filter(F.col("vec_id") != 0).select("vec_id")
    g1 = score(
        "pq_residual_global", all_cand,
        q_knn_ivfpq_residual_topk(spark, sf_dir).select("vec_id"),
    )
    g2 = score(
        "pq_residual_mp_global", all_cand,
        q_knn_ivfpq_residual_multiprobe_topk(spark, sf_dir).select("vec_id"),
    )
    return (
        raw.unionByName(res).unionByName(mp)
        .unionByName(g1).unionByName(g2)
    )


# ---------------------------------------------------------------------------
# OPQ distortion report: permuted vs contiguous residual subspaces
# ---------------------------------------------------------------------------
# The measure-don't-guess A/B for the OPQ-P dimension permutation
# (opq_dim_permutation): train residual codebooks over the SAME residual
# work table twice — once with the contiguous floor((dim-1)/16) slicing
# (the pq_residual scheme pq_distortion_report already prices) and once
# with the balanced-variance snake permutation — and report each
# scheme's corpus reconstruction error under the identical 4x8 code
# budget. If the per-dim variances are skewed, the permuted codebooks
# should spend their codewords where the energy is and post a lower
# avg_err; if the corpus is isotropic the two rows tie, which is itself
# the honest answer (OPQ's win is data-dependent — Ge et al. 2013 §5).
#
# Scale shape identical to pq_distortion_report (two trainer chains +
# one per-vector sum); the permutation adds one 64-row broadcast join.

from crawler_spark.queries_media import (
    _OPQ_PERM_CTES,
    _PQ_K,
    _pqt_iter_sql,
    opq_perm_frame,
    opq_work_table,
    pqr_train_centroids_frame,
)

_OPQ_TRAIN_CTES = """
    {perm},
    reo AS (
      SELECT r.vec_id, r.dim, p.sub, r.val
      FROM re r JOIN perm p USING (dim)
    ),
    pc0 AS (
      SELECT sub, vec_id AS cid, dim, round(1e-9 + val, 6) AS v
      FROM reo WHERE vec_id BETWEEN 1 AND {k}
    ),
    {iters}
""".format(
    perm=_OPQ_PERM_CTES.strip(), k=_PQ_K,
    iters=",".join(
        _pqt_iter_sql(i, tbl="reo") for i in range(1, _PQT_ITERS + 1)
    ).lstrip(",\n "),
)

_OPQ_DISTORTION_SQL = "{res}\n    UNION ALL\n{opq}".format(
    res=_pq_dist_block("pq_residual", _PQR_TRAIN_CTES, tbl="re"),
    opq=_pq_dist_block("pq_opq", _OPQ_TRAIN_CTES, tbl="reo"),
)


@register("opq_distortion_report", _OPQ_DISTORTION_SQL)
def q_opq_distortion_report(spark, sf_dir):
    """Reconstruction error of contiguous-sliced vs OPQ-permuted
    residual codebooks, one row per scheme — the A/B that justifies (or
    rejects) adopting the permutation for the serving index."""
    def per_scheme(scheme, e, cents):
        td = (
            _sub_min_d(e, cents)
            .groupBy("vec_id")
            .agg(F.round(F.sum("d") + F.lit(1e-9), 6).alias("td"))
        )
        return td.agg(
            F.lit(scheme).alias("scheme"),
            F.round(F.avg("td") + F.lit(1e-9), 4).alias("avg_err"),
            F.max("td").alias("max_err"),
        )

    _, e_res = _pqr_frames(spark, sf_dir)
    c_res = _pqr_train_centroids(spark, sf_dir)
    e_opq = opq_work_table(e_res, opq_perm_frame(e_res))
    seed = (
        e_opq.select("vec_id").distinct()
        .filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _PQ_K))
        .select("vec_id", F.col("vec_id").alias("cid"))
    )
    c_opq = pqr_train_centroids_frame(e_opq, seed)
    return per_scheme("pq_residual", e_res, c_res).unionByName(
        per_scheme("pq_opq", e_opq, c_opq)
    )
