"""Graph-shaped training-data operator: near-duplicate CLUSTER formation.

Pair generators (MinHash/LSH, Jaccard, SimHash — queries_ml) emit edges;
a real dedup pipeline then needs the transitive closure — connected
components — to pick one canonical document per duplicate cluster. The
reference has no graph operator (SURVEY §2.3: no joins beyond lookups);
this is the LLM-pipeline extension the graft calls for.

Scale design: edges are LSH-band STARS (each doc connects to the MIN doc
of its band), so a band of b docs contributes b-1 edges, never b^2 —
union-find over LSH bands without materializing all pairs. Components
are resolved by iterative min-label propagation (each round: label =
min(label, neighbors' labels)), which converges in O(log diameter)
rounds for star-chain graphs; every round is one shuffle-join on doc_id.
DuckDB oracle: identical bands/edges, transitive closure via a recursive
CTE, min reachable id per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.queries import _t, md5h, register

_CC_SQL = r"""
    WITH RECURSIVE
    w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
          FROM documents),
    bands AS (
      SELECT doc_id,
         ('0x'||substr(md5(array_to_string(ws[1:5], ' ')),1,15))::BIGINT AS b1,
         ('0x'||substr(md5(array_to_string(ws[4:8], ' ')),1,15))::BIGINT AS b2
      FROM w
    ),
    s1 AS (SELECT doc_id AS a, min(doc_id) OVER (PARTITION BY b1) AS b FROM bands),
    s2 AS (SELECT doc_id AS a, min(doc_id) OVER (PARTITION BY b2) AS b FROM bands),
    edges AS (
      SELECT a, b FROM s1 WHERE a <> b
      UNION SELECT b, a FROM s1 WHERE a <> b
      UNION SELECT a, b FROM s2 WHERE a <> b
      UNION SELECT b, a FROM s2 WHERE a <> b
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    ),
    comp AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a)
    SELECT d.doc_id, least(d.doc_id, coalesce(c.mn, d.doc_id)) AS cluster_id
    FROM (SELECT doc_id FROM documents) d LEFT JOIN comp c USING (doc_id)
"""

_MAX_ITERS = 20


def _band_edges(docs: DataFrame) -> DataFrame:
    """Bidirectional star edges: every doc -> the min doc of each of its
    two overlapping 5-word LSH bands (shared md5-prefix hash with the
    oracle)."""
    ws = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("ws")
    )
    bands = ws.select(
        "doc_id",
        md5h(F.array_join(F.slice("ws", 1, 5), " ")).alias("b1"),
        md5h(F.array_join(F.slice("ws", 4, 5), " ")).alias("b2"),
    )
    stars = []
    for col in ("b1", "b2"):
        m = bands.groupBy(col).agg(F.min("doc_id").alias("b"))
        stars.append(
            bands.join(m, col).select(F.col("doc_id").alias("a"), "b")
            .filter(F.col("a") != F.col("b"))
        )
    star = stars[0].unionByName(stars[1])
    return star.unionByName(
        star.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()


@register("dedup_cluster_components", _CC_SQL)
def q_dedup_cluster_components(spark, sf_dir):
    """Connected components over LSH-band star edges -> one cluster_id
    (min member doc_id) per document; singletons keep their own id. The
    canonical-doc selection step after near-dup pair generation. Driver
    loop runs at most ceil(log2(diameter)) + 1 rounds past convergence;
    each round is a single shuffle-join (labels are (id, label) pairs —
    tiny next to the corpus), and the convergence check is a count on
    the changed rows only."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    edges = _band_edges(docs).persist()
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id")).persist()
    try:
        for _ in range(_MAX_ITERS):
            nbr = (
                edges.join(labels, edges.b == labels.doc_id)
                .groupBy(F.col("a").alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        "cluster_id", F.coalesce("nbr_min", "cluster_id")
                    ).alias("cluster_id"),
                )
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("doc_id", "cluster_id")
    finally:
        edges.unpersist()
