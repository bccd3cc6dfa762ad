"""URL-seen set: exact anti-join, accelerated by sharded sketches.

Re-expresses the reference's per-candidate existence checks
(`!channels.exists(id) && !additional.exists(id)` at
src/crawler/channel_discovery_crawler.rs:120-125 and the
`nonsailingchannels` negative cache at src/repos/non_sailing_channel_repo.rs:21-28)
as ONE set-wise anti-join per micro-batch instead of 2+ point reads per
candidate.

Scale design (10^10 URLs): the seen table is sharded by
`pmod(url_hash, n_shards)`; each shard maintains a serialized sketch
(Bloom, or cuckoo where deletes occur) built/merged per partition via
applyInPandas. At probe time the sketches (MBs, not the 10^10-row table)
broadcast to executors; candidates that probe "definitely new" skip the
exact anti-join entirely — on a discovery-heavy batch that's most of
them — and only "maybe seen" rows pay the join against the (bucketed)
seen table. Correctness never depends on the sketch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from crawler_spark.operators.sketch import BloomFilter, CuckooFilter
from crawler_spark.schemas import SEEN_SKETCH

N_SHARDS_DEFAULT = 16
BLOOM_BITS = 1 << 16
BLOOM_K = 5


def with_shard(df: DataFrame, n_shards: int = N_SHARDS_DEFAULT) -> DataFrame:
    return df.withColumn("shard_id", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))


def build_sketches(
    seen: DataFrame, n_shards: int = N_SHARDS_DEFAULT, kind: str = "bloom",
    snapshot_id: int = 0,
) -> DataFrame:
    """Build one sketch per shard with applyInPandas (grouped-map, the
    UDAF shape of SURVEY §2.10 #5) — partial per-partition sketches are
    merged associatively inside each group."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard_id"].iloc[0])
        if kind == "cuckoo":
            f = CuckooFilter()
            for h in pdf["url_hash"].to_numpy():
                f.add(int(h))
        else:
            f = BloomFilter(BLOOM_BITS, BLOOM_K)
            f.add(pdf["url_hash"].to_numpy())
        return pd.DataFrame({
            "shard_id": [shard],
            "kind": [kind],
            "bits": [f.to_bytes()],
            "n_items": [len(pdf)],
            "snapshot_id": [snapshot_id],
        })

    sharded = with_shard(seen.select("url_hash"), n_shards)
    return sharded.groupBy("shard_id").applyInPandas(_build, SEEN_SKETCH)


def _load_sketches(sketches_rows) -> dict[int, BloomFilter | CuckooFilter]:
    out: dict[int, BloomFilter | CuckooFilter] = {}
    for r in sketches_rows:
        if r["kind"] == "cuckoo":
            out[r["shard_id"]] = CuckooFilter.from_bytes(bytes(r["bits"]))
        else:
            out[r["shard_id"]] = BloomFilter.from_bytes(bytes(r["bits"]), BLOOM_K)
    return out


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    sketches: DataFrame | None = None,
    n_shards: int = N_SHARDS_DEFAULT,
) -> DataFrame:
    """Return candidates NOT in the seen set (J2/J3).

    Without sketches: plain left-anti join on url_hash. With sketches:
    probe first (vectorized pandas UDF over the broadcast sketch dict);
    `definitely new` bypasses the join, `maybe seen` takes the exact
    anti-join; union of both is returned.
    """
    if sketches is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(
        [r.asDict() for r in sketches.collect()]
    )

    @F.pandas_udf(BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        filters = _load_sketches(bc.value)
        out = pd.Series(False, index=url_hash.index)
        shards = (url_hash % n_shards + n_shards) % n_shards
        for shard, grp in url_hash.groupby(shards):
            f = filters.get(int(shard))
            if f is not None:
                out.loc[grp.index] = f.maybe_contains(grp.to_numpy())
        return out

    probed = candidates.withColumn("__maybe", maybe_seen(F.col("url_hash")))
    definite_new = probed.filter(~F.col("__maybe")).drop("__maybe")
    suspect = probed.filter(F.col("__maybe")).drop("__maybe")
    confirmed_new = suspect.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definite_new.unionByName(confirmed_new)


def remove_from_seen(
    seen: DataFrame,
    sketches: DataFrame | None,
    doomed: DataFrame,
    n_shards: int = N_SHARDS_DEFAULT,
    snapshot_id: int = 0,
) -> tuple[DataFrame, DataFrame | None]:
    """Delete keys from the seen set AND its sketches (S13 point-delete on
    crawl state — e.g. operator-forced recrawl reconsideration).

    Bloom filters cannot delete: affected shards are REBUILT from the
    surviving rows. Cuckoo shards delete in place (their reason to exist
    — Fan et al. CoNEXT'14); untouched shards pass through unchanged.
    Returns (new_seen, new_sketches).
    """
    new_seen = seen.join(doomed.select("url_hash").distinct(), "url_hash", "left_anti")
    if sketches is None:
        return new_seen, None
    touched = (
        with_shard(doomed.select("url_hash"), n_shards)
        .select("shard_id").distinct()
    )
    untouched = sketches.join(touched, "shard_id", "left_anti")

    doomed_shards = with_shard(doomed.select("url_hash"), n_shards)
    spark = seen.sparkSession
    # doomed batches are operator-sized (not corpus-sized): collect+broadcast
    rows = doomed_shards.collect()
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        per_shard.setdefault(int(r["shard_id"]), []).append(int(r["url_hash"]))
    bc = spark.sparkContext.broadcast(per_shard)

    def _rebuild_or_delete(pdf: pd.DataFrame) -> pd.DataFrame:
        # group = (shard_id) over union of [old sketch row] + [surviving rows]
        shard = int(pdf["shard_id"].iloc[0])
        kind_rows = pdf[pdf["kind"].notna()]
        if len(kind_rows) and kind_rows["kind"].iloc[0] == "cuckoo":
            f = CuckooFilter.from_bytes(bytes(kind_rows["bits"].iloc[0]))
            for h in bc.value.get(shard, []):
                f.delete(h)
            bits, kind, n = f.to_bytes(), "cuckoo", int(f.n_items)
        else:
            f = BloomFilter(BLOOM_BITS, BLOOM_K)
            keys = pdf.loc[pdf["url_hash"].notna(), "url_hash"].to_numpy(dtype="int64")
            if keys.size:
                f.add(keys)
            bits, kind, n = f.to_bytes(), "bloom", int(keys.size)
        return pd.DataFrame({
            "shard_id": [shard], "kind": [kind], "bits": [bits],
            "n_items": [n], "snapshot_id": [snapshot_id],
        })

    # one grouped pass per touched shard: the old sketch row (for cuckoo
    # in-place delete) plus the surviving seen rows (for bloom rebuild)
    surviving = with_shard(new_seen.select("url_hash"), n_shards).join(
        touched, "shard_id", "left_semi"
    ).withColumn("kind", F.lit(None).cast("string")) \
     .withColumn("bits", F.lit(None).cast("binary")) \
     .withColumn("n_items", F.lit(None).cast("long")) \
     .withColumn("snapshot_id", F.lit(None).cast("long"))
    old_rows = sketches.join(touched, "shard_id", "left_semi").withColumn(
        "url_hash", F.lit(None).cast("long")
    )
    merged = surviving.select("url_hash", "shard_id", "kind", "bits", "n_items", "snapshot_id") \
        .unionByName(old_rows.select("url_hash", "shard_id", "kind", "bits", "n_items", "snapshot_id"))
    rebuilt = merged.groupBy("shard_id").applyInPandas(_rebuild_or_delete, SEEN_SKETCH)
    return new_seen, untouched.unionByName(rebuilt)


def merge_sketch_tables(old: DataFrame, new: DataFrame, snapshot_id: int = 0) -> DataFrame:
    """Associative per-shard sketch merge (bloom OR / cuckoo re-add is not
    needed here because deletes rebuild their shard): union the two
    sketch tables and OR bit arrays within each shard via applyInPandas."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard_id"].iloc[0])
        kinds = set(pdf["kind"])
        if kinds == {"bloom"}:
            acc = None
            for b in pdf["bits"]:
                f = BloomFilter.from_bytes(bytes(b), BLOOM_K)
                acc = f if acc is None else acc.merge(f)
            bits = acc.to_bytes()
            kind = "bloom"
        else:
            # mixed/cuckoo shards: keep the newest (highest snapshot) row;
            # cuckoo shards are rebuilt whole on delete
            row = pdf.sort_values("snapshot_id").iloc[-1]
            bits, kind = bytes(row["bits"]), row["kind"]
        return pd.DataFrame({
            "shard_id": [shard],
            "kind": [kind],
            "bits": [bits],
            "n_items": [int(pdf["n_items"].sum())],
            "snapshot_id": [snapshot_id],
        })

    return old.unionByName(new).groupBy("shard_id").applyInPandas(_merge, SEEN_SKETCH)


def mark_seen(
    url_hashes: DataFrame,
    verdict_col: str = "verdict",
    as_of_ts=None,
    n_shards: int = N_SHARDS_DEFAULT,
) -> DataFrame:
    """Shape new seen rows (url_hash [+ verdict]) for MERGE into `seen`."""
    df = url_hashes
    if verdict_col not in df.columns:
        df = df.withColumn(verdict_col, F.lit("accepted"))
    return (
        with_shard(df.select("url_hash", verdict_col), n_shards)
        .withColumn("decided_at_ts", F.lit(as_of_ts).cast("timestamp"))
        .select("url_hash", "shard_id", F.col(verdict_col).alias("verdict"), "decided_at_ts")
    )
