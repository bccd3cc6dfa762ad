"""Seeded model-based fuzz of the snapshot store's mutation surface.

Random (but deterministic) programs of CoW merges, merge-on-read
deletes, schema evolution, compaction and reopen are replayed against a
naive in-memory model; after every op the store's HEAD must equal the
model, and at the end every retained snapshot must equal the model's
recorded history (time travel correctness across feature interplay —
the cases a hand-written test matrix misses, e.g. an evolve while
deletes are pending, a purge of keys added two schemas ago)."""

import random

import pytest

from crawler_spark.tables import SnapshotStore

SPEC = {"blacklist": {"mode": "hash", "key": "url_hash", "n": 4}}
N_OPS = 14
KEYSPACE = list(range(24))


def _mk_df(spark, schema_cols, rows):
    """rows: list of dicts keyed by schema col."""
    data = [tuple(r.get(c) for c in schema_cols) for r in rows]
    ddl = ", ".join(
        f"{c} long" if c == "url_hash" else f"{c} string" for c in schema_cols
    )
    return spark.createDataFrame(data, ddl)


def _read_state(store):
    df = store.read("blacklist")
    cols = df.columns
    return cols, {
        r["url_hash"]: {c: r[c] for c in cols if c != "url_hash"}
        for r in df.collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_store_program_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    store = SnapshotStore(spark, str(tmp_path / f"fuzz{seed}"), bucket_spec=SPEC)
    schema_cols = ["url_hash"]
    extra_i = 0
    model: dict[int, dict] = {}
    history: dict[int, tuple[list, dict]] = {}  # sid -> (cols, rows)

    # initial population
    init = [dict(url_hash=k) for k in rng.sample(KEYSPACE, 10)]
    sid = store.commit({"blacklist": _mk_df(spark, schema_cols, init)})
    model = {r["url_hash"]: {} for r in init}
    history[sid] = (list(schema_cols), {k: dict(v) for k, v in model.items()})

    for step in range(N_OPS):
        op = rng.choice(["upsert", "upsert", "mor", "evolve_add", "evolve_drop",
                         "compact", "reopen"])
        if op == "upsert":
            keys = rng.sample(KEYSPACE, rng.randint(1, 5))
            rows = [
                dict(
                    url_hash=k,
                    **{c: f"s{step}k{k}{c}" for c in schema_cols if c != "url_hash"},
                )
                for k in keys
            ]
            plan = store.plan_merge(
                "blacklist", upsert=_mk_df(spark, schema_cols, rows), key="url_hash"
            )
            sid = store.commit({}, merge={"blacklist": plan})
            for r in rows:
                model[r["url_hash"]] = {c: r[c] for c in schema_cols if c != "url_hash"}
        elif op == "mor":
            if not model:
                continue
            keys = rng.sample(sorted(model), min(len(model), rng.randint(1, 4)))
            sid = store.mor_delete(
                "blacklist", _mk_df(spark, ["url_hash"], [dict(url_hash=k) for k in keys])
            )
            for k in keys:
                model.pop(k, None)
        elif op == "evolve_add":
            extra_i += 1
            col = f"c{extra_i}"
            sid = store.evolve("blacklist", add=[(col, "string")])
            schema_cols.append(col)
            for v in model.values():
                v[col] = None  # Iceberg v1/v2: added col reads NULL
        elif op == "evolve_drop":
            extras = [c for c in schema_cols if c != "url_hash"]
            if not extras:
                continue
            col = rng.choice(extras)
            sid = store.evolve("blacklist", drop=[col])
            schema_cols.remove(col)
            for v in model.values():
                v.pop(col, None)
        elif op == "compact":
            sid = store.compact("blacklist")
        else:  # reopen: crash/resume — state must be fully disk-derived
            store = SnapshotStore(spark, store.root)
            got_cols, got = _read_state(store)
            assert got_cols == schema_cols and got == model, f"reopen diverged at step {step}"
            continue

        history[sid] = (list(schema_cols), {k: dict(v) for k, v in model.items()})
        got_cols, got = _read_state(store)
        assert got_cols == schema_cols, f"{op} at step {step}: columns {got_cols} != {schema_cols}"
        assert got == model, f"{op} at step {step}: state diverged"

    # time travel: every recorded snapshot still reads back exactly,
    # through whatever evolutions/deletes/compactions came after it
    store = SnapshotStore(spark, store.root)
    for sid, (cols, rows) in history.items():
        df = store.read("blacklist", snapshot_id=sid)
        assert df.columns == cols, f"sid {sid}: columns {df.columns} != {cols}"
        got = {
            r["url_hash"]: {c: r[c] for c in cols if c != "url_hash"}
            for r in df.collect()
        }
        assert got == rows, f"sid {sid}: time travel diverged"
