"""Run EVERY oracle pair at an arbitrary scale factor (driver gate is
sf0.01; `python sweep_oracles.py sf0.1` stress-tests the same contract at
10x). Caught a real bug: Spark unix_timestamp truncates sub-second
timestamps while DuckDB epoch() keeps them, flipping a RANGE-frame
boundary row that only exists at sf0.1."""
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    sf_dir = f"/root/testdata/{sf}"
    from crawler_spark.session import get_spark
    import __spark_entry__ as E
    from test_queries_oracle import normalize

    spark = get_spark(f"sweep_{sf}")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    bad, vac = [], []
    for name in sorted(oracles):
        try:
            s = normalize(qs[name](spark, sf_dir).toPandas())
            o = normalize(con.sql(oracles[name]).df())
            if len(s) != len(o):
                bad.append((name, f"rows {len(s)} vs {len(o)}"))
                continue
            if len(s) == 0:
                vac.append(name)
                continue
            if ({c: s[c].dtype.kind for c in s.columns}
                    != {c: o[c].dtype.kind for c in o.columns}):
                bad.append((name, "dtype-kind mismatch"))
                continue
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=False, atol=1e-9, rtol=0)
            print(f"ok    {name} ({len(s)} rows)", flush=True)
        except AssertionError as e:
            bad.append((name, "values: " + str(e).splitlines()[0]))
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            bad.append((name, f"{type(e).__name__}: {e}"))
    # cache hygiene (VERDICT r02 #6): a full-registry sweep must end with
    # ZERO cached RDD blocks once tracked persists are released
    from crawler_spark.queries import cleanup_caches

    cleanup_caches()
    cached = spark.sparkContext._jsc.getPersistentRDDs().size()
    print(f"\ncached RDDs after cleanup_caches(): {cached}")
    if cached:
        bad.append(("cache_hygiene", f"{cached} cached RDDs leaked"))

    print(f"VACUOUS at {sf}:", vac)
    print("FAILURES:", len(bad))
    for n, msg in bad:
        print("FAIL ", n, "--", msg[:300])
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
