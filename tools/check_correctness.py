"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash. Run:

    python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "∅"
    if isinstance(v, float):
        if v.is_integer():
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replicate the DRIVER's canonicalizer, which is stricter than ours: it
    pandas-sort_values over every column, which raises TypeError on unhashable
    cells (lists/ndarrays) and TypeError on mixed-type object columns. Any
    query whose result trips this here would FAIL the real driver check even
    if our own frame_hash coped (round-1 lesson: batch_pipeline)."""
    return pdf.sort_values(by=list(sorted(pdf.columns))).reset_index(drop=True)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        "\x1f".join(norm_cell(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as E
    from scrape_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = E.queries(), E.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {ex}")
            failures.append(name)
            continue
        try:
            driver_canon(spdf)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: driver canonicalizer would crash: {type(ex).__name__} {ex}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(spdf)} rows ({time.time()-t0:.1f}s)")
            if len(spdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        ddf = con.execute(sqls[name]).fetchdf()
        problems = []
        if len(spdf) != len(ddf):
            problems.append(f"rows {len(spdf)} vs {len(ddf)}")
        if sorted(spdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(spdf.columns)} vs {sorted(ddf.columns)}")
        else:
            hs, hd = frame_hash(spdf), frame_hash(ddf)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
                cols = sorted(spdf.columns)
                a = sorted("\x1f".join(norm_cell(v) for v in r) for r in spdf[cols].itertuples(index=False, name=None))
                b = sorted("\x1f".join(norm_cell(v) for v in r) for r in ddf[cols].itertuples(index=False, name=None))
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    problems.append(f"  spark: {x[:160]}\n  duck : {y[:160]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(spdf)} rows, hash match ({time.time()-t0:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
