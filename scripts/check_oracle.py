"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at a given sf_dir and its oracle_sql() twin in DuckDB,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from search_engine_spark.session import build_session

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def compare(name, sdf, con, sql):
    srows = sdf.collect()
    scols = sdf.columns
    try:
        ddf = con.sql(sql).df()
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}"
    dcols = list(ddf.columns)
    if sorted(scols) != sorted(dcols):
        return f"FAIL {name}: cols spark={scols} duck={dcols}"
    cols = sorted(scols)
    sset = sorted([tuple(norm(r[c]) for c in cols) for r in srows])
    dset = sorted(
        [tuple(norm(v) for v in rec) for rec in ddf[cols].itertuples(index=False)]
    )
    if len(sset) != len(dset):
        return f"FAIL {name}: rows spark={len(sset)} duck={len(dset)}"
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return f"FAIL {name}: values differ, first diffs: {diff}"
    return f"OK   {name}: {len(sset)} rows"


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # data-adapted oracle rows (trained PQ codebooks) fit their model
    # from this dir — keep oracle_sql() and queries() on the same data
    # when sweeping at a non-default scale
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    # accept both space- and comma-separated name lists: a comma-joined
    # argument used to silently match NOTHING and print a vacuous
    # "ALL PASS" — the worst possible failure mode for a gate
    only = set()
    for a in sys.argv[2:]:
        only.update(x for x in a.replace("--only", "").split(",") if x)
    spark = build_session("check_oracle", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed += 1
            continue
        if name in oracles:
            msg = compare(name, sdf, con, oracles[name])
        else:
            n = sdf.count()
            msg = f"OK   {name}: rows-only check, {n} rows"
        if msg.startswith("FAIL"):
            failed += 1
        print(msg, flush=True)
    # smoke the entry
    if not only:
        n = entrymod.entry(spark).count()
        print(f"OK   entry: {n} rows")
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL: unknown query names {sorted(unknown)}")
        failed += 1
    print("ALL PASS" if failed == 0 else f"{failed} FAILURES")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
