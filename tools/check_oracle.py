"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
given SF dir; compare row count, column names, and an order-insensitive
value hash (floats rounded to 9 significant-ish decimals first).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from record_linkage_ldu_spark.session import build_session

    spark = build_session(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s spark={t_spark:.1f}s]")
            continue
        t1 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t1
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_hash = frame_hash(scols, srows) == frame_hash(dcols, drows)
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: spark={len(srows)} duck={len(drows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {dcols}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} "
            f"[{time.time()-t0:.1f}s spark={t_spark:.1f}s duck={t_duck:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_count:
                _show_diff(scols, srows, dcols, drows)
    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


def _show_diff(scols, srows, dcols, drows, limit=5):
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = {tuple(norm_cell(r[i]) for i in sorder) for r in srows}
    dset = {tuple(norm_cell(r[i]) for i in dorder) for r in drows}
    print("   spark-only:", list(sset - dset)[:limit])
    print("   duck-only :", list(dset - sset)[:limit])


if __name__ == "__main__":
    main()
