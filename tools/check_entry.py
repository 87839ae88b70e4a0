"""Local mimic of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark at the given sf dir, runs the
matching ``oracle_sql()[name]`` in DuckDB over the same parquet files,
and compares row count + column names + an order-insensitive value hash
(rows sorted, columns sorted by name, floats kept as-is since both sides
round explicitly).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from data_quality_assessment_spark.session import get_spark

    spark = get_spark("check-entry", master="local[8]")
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
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            hs = table_hash(scols, srows)
            hd = table_hash(dcols, drows)
            if hs != hd:
                print(f"FAIL {name}: value hash {hs} != {hd}")
                # show a diff sample
                s_set = set(
                    "\x1f".join(norm_cell(r[i]) for i in
                                sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
                d_set = set(
                    "\x1f".join(norm_cell(r[i]) for i in
                                sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows)
                for x in list(s_set - d_set)[:3]:
                    print("   spark-only:", x[:160])
                for x in list(d_set - s_set)[:3]:
                    print("   duck-only: ", x[:160])
                ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print("entry() smoke:", end=" ")
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"{n} rows, {len(edf.columns)} cols")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
