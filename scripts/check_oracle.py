"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` against its
``oracle_sql()`` DuckDB equivalent at sf0.01 and compares row count,
schema (column names), and a value hash computed over rows sorted by
all columns with columns sorted by name — mirroring the driver's
CORRECTNESS_r{N}.json gate so reds can be reproduced without a round.

Usage: python scripts/check_oracle.py [sf_dir] [key ...]
"""

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from logsentinelai_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    fails = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if key not in oracles:
            print(f"{key:24s} rows={len(srows):6d}  (no oracle — rows-only)")
            continue
        cur = con.execute(oracles[key])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok
            and schema_ok
            and value_hash(scols, srows) == value_hash(ocols, orows)
        )
        status = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"{key:24s} {status} rows={len(srows)}/{len(orows)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
        if status == "FAIL":
            fails.append(key)
    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
