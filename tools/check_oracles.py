"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their string form — the same
comparison shape the driver documents).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


_SPARK_T = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
    "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
    "binary": "bin",
}
_DUCK_T = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UBIGINT": "u64", "FLOAT": "f32", "DOUBLE": "f64",
    "VARCHAR": "str", "BOOLEAN": "bool", "TIMESTAMP": "ts", "DATE": "date",
    "BLOB": "bin",
}


def type_mismatches(spark_df, duck_desc):
    """Normalized per-column type families; mismatches flag engine-type
    drift (e.g. DuckDB HUGEINT sums vs Spark bigint) that a strict
    driver-side schema compare would reject."""
    stypes = {f.name: _SPARK_T.get(f.dataType.simpleString(),
                                   f.dataType.simpleString())
              for f in spark_df.schema.fields}
    import duckdb  # typecodes come through the relation description
    bad = []
    for name, typ in duck_desc:
        o = _DUCK_T.get(typ, typ)
        s = stypes.get(name)
        if s is not None and s != o and not (
                s.startswith("decimal") and o.startswith("DECIMAL")):
            bad.append(f"{name}: spark={s} duckdb={o}")
    return bad


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from pdf_extractor_spark.session import get_spark

    tz = os.environ.get("ORACLE_TZ")
    extra = {"spark.sql.session.timeZone": tz} if tz else {}
    shuffle = os.environ.get("ORACLE_SHUFFLE")  # partition-count audit
    if shuffle:
        extra["spark.sql.shuffle.partitions"] = shuffle
    spark = get_spark("check-oracles", extra=extra or None)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only, "
                  f"{time.time() - t0:.1f}s)")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = list(zip(rel.columns, [str(t) for t in rel.types]))
            orows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(exc)[:300]}")
            continue
        srows_t = [tuple(r) for r in srows]
        problems = []
        tmis = type_mismatches(sdf, otypes)
        if tmis:
            problems.append(f"type drift: {tmis}")
        if len(srows_t) != len(orows):
            problems.append(f"rowcount {len(srows_t)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh = value_hash(scols, srows_t)
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first diff for debugging
                so = sorted(str(sorted(zip(scols, map(_norm_cell, r))))
                            for r in srows_t)
                oo = sorted(str(sorted(zip(ocols, map(_norm_cell, r))))
                            for r in orows)
                for i, (a, b) in enumerate(zip(so, oo)):
                    if a != b:
                        print(f"      first diff row {i}:\n"
                              f"      spark:  {a[:400]}\n"
                              f"      oracle: {b[:400]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows_t)} rows "
                  f"({time.time() - t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
