"""Local emulation of the driver's DuckDB oracle gate: run every
queries() entry and its oracle_sql() side by side, compare row count,
sorted column names, and an order-insensitive value multiset.

Usage: python tools/oracle_check.py [sf_dir] [name_filter ...]
       python tools/oracle_check.py --registry [sf_dir] [filter ...]

--registry widens the sweep from the driver contract to the FULL
query REGISTRY — i.e. it also verifies the oracle-backed entries that
are deliberately demoted from the driver's recording window (the
"verified on demand" class documented in SURVEY §2). Oracle SQL is
evaluated FIRST, before the Spark session exists, because several
demoted oracles are unrolled iterative CTE chains and the two engines
competing for file handles on this VM can EMFILE DuckDB.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_val(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def _norm_val(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(v)
    return v


# Canonical type classes so a DuckDB HUGEINT (int128) can't silently
# pass against a Spark BIGINT: the driver's hash gate materializes the
# DuckDB result as pandas, where HUGEINT/DECIMAL degrade to float64 /
# object and hash differently even when the value multisets are equal
# (VERDICT r01 "What's wrong" #1). Machine-int widths (int32 vs int64)
# all render identically, so they share one class.
_DUCK_TYPE_MAP = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "HUGEINT": "hugeint", "UBIGINT": "ubigint",
    "DOUBLE": "float", "FLOAT": "float", "VARCHAR": "string",
    "BOOLEAN": "boolean", "DATE": "date", "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}

_SPARK_TYPE_MAP = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float",
}


def _canon_duck_type(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"array<{_canon_duck_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_TYPE_MAP.get(t, t.lower())


def _canon_spark_type(t: str) -> str:
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_canon_spark_type(t[6:-1])}>"
    return _SPARK_TYPE_MAP.get(t, t)


def main():
    args = sys.argv[1:]
    registry_mode = "--registry" in args
    args = [a for a in args if a != "--registry"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]

    import __spark_entry__ as entrymod
    from semlink.session import get_spark

    if registry_mode:
        from semlink.queries import REGISTRY
        queries = {n: fn for n, (fn, _) in REGISTRY.items()}
        # the driver contract adds fixture-pipeline entries that live
        # ONLY in __spark_entry__ (e.g. pipeline_fixture_f1) — a
        # "wider than the contract" sweep must still include them
        queries.update(entrymod.queries())
        oracles = {n: sql for n, (_, sql) in REGISTRY.items()
                   if sql is not None}
        oracles.update(entrymod.oracle_sql())  # golden-constant oracles
    else:
        queries = entrymod.queries()
        oracles = entrymod.oracle_sql()

    selected = [n for n in queries
                if not names or any(m in n for m in names)]

    # DuckDB pass first — rows AND schema (DESCRIBE) — so no DuckDB
    # call runs after the JVM exists (module docstring: EMFILE).
    # Memory note: every selected oracle's full result set is held at
    # once; a whole-registry sweep at sf0.01 is a few hundred MB —
    # run name-filtered chunks if that is too much for the host.
    duck = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name in selected:
        if name not in oracles:
            continue
        try:
            res = con.execute(oracles[name])
            rows = ([d[0] for d in res.description], res.fetchall())
        except Exception as e:
            duck[name] = (None, None, None, e)
            continue
        try:
            dtypes = {r[0]: _canon_duck_type(r[1]) for r in con.execute(
                f"DESCRIBE {oracles[name]}").fetchall()}
        except Exception as e:
            dtypes = None
            print(f"warn {name}: DESCRIBE failed ({e})")
        duck[name] = (rows[0], rows[1], dtypes, None)
    con.close()

    spark = get_spark("oracle-check")
    failures = []
    for name in selected:
        fn = queries[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time() - t0:.1f}s) — no oracle")
            continue
        duck_cols, duck_rows, duck_types, duck_err = duck[name]
        if duck_err is not None:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {duck_err}")
            continue
        sc, sr = normalize_rows(spark_cols, spark_rows)
        dc, dr = normalize_rows(duck_cols, duck_rows)
        status = []
        if sc != dc:
            status.append(f"cols {sc} != {dc}")
        tm = {}
        if duck_types is not None:
            spark_types = {f.name: _canon_spark_type(
                f.dataType.simpleString()) for f in df.schema.fields}
            tm = {c: (spark_types[c], duck_types[c])
                  for c in spark_types
                  if c in duck_types and spark_types[c] != duck_types[c]}
        if tm:
            status.append(f"types differ {tm}")
        if len(sr) != len(dr):
            status.append(f"rowcount {len(sr)} != {len(dr)}")
        elif sr != dr:
            n_bad = sum(1 for a, b in zip(sr, dr) if a != b)
            ex = next((a, b) for a, b in zip(sr, dr) if a != b)
            status.append(f"values differ ({n_bad} rows) e.g. {ex[0]} != {ex[1]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name} ({len(sr)} rows, {time.time() - t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
