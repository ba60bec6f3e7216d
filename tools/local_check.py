#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each result dumped
by graft.Verify, run the paired oracle SQL in DuckDB over the same
parquet tables and compare row count, column names, and value hashes
(columns sorted by name, rows sorted by all columns, values
stringified). Usage: local_check.py <sfDir> <verifyOutDir>
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql, label):
    """Return (ncols, colnames, hash) for a result set, canonicalized.

    Mirrors the driver's comparator: it loads results into pandas and
    lexsorts rows with DataFrame.sort_values, which throws on
    array-valued cells (unhashable numpy.ndarray — CORRECTNESS_r04).
    We probe that exact path first so the local gate is never greener
    than the driver's, then hash via the stringify-sort path.
    """
    df = con.execute(rel_sql).fetch_arrow_table()
    import pyarrow as pa  # noqa
    names = sorted(df.column_names)
    df = df.select(names)
    # driver-compat probe: pandas sort_values must succeed
    pdf = df.to_pandas()
    pdf.sort_values(by=names)  # raises TypeError on ndarray cells
    # stringify + sort rows
    rows = []
    for batch in df.to_pylist():
        rows.append(tuple(repr(batch[n]) for n in names))
    rows.sort()
    import hashlib
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), names, h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            results[name] = "MISSING_RESULT"
            continue
        try:
            n1, c1, h1 = canon(con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')", "spark")
        except Exception as e:
            results[name] = f"SPARK_READ_ERROR: {e}"
            continue
        try:
            n2, c2, h2 = canon(con, sql, "oracle")
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        if c1 != c2:
            results[name] = f"COLS_MISMATCH spark={c1} oracle={c2}"
        elif n1 != n2:
            results[name] = f"ROWS_MISMATCH spark={n1} oracle={n2}"
        elif h1 != h2:
            results[name] = f"HASH_MISMATCH ({n1} rows)"
        else:
            results[name] = f"OK ({n1} rows)"
    # queries without oracle → rows-only
    width = max(len(k) for k in results) if results else 0
    fails = 0
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
        if not v.startswith("OK"):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} OK")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
