"""Local stand-in for the driver's correctness gate: run every contract
query on Spark AND its DuckDB oracle at a given sf, compare row count,
column names, and an order-insensitive value hash (values normalized:
doubles rounded to 9 significant-ish decimals, rows sorted).

Usage: python tools/compare_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def table_digest(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in idx) for r in rows)
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest(), lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from webscraping_video_pipeline_spark.session import get_spark

    spark = get_spark(app_name="compare_oracle", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for tname in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name:42s} spark error: {str(ex).splitlines()[0][:120]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name:42s} rows-only: {len(srows)} rows, cols={scols}")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name:42s} duckdb error: {str(ex).splitlines()[0][:120]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in dcols) and sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        sh, sl = table_digest(scols, srows)
        dh, dl = table_digest(dcols, drows)
        if sh != dh:
            problems.append("value-hash mismatch")
        if problems:
            n_fail += 1
            print(f"FAIL  {name:42s} {'; '.join(problems)}")
            if sh != dh and len(srows) == len(drows):
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"      spark : {a[:160]}")
                        print(f"      duckdb: {b[:160]}")
                        break
        else:
            n_pass += 1
            print(f"PASS  {name:42s} {len(srows)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
