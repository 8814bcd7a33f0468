#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark — this mirrors what the round driver
does: run Verify's parquet output vs the oracle SQL in DuckDB).

STRICT mode (round-2 lesson): the driver's hash gate is row-order
sensitive AND type-representation sensitive (DuckDB HUGEINT →
Arrow/pandas float64; DECIMAL(38,2) vs Spark DECIMAL(28,2)). So this
checker compares, per query:
  - column names (sorted)
  - pandas dtypes per column (after sorting columns by name)
  - values in RETURNED ROW ORDER (no row sort), exact repr

usage: python3 dev/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame(rel):
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = [str(df[c].dtype) for c in cols]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(f"{type(v).__name__}:{v!r}" for v in t))
    return cols, dtypes, rows


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            scols, sdt, srows = frame(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
            dcols, ddt, drows = frame(con.sql(sql))
            if scols != dcols:
                results[name] = f"SCHEMA MISMATCH spark={scols} duck={dcols}"
            elif sdt != ddt:
                results[name] = f"DTYPE MISMATCH spark={sdt} duck={ddt}"
            elif len(srows) != len(drows):
                results[name] = f"ROWCOUNT {len(srows)} vs {len(drows)}"
            elif srows != drows:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
                results[name] = f"VALUE/ORDER MISMATCH e.g. {diffs}"
            else:
                results[name] = "OK"
        except Exception as e:
            results[name] = f"ERROR {e}"
    # rows-only check for queries without oracle
    for name in sorted(os.listdir(outdir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
        results[name] = f"rows-only: {n} rows" + ("" if n > 0 else "  (!! EMPTY)")
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' else '....'} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle queries match (strict)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
