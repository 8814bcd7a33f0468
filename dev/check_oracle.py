#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark — this mirrors what the round driver
does: run Verify's parquet output vs the oracle SQL in DuckDB).

usage: python3 dev/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [c for c in sorted(cols)], out


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols, srows = canon(spark_rel.fetchall(), spark_rel.columns)
            duck_rel = con.sql(sql)
            dcols, drows = canon(duck_rel.fetchall(), duck_rel.columns)
            if scols != dcols:
                results[name] = f"SCHEMA MISMATCH spark={scols} duck={dcols}"
            elif len(srows) != len(drows):
                results[name] = f"ROWCOUNT {len(srows)} vs {len(drows)}"
            elif srows != drows:
                diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
                results[name] = f"VALUE MISMATCH e.g. {diffs}"
            else:
                results[name] = "OK"
        except Exception as e:
            results[name] = f"ERROR {e}"
    # rows-only check for queries without oracle
    import os
    for name in sorted(os.listdir(outdir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
        results[name] = f"rows-only: {n} rows" + ("" if n > 0 else "  (!! EMPTY)")
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' else '....'} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
