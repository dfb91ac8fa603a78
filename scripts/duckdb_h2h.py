#!/usr/bin/env python3
"""DuckDB head-to-head: time every oracle SQL at a given SF (32 threads,
same parquet) and merge with a graft.Bench per-query record.
Usage:
  python3 scripts/duckdb_h2h.py <sfdir> <oracle_sql.json> <bench.json> <out.json>
Each oracle runs twice; min is kept (mirrors Bench's min-of-2).
Queries whose oracle cannot run in DuckDB (none expected) are skipped.
"""
import sys, json, time
import duckdb

sfdir, oracle_path, bench_path, out_path = sys.argv[1:5]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
bench = json.load(open(bench_path))
spark_times = bench["queries"]

rows = {}
for name, sql in sorted(oracle.items()):
    samples = []
    for _ in range(2):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            samples = None
            print(f"SKIP {name}: {type(e).__name__}: {str(e)[:100]}")
            break
        samples.append(time.time() - t0)
    if not samples:
        continue
    d = min(samples)
    s = spark_times.get(name)
    rows[name] = {"duck_sec": round(d, 4),
                  "spark_sec": s,
                  "ratio": round(s / d, 2) if (s and d > 0) else None}

ratios = [r["ratio"] for r in rows.values() if r["ratio"]]
total_spark = sum(r["spark_sec"] for r in rows.values() if r["spark_sec"])
total_duck = sum(r["duck_sec"] for r in rows.values())
summary = {
    "sf": sfdir, "n": len(rows),
    "total_spark_sec": round(total_spark, 2),
    "total_duck_sec": round(total_duck, 2),
    "overall_ratio": round(total_spark / total_duck, 2),
    "median_ratio": round(sorted(ratios)[len(ratios)//2], 2),
    "queries": rows,
}
json.dump(summary, open(out_path, "w"), indent=1)
print(f"n={summary['n']} spark={summary['total_spark_sec']}s duck={summary['total_duck_sec']}s "
      f"overall={summary['overall_ratio']}x median={summary['median_ratio']}x")
