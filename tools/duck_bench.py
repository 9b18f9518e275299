#!/usr/bin/env python3
"""DuckDB timing twin of graft.Bench (NOT part of the library): runs the
headline queries' oracle SQL from an oracle_sql.json dump against an sf dir
and prints one JSON line {"metric":"duckdb_total","value":s,"queries":{...}}.

Usage: python3 tools/duck_bench.py <oracle_sql.json> <sf_dir> [passes=2]
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HEADLINE = ["agg_tpch_q1", "agg_sum_two_keys", "agg_count_distinct",
            "agg_dynamic_1h", "join_inner", "join_left_agg", "join_star",
            "join_asof_backward", "win_rank", "win_rolling_time",
            "topk_global", "explode_words", "text_quality",
            "dedup_near_pairs", "sim_bruteforce_topk"]


def connect(sf):
    c = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        if t == "events":
            row = c.execute(f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()
            if row and row[0] == "BIGINT":
                c.execute("CREATE VIEW events AS SELECT * REPLACE "
                          f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
                continue
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return c


def main():
    oracle = json.load(open(sys.argv[1]))
    sf = sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = connect(sf)
    best = {}
    for p in range(passes):
        for name in HEADLINE:
            sql = oracle.get(name)
            if sql is None:
                best[name] = "missing"
                continue
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                dt = time.time() - t0
                prev = best.get(name)
                if not isinstance(prev, float) or dt < prev:
                    best[name] = dt
            except Exception as e:
                best[name] = f"err: {str(e)[:120]}"
                con = connect(sf)
            print(f"pass {p} {name}: {best[name]}", file=sys.stderr, flush=True)
    total = sum(v for v in best.values() if isinstance(v, float))
    print(json.dumps({
        "metric": "duckdb_total", "value": round(total, 3), "unit": "sec",
        "queries": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in best.items()},
        "sf": sf, "passes": passes}))


if __name__ == "__main__":
    main()
