#!/usr/bin/env python3
"""Whole-suite DuckDB baseline pin (VERDICT r11 tasks 2+3).

Replicates the r6 pin protocol over the CURRENT oracle suite: load each
<sfDir>/*.parquet as a DuckDB view, run every oracle_sql.json query once
to warm (filesystem cache + DuckDB's own buffers), then time N further
full passes (SET threads=<threads>) and report the per-query minimum —
the same best-of-N adjudication the Spark side's Bench applies since
r11, so the two totals compare like-for-like (the r11 advisor's
methodology-break point cuts both ways; pinning the baseline with the
same estimator closes it).

Usage:
  python3 tools/pin_duckdb.py <sfDir> <oracle_sql.json> [passes] [out.json]

Writes a JSON record: per-query seconds (min over passes + each pass),
total_min, per-pass totals, loadavg before/after, duckdb version.
"""
import json
import os
import sys
import time

import duckdb


def loadavg():
    try:
        return open("/proc/loadavg").read().split()[:3]
    except OSError:
        return []


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "pin_duckdb.json"
    threads = int(os.environ.get("PIN_THREADS", "32"))

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    import glob
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.load(open(oracle_path))
    names = sorted(oracles)
    print(f"{len(names)} oracled queries, {passes} timed passes, threads={threads}")

    load_pre = loadavg()
    # warm pass (untimed): plan + file cache
    failed = {}
    for n in names:
        try:
            con.execute(oracles[n]).fetchall()
        except Exception as e:  # a mirror that errors must be visible, not a 0s row
            failed[n] = str(e).split("\n")[0][:200]
            print(f"FAIL {n}: {failed[n]}")
    ok = [n for n in names if n not in failed]

    samples = {n: [] for n in ok}
    pass_totals = []
    for _ in range(passes):
        t_pass = 0.0
        for n in ok:
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetchall()
            dt = time.perf_counter() - t0
            samples[n].append(dt)
            t_pass += dt
        pass_totals.append(t_pass)
        print(f"pass total: {t_pass:.2f}s  (loadavg {','.join(loadavg())})")

    mins = {n: min(samples[n]) for n in ok}
    rec = {
        "sf": sf_dir,
        "oracle_sql": oracle_path,
        "n_queries": len(ok),
        "threads": threads,
        "passes": passes,
        "total_min": sum(mins.values()),
        "pass_totals": pass_totals,
        "queries_min": {n: round(mins[n], 4) for n in ok},
        "queries_passes": {n: [round(x, 4) for x in samples[n]] for n in ok},
        "failed": failed,
        "loadavg_pre": load_pre,
        "loadavg_post": loadavg(),
        "duckdb": duckdb.__version__,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"total_min={rec['total_min']:.2f}s over {len(ok)} queries -> {out_path}")
    top = sorted(mins.items(), key=lambda kv: -kv[1])[:15]
    for n, v in top:
        print(f"  {n}: {v:.3f}s")


if __name__ == "__main__":
    main()
