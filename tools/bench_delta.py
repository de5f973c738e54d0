#!/usr/bin/env python3
"""Round-over-round per-query bench delta (VERDICT r12 task 5).

Compares two builder bench artifacts' per-query warm-floor seconds
(the short-format `queries` map carries every query slower than the
fast-row cutoff; rows only in one artifact print one-sided). Emits a
markdown table of the largest movers plus the totals line.

Usage: python3 tools/bench_delta.py <old.json> <new.json> [top_n]
"""
import json
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    qo, qn = old["queries"], new["queries"]
    both = sorted(set(qo) & set(qn),
                  key=lambda k: -abs(qn[k] - qo[k]))
    print(f"| query | r_old_s | r_new_s | delta |")
    print("|---|---|---|---|")
    for k in both[:top_n]:
        print(f"| {k} | {qo[k]:.2f} | {qn[k]:.2f} | {qn[k]-qo[k]:+.2f} |")
    only_new = sorted(set(qn) - set(qo), key=lambda k: -qn[k])
    if only_new:
        print("\nnew-in-right slow rows: " +
              ", ".join(f"{k} {qn[k]:.2f}s" for k in only_new[:15]))
    print(f"\ntotals: old {old['value']:.2f}s "
          f"({old.get('fast_n', 0)} fast rows sum {old.get('fast_sum', 0):.1f}s) "
          f"-> new {new['value']:.2f}s "
          f"({new.get('fast_n', 0)} fast rows sum {new.get('fast_sum', 0):.1f}s); "
          f"retries {old.get('retries')}->{new.get('retries')}, "
          f"unadj {old.get('unadj_n')}->{new.get('unadj_n')}")


if __name__ == "__main__":
    main()
