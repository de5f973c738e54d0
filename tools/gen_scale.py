#!/usr/bin/env python3
"""One-off scale-rehearsal data generator (VERDICT r09 item 7).

Writes a K-times replica of /root/testdata/sf0.1 {documents, embeddings,
events} to OUT, decorrelated per copy so the similarity structure scales
LINEARLY instead of exploding:

- documents: per-copy seeded token shuffle (copy 0 = original). A shuffled
  doc shares almost no 3-gram shingles with its source, so near-dup pairs
  stay within-copy (10x pairs, not 45x cross-copy pairs per doc).
- embeddings: per-copy deterministic component noise (U[-0.25, 0.25]) —
  kills cosine~1 cross-copy identity while keeping loose cluster structure
  for IVF.
- events: id/user offsets, +k us timestamp nudge and +k*1e-6 value nudge —
  no 10-way ties in window sorts, no cross-copy exact-dup collapse.

Usage: python3 tools/gen_scale.py [K] [OUT]   (defaults: 10 /tmp/sfscale)
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
OFF = 10_000_000


def copies(table, fn):
    return pa.concat_tables([fn(table, k) for k in range(K)])


def docs_copy(t, k):
    doc_id = [v + k * OFF for v in t["doc_id"].to_pylist()]
    if k == 0:
        text = t["text"].to_pylist()
    else:
        text = []
        for i, s in enumerate(t["text"].to_pylist()):
            toks = s.split(" ")
            random.Random(k * 1000003 + i).shuffle(toks)
            text.append(" ".join(toks))
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "text": pa.array(text, pa.string()),
        "lang": t["lang"], "source": t["source"], "n_chars": t["n_chars"],
    })


def emb_copy(t, k):
    vec_id = [v + k * OFF for v in t["vec_id"].to_pylist()]
    if k == 0:
        emb = t["embedding"]
    else:
        out = []
        for i, vec in enumerate(t["embedding"].to_pylist()):
            r = random.Random(k * 1000003 + i)
            out.append([x + (r.random() - 0.5) * 0.5 for x in vec])
        emb = pa.array(out, pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(vec_id, pa.int64()),
        "embedding": emb, "label": t["label"],
    })


def events_copy(t, k):
    event_id = [v + k * OFF for v in t["event_id"].to_pylist()]
    user_id = [v + k * OFF for v in t["user_id"].to_pylist()]
    ts = pa.array([v + k for v in t["ts"].cast(pa.int64()).to_pylist()],
                  pa.int64()).cast(pa.timestamp("us"))
    value = [v + k * 1e-6 for v in t["value"].to_pylist()]
    return pa.table({
        "event_id": pa.array(event_id, pa.int64()), "ts": ts,
        "user_id": pa.array(user_id, pa.int64()),
        "event_type": t["event_type"],
        "value": pa.array(value, pa.float64()), "props": t["props"],
    })


def part_copy(t, k):
    # scales the derivatives option grid (q_black_scholes/q_implied_vol
    # derive s/k/t/sigma from p_partkey/p_retailprice): offset keys keep
    # the id-derived grid parameters cycling, the price nudge avoids
    # 10-way identical spots
    cols = {c: t[c] for c in t.column_names}
    cols["p_partkey"] = pa.array(
        [v + k * OFF for v in t["p_partkey"].to_pylist()], pa.int64())
    cols["p_retailprice"] = pa.array(
        [v + k * 1e-4 for v in t["p_retailprice"].to_pylist()], pa.float64())
    return pa.table(cols)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    only = os.environ.get("GEN_TABLES")
    wanted = set(only.split(",")) if only else None
    for name, fn in [("documents", docs_copy), ("embeddings", emb_copy),
                     ("events", events_copy), ("part", part_copy)]:
        if wanted is not None and name not in wanted:
            continue
        t = pq.read_table(f"{SRC}/{name}.parquet")
        scaled = copies(t, fn)
        pq.write_table(scaled, f"{OUT}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {scaled.num_rows}")
    # the TPC-H tables are not part of the rehearsal set; symlink them so
    # Tables.load works if a query touches one
    for name in ["region", "nation", "customer", "supplier",
                 "orders", "lineitem"]:
        dst = f"{OUT}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)


if __name__ == "__main__":
    main()
