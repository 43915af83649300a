#!/usr/bin/env python3
"""Generate a larger scale factor locally for scale-exponent measurement
(round-9 VERDICT item 2 — SCALE.md's claims were argued, not measured).

Usage: gen_scale.py <out_dir> <mult>

Relational tables (customer/orders/lineitem/supplier/part/events)
replicate the read-only /root/testdata/sf0.1 fixture <mult> times with
key offsets — value distributions and per-key fan-outs are preserved
exactly, key ranges scale linearly, so join/aggregate work scales the
way a real corpus would. documents/embeddings generate FRESH content
with the fixture's measured structure (31-word vocab, ~300-char docs,
~5%% perturbed near-dup copies, ~0.15%% exact dups; unit 64-dim float
vectors with planted noisy-copy near-dups) because naive replication
would turn every document into an exact dup of its 9 copies and
distort the dedup candidate structure the measurement exists to probe.

Deterministic (seed 42). Output is scratch data — never committed.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

def repl(name, out, mult, offsets):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    df = t.to_pandas()
    parts = []
    for i in range(mult):
        c = df.copy()
        for col, step in offsets.items():
            c[col] = c[col] + i * step
        parts.append(c)
    import pandas as pd
    allp = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(allp, preserve_index=False),
                   f"{out}/{name}.parquet")
    print(f"{name}: {len(allp)} rows")

def gen_documents(out, n, zipf=False):
    """zipf=True swaps the fixture's 31-word vocabulary for a realistic
    one: 50k distinct tokens drawn Zipf(a=1.2) — the round-9 VERDICT
    noted the tiny vocab saturates q_dedup_ngram's df-cap, making its
    measured scale exponent a cap artifact rather than an operator
    property. Near-dup / exact-dup planting rates stay identical so the
    candidate structure the dedup queries probe is unchanged.
    """
    rng = np.random.default_rng(42)
    if zipf:
        V = 50000
        ranks = np.arange(1, V + 1, dtype=np.float64)
        probs = ranks ** -1.2
        probs /= probs.sum()
        vocab = np.array([f"w{i}" for i in range(V)])
        def draw(k):
            return vocab[rng.choice(V, size=k, p=probs)]
    else:
        vocab = np.array(("batch part spark line column order small sort vector "
            "scan fast query agg slow value filter customer stream key join "
            "large merge shuffle read write table row group page disk cache").split())
        def draw(k):
            return vocab[rng.integers(0, len(vocab), k)]
    langs = np.array(["en", "en", "zh", "es", "fr", "de"])
    texts, lang, src = [], [], []
    for i in range(n):
        if texts and rng.random() < 0.05:      # perturbed near-dup copy
            base = texts[rng.integers(0, len(texts))].split()
            k = max(1, len(base) // 20)
            repl_words = draw(k)
            for j in range(k):
                base[rng.integers(0, len(base))] = repl_words[j]
            texts.append(" ".join(base))
        elif texts and rng.random() < 0.0016:  # exact dup
            texts.append(texts[rng.integers(0, len(texts))])
        else:
            ln = int(rng.integers(8, 100))
            texts.append(" ".join(draw(ln)))
        lang.append(langs[rng.integers(0, len(langs))])
        src.append(f"src{int(rng.integers(0, 20))}")
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(src),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {n} rows")

def gen_embeddings(out, n, dim=64):
    rng = np.random.default_rng(43)
    v = rng.standard_normal((n, dim))
    # planted near-dups: ~30% of vectors are noisy copies of an earlier one
    for i in range(1, n):
        if rng.random() < 0.3:
            j = int(rng.integers(0, i))
            v[i] = v[j] + 0.35 * rng.standard_normal(dim)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in v.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32())})
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {n} rows")

def main(out, mult):
    # "zipfN" third-arg form handled in __main__: documents-only output
    os.makedirs(out, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out}/{name}.parquet")
    repl("customer", out, mult, {"c_custkey": 15000})
    repl("supplier", out, mult, {"s_suppkey": 1000})
    repl("part", out, mult, {"p_partkey": 20000})
    repl("orders", out, mult, {"o_orderkey": 150000, "o_custkey": 15000})
    repl("lineitem", out, mult, {"l_orderkey": 150000, "l_partkey": 20000,
                                 "l_suppkey": 1000})
    repl("events", out, mult, {"event_id": 100000, "user_id": 1500})
    gen_documents(out, 5000 * mult)
    gen_embeddings(out, 2000 * mult)

if __name__ == "__main__":
    # gen_scale.py <out> zipf <mult>: documents-only fixture with the
    # realistic 50k-token Zipf vocabulary (for dedup scale re-measurement;
    # the dedup queries read only documents.parquet)
    if len(sys.argv) > 2 and sys.argv[2] == "zipf":
        out = sys.argv[1]
        os.makedirs(out, exist_ok=True)
        gen_documents(out, 5000 * int(sys.argv[3]), zipf=True)
    else:
        main(sys.argv[1], int(sys.argv[2]))
