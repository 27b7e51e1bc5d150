"""Generate a SCALED measurement-only copy of the testdata star schema.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r06.json recorded sf1.0 = 10x sf0.1) that is not kept on
disk between rounds. This tool synthesizes tables with the same schema
and the same statistical shape as /root/testdata/sf0.1 (empirical word
frequencies, lang/source mixes, per-user event rates) at an arbitrary
multiplier, so optimization A/Bs can be validated at the scale the
driver measures. Output lives under .bench_data/ (gitignored) — it is
NEVER read by bench.py, checks, tests, or oracles; /root/testdata stays
untouched (TESTDATA.md).

Usage: python tools/gen_scaled_testdata.py OUT_DIR [MULT]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42


def _read(t: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{t}.parquet"))


def gen(out: str, mult: int = 10) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    # -- documents: word salads re-sampled from the empirical unigram mix --
    docs = _read("documents")
    texts = docs.column("text").to_pylist()
    words, counts = np.unique(
        np.array([w for t in texts for w in t.split(" ") if w]), return_counts=True
    )
    probs = counts / counts.sum()
    lens = np.array([len(t.split(" ")) for t in texts])
    n_docs = len(texts) * mult
    out_lens = rng.choice(lens, size=n_docs, replace=True)
    flat = rng.choice(words, size=int(out_lens.sum()), p=probs)
    bounds = np.concatenate(([0], np.cumsum(out_lens)))[:-1]
    new_texts = [
        " ".join(flat[b : b + l]) for b, l in zip(bounds, out_lens, strict=True)
    ]
    langs = docs.column("lang").to_numpy(zero_copy_only=False)
    sources = docs.column("source").to_numpy(zero_copy_only=False)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(new_texts),
            "lang": pa.array(rng.choice(langs, size=n_docs)),
            "source": pa.array(rng.choice(sources, size=n_docs)),
            "n_chars": pa.array(
                np.array([len(t) for t in new_texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))

    # -- events: mult x users, same per-user event-rate + value shape --
    ev = _read("events")
    n_ev = ev.num_rows * mult
    n_users = int(ev.column("user_id").to_numpy().max()) + 1
    ts0 = np.datetime64("2024-01-01T00:00:00")
    span_s = 30 * 24 * 3600
    etypes = np.unique(ev.column("event_type").to_numpy(zero_copy_only=False))
    ts = ts0 + (rng.random(n_ev) * span_s * 1e6).astype("timedelta64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users * mult, n_ev)),
            "event_type": pa.array(rng.choice(etypes, size=n_ev)),
            "value": pa.array(np.round(rng.random(n_ev) * 100, 4)),
            "props": pa.array(["{}"] * n_ev),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))

    # -- embeddings: 64-dim gaussians like the source --
    emb = _read("embeddings")
    n_emb = emb.num_rows * mult
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    labels = np.unique(emb.column("label").to_numpy(zero_copy_only=False))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.choice(labels, size=n_emb)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))

    # -- customer / orders: scale keys, keep value distributions --
    cust = _read("customer")
    n_cust = cust.num_rows * mult
    seg = np.unique(cust.column("c_mktsegment").to_numpy(zero_copy_only=False))
    tbl = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust)),
            "c_acctbal": pa.array(np.round(rng.random(n_cust) * 9999, 2)),
            "c_mktsegment": pa.array(rng.choice(seg, size=n_cust)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "customer.parquet"))

    orders = _read("orders")
    n_ord = orders.num_rows * mult
    pri = np.unique(orders.column("o_orderpriority").to_numpy(zero_copy_only=False))
    stat = np.unique(orders.column("o_orderstatus").to_numpy(zero_copy_only=False))
    dates = orders.column("o_orderdate").to_numpy(zero_copy_only=False)
    tbl = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n_ord + 1, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord)),
            "o_orderstatus": pa.array(rng.choice(stat, size=n_ord)),
            "o_totalprice": pa.array(np.round(rng.random(n_ord) * 400000, 2)),
            "o_orderdate": pa.array(rng.choice(dates, size=n_ord)),
            "o_orderpriority": pa.array(rng.choice(pri, size=n_ord)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "orders.parquet"))
    print(f"wrote {out} at {mult}x sf0.1")


if __name__ == "__main__":
    gen(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
