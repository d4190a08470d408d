#!/usr/bin/env python3
"""Scale-up fixture generator (builder self-check only).

Replicates the driver's sf0.1 tables by an integer factor with
FK-consistent key shifts, so the engine + oracle pair can be exercised
at ~sf1 (10x the bench fixture, 100x the driver's correctness fixture)
without touching the read-only /root/testdata. Distributions are
preserved by construction (each copy IS the source distribution);
documents get fresh seeded text from the corpus vocabulary (verbatim
10-cliques of every doc would be an adversarial near-dup corpus, not a
scaled one), and embeddings get seeded noisy copies renormalized to
unit length so the label/cluster structure survives.

events.ts is written as parquet TIMESTAMP(NANOS) — pandas ns dtype +
pyarrow version>=2.6 — to preserve the driver fixture's quirk that the
engine's nanosAsLong read path depends on.

Usage: python3 tools/gen_scale.py [src] [dst] [factor]
"""
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
F = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")


def copies(sql_tpl, n=F):
    return " UNION ALL ".join(sql_tpl.format(i=i) for i in range(n))


import os
os.makedirs(DST, exist_ok=True)

# bounded dims stay bounded (the point of the broadcast contract)
write("region", f"SELECT * FROM {src('region')}")
write("nation", f"SELECT * FROM {src('nation')}")

write("supplier", copies(
    f"SELECT s_suppkey + {{i}}*1000 AS s_suppkey, "
    f"printf('Supplier#%09d', CAST(s_suppkey + {{i}}*1000 AS INT)) AS s_name, "
    f"s_nationkey, s_acctbal FROM {src('supplier')}"))

write("part", copies(
    f"SELECT p_partkey + {{i}}*20000 AS p_partkey, p_name, p_brand, p_type, "
    f"p_size, p_retailprice FROM {src('part')}"))

write("customer", copies(
    f"SELECT c_custkey + {{i}}*15000 AS c_custkey, "
    f"printf('Customer#%09d', CAST(c_custkey + {{i}}*15000 AS INT)) AS c_name, "
    f"c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}"))

write("orders", copies(
    f"SELECT o_orderkey + {{i}}*150000 AS o_orderkey, "
    f"o_custkey + {{i}}*15000 AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM {src('orders')}"))

write("lineitem", copies(
    f"SELECT l_orderkey + {{i}}*150000 AS l_orderkey, "
    f"l_partkey + {{i}}*20000 AS l_partkey, l_suppkey + {{i}}*1000 AS l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}"))

# ---- events: preserve TIMESTAMP(NANOS) via pandas/pyarrow ----------
ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
n_ev, n_users = len(ev), int(ev.user_id.max()) + 1
parts = []
for i in range(F):
    c = ev.copy()
    c["event_id"] = c.event_id + i * n_ev
    c["user_id"] = c.user_id + i * n_users
    parts.append(c)
allev = pd.concat(parts, ignore_index=True)
schema = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
    ("user_id", pa.int64()), ("event_type", pa.string()),
    ("value", pa.float64()), ("props", pa.string())])
pq.write_table(pa.Table.from_pandas(allev, schema=schema, preserve_index=False),
               f"{DST}/events.parquet", version="2.6")
print(f"events: {len(allev)} rows (ts ns)")

# ---- documents: copy 0 verbatim; fresh seeded text for the rest ----
docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
vocab = sorted({t for txt in docs.text for t in txt.split()})
lens = docs.text.str.split().str.len().to_numpy()
langs, lang_p = np.unique(docs.lang, return_counts=True)
srcs, src_p = np.unique(docs["source"], return_counts=True)
n_docs = len(docs)
dparts = [docs]
for i in range(1, F):
    rng = np.random.RandomState(4200 + i)
    texts = [" ".join(rng.choice(vocab, size=rng.choice(lens)))
             for _ in range(n_docs)]
    dparts.append(pd.DataFrame({
        "doc_id": docs.doc_id + i * n_docs,
        "text": texts,
        "lang": rng.choice(langs, size=n_docs, p=lang_p / lang_p.sum()),
        "source": rng.choice(srcs, size=n_docs, p=src_p / src_p.sum()),
        "n_chars": [len(t) for t in texts]}))
alldocs = pd.concat(dparts, ignore_index=True)
alldocs["n_chars"] = alldocs["n_chars"].astype("int64")
pq.write_table(pa.Table.from_pandas(alldocs, preserve_index=False),
               f"{DST}/documents.parquet", version="2.6")
print(f"documents: {len(alldocs)} rows")

# ---- embeddings: seeded noisy copies, renormalized, same labels ----
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
mat = np.stack(emb.embedding.to_numpy())
n_vec = len(emb)
eparts = [emb]
for i in range(1, F):
    rng = np.random.RandomState(7700 + i)
    noisy = 0.9 * mat + 0.1 * rng.normal(size=mat.shape).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    eparts.append(pd.DataFrame({
        "vec_id": emb.vec_id + i * n_vec,
        "embedding": list(noisy.astype(np.float32)),
        "label": emb.label}))
allemb = pd.concat(eparts, ignore_index=True)
eschema = pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())])
pq.write_table(pa.Table.from_pandas(allemb, schema=eschema, preserve_index=False),
               f"{DST}/embeddings.parquet", version="2.6")
print(f"embeddings: {len(allemb)} rows")
print("done:", DST)
