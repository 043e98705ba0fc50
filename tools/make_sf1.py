#!/usr/bin/env python3
"""Replicate the sf0.1 fixtures to ~10x ("sf1") for the scale run.

Driver-side tooling only (duckdb + pyarrow + numpy) -- never part of
the library. Output goes to an OUT dir (default /tmp/graft_sf1);
/root/testdata is never touched.

Replication model: an HONEST 10x corpus, not an adversarial one.

- region/nation: dimensions -- copied as-is (a 10x warehouse does not
  grow its nation list).
- customer/supplier/part/orders/lineitem/events: 10 replicas with all
  surrogate keys shifted by replica * |table| (keys are dense 0-based)
  so referential integrity holds within every replica and the key
  spaces never collide. Customer/Supplier display names are
  re-derived from the shifted key (same zero-padded format) so
  name-grain == key-grain stays true. Categorical/measure/time
  columns are copied verbatim: domains (brands, priorities, event
  types, dates) do NOT scale with corpus size.
- documents: doc_id shifts; every token in replica i>0 gets an "_ri"
  suffix (empty tokens preserved), n_chars recomputed. A verbatim
  text copy would make every document a 10-way exact duplicate and
  blow the pair miners up ~100x by construction -- the adversarial
  hot-shingle case (already probed separately in Profile), not the
  honest "10x new content" corpus this run models.
- embeddings: vec_id shifts; replica i>0 components are multiplied by
  a deterministic random sign pattern S_i (seed=i). S_i is diagonal
  orthogonal, so WITHIN-replica dot products/cosines are exactly
  preserved (the ANN/dedup geometry is untouched), while CROSS-replica
  cosines collapse to ~N(0, 1/sqrt(dim)) noise -- no fake 10-way
  duplicate vectors. Labels copy verbatim.
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


# cardinalities for key shifts
N = {
    t: con.execute(f"SELECT count(*) FROM {src(t)}").fetchone()[0]
    for t in ["customer", "supplier", "part", "orders", "events", "documents", "embeddings"]
}
# user_id is its own key space inside events
N["users"] = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

for t in ["region", "nation"]:
    write(t, f"SELECT * FROM {src(t)}")

reps = ", ".join(str(i) for i in range(REPS))

write("customer", f"""
  SELECT c_custkey + i * {N['customer']} AS c_custkey,
    'Customer#' || lpad(CAST(c_custkey + i * {N['customer']} AS VARCHAR), 9, '0') AS c_name,
    c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')}, unnest([{reps}]) AS r(i)""")

write("supplier", f"""
  SELECT s_suppkey + i * {N['supplier']} AS s_suppkey,
    'Supplier#' || lpad(CAST(s_suppkey + i * {N['supplier']} AS VARCHAR), 9, '0') AS s_name,
    s_nationkey, s_acctbal
  FROM {src('supplier')}, unnest([{reps}]) AS r(i)""")

write("part", f"""
  SELECT p_partkey + i * {N['part']} AS p_partkey,
    p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')}, unnest([{reps}]) AS r(i)""")

write("orders", f"""
  SELECT o_orderkey + i * {N['orders']} AS o_orderkey,
    o_custkey + i * {N['customer']} AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, unnest([{reps}]) AS r(i)""")

write("lineitem", f"""
  SELECT l_orderkey + i * {N['orders']} AS l_orderkey,
    l_partkey + i * {N['part']} AS l_partkey,
    l_suppkey + i * {N['supplier']} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, unnest([{reps}]) AS r(i)""")

write("events", f"""
  SELECT event_id + i * {N['events']} AS event_id, ts,
    user_id + i * {N['users']} AS user_id,
    event_type, value, props
  FROM {src('events')}, unnest([{reps}]) AS r(i)""")

write("documents", f"""
  WITH rep AS (
    SELECT doc_id + i * {N['documents']} AS doc_id,
      CASE WHEN i = 0 THEN text ELSE array_to_string(
        list_transform(string_split(text, ' '),
          x -> CASE WHEN len(x) = 0 THEN x ELSE x || '_r' || i END), ' ')
      END AS text,
      lang, source
    FROM {src('documents')}, unnest([{reps}]) AS r(i))
  SELECT doc_id, text, lang, source, CAST(len(text) AS BIGINT) AS n_chars
  FROM rep""")

# embeddings: per-replica deterministic sign flip (numpy)
tbl = pq.read_table(f"{SRC}/embeddings.parquet")
vec_id = tbl.column("vec_id").to_numpy()
label = tbl.column("label").to_numpy()
emb = tbl.column("embedding").to_pylist()
nonnull = [v for v in emb if v is not None and len(v) > 0]
assert nonnull, "embeddings.parquet has no non-empty vectors to replicate"
assert all(lab is not None for lab in label), "embeddings.parquet has null labels"
dim = max(len(v) for v in nonnull)
out_ids, out_emb, out_lab = [], [], []
for i in range(REPS):
    signs = np.random.RandomState(i).choice([-1.0, 1.0], size=dim).astype(np.float32)
    for vid, v, lab in zip(vec_id, emb, label):
        out_ids.append(int(vid) + i * N["embeddings"])
        out_lab.append(int(lab))
        if v is None:
            out_emb.append(None)
        elif i == 0:
            out_emb.append(v)
        else:
            out_emb.append((np.asarray(v, dtype=np.float32) * signs[: len(v)]).tolist())
out = pa.table({
    "vec_id": pa.array(out_ids, pa.int64()),
    "embedding": pa.array(out_emb, pa.list_(pa.float32())),
    "label": pa.array(out_lab, pa.int32()),
})
pq.write_table(out, f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(out_ids)} rows")

# sanity: FK integrity + no cross-replica text dups
checks = [
    ("lineitem->orders", f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l LEFT JOIN read_parquet('{OUT}/orders.parquet') o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"),
    ("orders->customer", f"SELECT count(*) FROM read_parquet('{OUT}/orders.parquet') o LEFT JOIN read_parquet('{OUT}/customer.parquet') c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"),
    ("lineitem->part", f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l LEFT JOIN read_parquet('{OUT}/part.parquet') p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL"),
    ("lineitem->supplier", f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l LEFT JOIN read_parquet('{OUT}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL"),
]
for name, sql in checks:
    bad = con.execute(sql).fetchone()[0]
    assert bad == 0, f"FK violation {name}: {bad}"
    print(f"FK {name}: ok")
dup = con.execute(
    f"SELECT count(*) - count(DISTINCT md5(lower(text))) FROM read_parquet('{OUT}/documents.parquet')").fetchone()[0]
base_dup = con.execute(
    f"SELECT count(*) - count(DISTINCT md5(lower(text))) FROM {src('documents')}").fetchone()[0]
print(f"exact-dup docs: sf1={dup} (base {base_dup} x {REPS} = {base_dup * REPS} expected, no cross-replica dups)")
assert dup == base_dup * REPS, "cross-replica text duplicates leaked"
