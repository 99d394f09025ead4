"""Synthesize a K×-replicated sf-dir for the SCALE.md core-count scaling
table (VERDICT r11 #6): each copy is key-shifted so graph/dedup/stream
keys stay distinct (disjoint copies — embarrassingly parallel by
construction, which is exactly the parallelism claim under test).

- lineitem: l_orderkey += i * ORD_STRIDE, l_partkey += i * PART_STRIDE
  (each copy is its own co-purchase graph; part keys shifted so the
  copies don't share nodes).
- documents: doc_id += i * DOC_STRIDE, and copy i>0's every word gets a
  per-copy suffix (``w`` → ``wc{i}``) — the text analog of key-shifting:
  each copy is the ORIGINAL corpus over a disjoint vocabulary, so the
  within-copy near-dup/shingle/df structure is preserved exactly while
  copies share zero shingles. (Tried and rejected: a marker append left
  every doc a near-dup of its 9 copies — candidate pairs quadratic in K,
  OOMed an 8 GB driver; a word rotation preserved all but the seam
  shingles — same blowup; a per-copy word shuffle flattened the 31-word
  corpus's natural trigram df skew, so NO shingle was prefix-rare and
  the PPJoin posting lists exploded. All three measure a pathological
  corpus, not scaling.)
- events: event_id/user_id shifted per copy.
Tables not listed are symlinked unchanged.

Usage: python tools/make_scaled_corpus.py [K] [src_dir] [dst_dir]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfbig"

ORD_STRIDE = 10_000_000
PART_STRIDE = 10_000_000
DOC_STRIDE = 10_000_000
EVT_STRIDE = 100_000_000
USER_STRIDE = 10_000_000

os.makedirs(DST, exist_ok=True)


def shift(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    c = tbl.column(i)
    return tbl.set_column(i, col, pc.add(c, pa.scalar(delta, type=c.type)))


def replicate(name: str, mutate) -> None:
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    parts = [mutate(tbl, i) for i in range(K)]
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} -> {out.num_rows}")


replicate(
    "lineitem",
    lambda t, i: shift(shift(t, "l_orderkey", i * ORD_STRIDE), "l_partkey", i * PART_STRIDE),
)


def mut_docs(t: pa.Table, i: int) -> pa.Table:
    t = shift(t, "doc_id", i * DOC_STRIDE)
    j = t.schema.get_field_index("text")
    if i == 0:
        return t
    sfx = f"c{i}"
    texts = [
        " ".join(w + sfx for w in s.split(" "))
        for s in t.column(j).to_pylist()
    ]
    return t.set_column(j, "text", pa.array(texts, type=t.column(j).type))


replicate("documents", mut_docs)
replicate(
    "events",
    lambda t, i: shift(shift(t, "event_id", i * EVT_STRIDE), "user_id", i * USER_STRIDE),
)

for name in ("region", "nation", "customer", "supplier", "part", "orders", "embeddings"):
    src = f"{SRC}/{name}.parquet"
    dst = f"{DST}/{name}.parquet"
    if not os.path.exists(dst):
        os.symlink(src, dst)
print("done:", DST)
