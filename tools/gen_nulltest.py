"""Build a NULL-robustness corpus at /tmp/nulltest: a copy of a small
sf dir with adversarial rows appended — NULL / empty / whitespace-only
document text, and a zero vector plus a NULL vector in embeddings.

Running the oracle harness against it flags any operator whose Spark
NULL semantics silently diverge from its DuckDB oracle (the corpus-luck
failure mode that hit embedding_topk_qcosine's zero-norm filter,
doc_bpe_token_stats' NULL text, and doc_repetition_stats' NaN
dup_char_frac):

    python tools/gen_nulltest.py [src_sf_dir]
    python tools/check_correctness.py /tmp/nulltest <doc_*/embedding_*/corpus_* gates>
"""

import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def build(src: str = "/root/testdata/sf0.001", dst: str = "/tmp/nulltest") -> str:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), dst)

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    df = t.to_pandas()
    base = df.iloc[0].to_dict()
    extra = []
    for i, txt in enumerate([None, "", "   ", "x"]):
        r = dict(base)
        r["doc_id"] = int(df["doc_id"].max()) + 1 + i
        r["text"] = txt
        extra.append(r)
    df2 = pd.concat([df, pd.DataFrame(extra)], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(df2, schema=t.schema, preserve_index=False),
        os.path.join(dst, "documents.parquet"),
    )

    e = pq.read_table(os.path.join(src, "embeddings.parquet"))
    ed = e.to_pandas()
    b = ed.iloc[0].to_dict()
    dim = len(b["embedding"])
    ex = []
    r = dict(b)
    r["vec_id"] = int(ed["vec_id"].max()) + 1
    r["embedding"] = np.zeros(dim, dtype=np.float32)
    ex.append(r)
    r = dict(b)
    r["vec_id"] = int(ed["vec_id"].max()) + 2
    r["embedding"] = None
    ex.append(r)
    ed2 = pd.concat([ed, pd.DataFrame(ex)], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(ed2, schema=e.schema, preserve_index=False),
        os.path.join(dst, "embeddings.parquet"),
    )

    # events: one NULL per column an event gate filters or groups on
    # (round 6 — the k-anonymity QI filters made the gap visible)
    ev = pq.read_table(os.path.join(dst, "events.parquet"))
    vd = ev.to_pandas()
    eb = vd.iloc[0].to_dict()
    evx = []
    for i, null_col in enumerate(["ts", "user_id", "event_type", "value"]):
        r = dict(eb)
        r["event_id"] = int(vd["event_id"].max()) + 1 + i
        r[null_col] = None
        evx.append(r)
    vd2 = pd.concat([vd, pd.DataFrame(evx)], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(vd2, schema=ev.schema, preserve_index=False),
        os.path.join(dst, "events.parquet"),
    )

    # TPC-H-ish tables: one NULL per analytic column the relational
    # gates aggregate, rank, or join on (round 6 — Spark's ascending
    # sort default is NULLS FIRST where DuckDB's is NULLS LAST, so any
    # window over a nullable column is a latent divergence). Primary
    # keys get fresh values; o_custkey exercises a NULL join key.
    tpch_nulls = {
        "orders": ("o_orderkey", ["o_custkey", "o_totalprice", "o_orderdate",
                                  "o_orderstatus", "o_orderpriority"]),
        "lineitem": ("l_orderkey", ["l_quantity", "l_extendedprice",
                                    "l_discount", "l_shipdate", "l_suppkey"]),
        "customer": ("c_custkey", ["c_mktsegment", "c_name", "c_acctbal",
                                   "c_nationkey"]),
        "part": ("p_partkey", ["p_brand", "p_name", "p_retailprice"]),
        "supplier": ("s_suppkey", ["s_name", "s_nationkey", "s_acctbal"]),
    }
    counts = []
    for table, (key, null_cols) in tpch_nulls.items():
        path = os.path.join(dst, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        t2 = pq.read_table(path)
        td = t2.to_pandas()
        tb = td.iloc[0].to_dict()
        tx = []
        for i, nc in enumerate(c for c in null_cols if c in td.columns):
            r = dict(tb)
            r[key] = int(td[key].max()) + 1 + i
            r[nc] = None
            tx.append(r)
        td2 = pd.concat([td, pd.DataFrame(tx)], ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(td2, schema=t2.schema, preserve_index=False),
            path,
        )
        counts.append(f"{table}+{len(tx)}")
    print(
        f"wrote {dst}: {len(df2)} docs, {len(ed2)} vecs, {len(vd2)} events, "
        + ", ".join(counts)
    )
    return dst


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
