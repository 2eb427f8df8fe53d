"""Generate a 20x-bench-scale stress dataset under /tmp/stress:
documents 100k, embeddings 100k x 64 (16 latent clusters), events 1M.
Schemas mirror /root/testdata/sf0.1 so load_table reads them as-is."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

OUT = "/tmp/stress"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(7)

# ---- documents ------------------------------------------------------
N_DOC = 100_000
VOCAB = [f"w{i:04d}" for i in range(10_000)]
zipf = rng.zipf(1.3, size=N_DOC * 120) % len(VOCAB)
lens = rng.integers(40, 200, N_DOC)
texts = []
pos = 0
for n in lens:
    texts.append(" ".join(VOCAB[t] for t in zipf[pos:pos + n]))
    pos += n
# plant ~2% near-duplicates (copy an earlier doc with a small mutation)
for i in rng.integers(0, N_DOC, N_DOC // 50):
    j = int(i) // 2
    texts[int(i)] = texts[j] + " w0001"
langs = rng.choice(["en", "de", "fr", "es"], N_DOC, p=[0.6, 0.2, 0.1, 0.1])
sources = rng.choice(["web", "wiki", "books", "code", "news"], N_DOC)
doc = pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(langs.tolist()),
    "source": pa.array(sources.tolist()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(doc, f"{OUT}/documents.parquet", row_group_size=25_000)

# ---- embeddings -----------------------------------------------------
N_EMB, DIM, K = 100_000, 64, 16
centers = rng.normal(0, 1, (K, DIM))
label = rng.integers(0, K, N_EMB)
emb = centers[label] + rng.normal(0, 0.35, (N_EMB, DIM))
emb = emb.astype(np.float32)
tb = pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
    "label": pa.array(label.astype(np.int32)),
})
pq.write_table(tb, f"{OUT}/embeddings.parquet", row_group_size=25_000)

# ---- events ---------------------------------------------------------
N_EV = 1_000_000
base_ns = 1_600_000_000 * 10**9
ev = pa.table({
    "event_id": pa.array(range(N_EV), pa.int64()),
    "ts": pa.array(base_ns + rng.integers(0, 90 * 86400, N_EV) * 10**9,
                   pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, 15_000, N_EV), pa.int64()),
    "event_type": pa.array(rng.choice(
        ["click", "purchase", "view", "signup", "error"], N_EV,
        p=[0.5, 0.2, 0.2, 0.05, 0.05]).tolist()),
    "value": pa.array(np.round(rng.uniform(1, 500, N_EV), 2)),
    "props": pa.array(["{}"] * N_EV),
})
pq.write_table(ev, f"{OUT}/events.parquet", row_group_size=100_000)
print("done", [f"{f}: {os.path.getsize(os.path.join(OUT,f))>>20} MiB" for f in os.listdir(OUT)])
