#!/usr/bin/env python3
"""Build the 10x scale-smoke dataset: replicate sf0.1 preserving schema
exactly (events ts is timestamp[ns]), shifting id columns per replica and
PERTURBING document text per replica — identical copies would inflate the
duplicate rate 10x and explode the near-dedup candidate space, which no real
corpus scale-up does.  Usage:
    python3 tools/make_scale_smoke.py /root/testdata/sf0.1 /tmp/sf1x10 10
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

REPLICATED = {
    # table -> (id columns to shift, text column or None)
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}

# Cosine of each embedding replica against its source vector.  Chosen the
# same way the text perturbation chose "every 7th token": decisively UNDER
# the suite's near-dup threshold (cosineNearDupPairs/semanticDedup use 0.35,
# and the corpus's natural nearest-neighbor cosines reach ~0.48), so
# replication adds ~linear near-dup mass instead of manufacturing
# C(replicas,2) pairs per source vector — while keeping each replica a
# same-cloud novel point rather than a verbatim copy.  Verbatim copies made
# every scaled recall receipt saturate artificially: a query's true top-k
# was its own exact clones, which share every SRP signature and every IVF
# cell.  At 0.30 the true top-k over the scaled corpus is a genuine mix of
# natural neighbors and chance-close replicas that the index has to earn.
EMB_REPLICA_COS = 0.30


def perturb_embeddings(vecs, r):
    """Replica r of the embedding matrix: exact-cosine rotation of each
    vector toward a seeded random direction orthogonalized against it
    (Gram-Schmidt), preserving each vector's norm.  Deterministic per
    replica (legacy RandomState is version-pinned by numpy)."""
    E = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    U = E / np.maximum(norms, 1e-12)
    rng = np.random.RandomState(0x5EED0 + r)
    G = rng.standard_normal(E.shape)
    G -= (G * U).sum(axis=1, keepdims=True) * U
    G /= np.maximum(np.linalg.norm(G, axis=1, keepdims=True), 1e-12)
    c = EMB_REPLICA_COS
    return ((c * U + np.sqrt(1.0 - c * c) * G) * norms).astype(np.float32)

def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        t = name[:-len(".parquet")]
        tbl = pq.read_table(f"{src}/{name}")
        if t not in REPLICATED:
            pq.write_table(tbl, f"{dst}/{name}")
            continue
        id_cols, text_col = REPLICATED[t]
        shift = {c: pc.max(tbl[c]).as_py() + 1 for c in id_cols}
        parts = []
        for r in range(n):
            part = tbl
            for c in id_cols:
                if r > 0:
                    idx = part.schema.get_field_index(c)
                    shifted = pc.add(part[c], shift[c] * r)
                    part = part.set_column(idx, part.schema.field(c), shifted)
            if text_col is not None and r > 0:
                # Replace every 7th token (phase shifted per replica), not a
                # single appended marker: one appended token leaves replica
                # pairs sharing (n-2)/n of their 3-gram shingles -> Jaccard
                # ~0.95, which MANUFACTURES ~C(replicas,2) near-dup pairs per
                # source doc and inflates every shingle's df. Disrupting 1/7
                # of positions kills ~3/7 of shingles per pair (Jaccard ~0.4,
                # under any dedup threshold in use) while keeping most of the
                # shingle-frequency structure scaling naturally.
                idx = part.schema.get_field_index(text_col)
                phase = r % 7
                perturbed = pa.array(
                    [" ".join(
                        (f"r{r}x{i}" if i % 7 == phase else t)
                        for i, t in enumerate(s.split(" ")))
                     for s in part[text_col].to_pylist()],
                    type=pa.string())
                part = part.set_column(idx, part.schema.field(text_col), perturbed)
            if t == "embeddings" and r > 0:
                idx = part.schema.get_field_index("embedding")
                vecs = perturb_embeddings(part["embedding"].to_pylist(), r)
                emb = pa.array([row.tolist() for row in vecs],
                               type=part.schema.field("embedding").type)
                part = part.set_column(idx, part.schema.field("embedding"), emb)
            parts.append(part)
        out = pa.concat_tables(parts)
        # keep row groups at the source table's size: one giant row group
        # would give Spark a single scan partition for 10x the data (parquet
        # splits at row-group boundaries), serializing every map-heavy phase
        pq.write_table(out, f"{dst}/{name}", row_group_size=max(tbl.num_rows, 1))
        print(t, out.num_rows)

if __name__ == "__main__":
    main()
