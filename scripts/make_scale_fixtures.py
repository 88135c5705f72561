#!/usr/bin/env python3
"""Synthesize 3x / 10x growth fixtures from /root/testdata/sf0.1 for the
round-11 scale-growth smoke (VERDICT r10 ask #6). Dev-side tooling only —
NOT part of the library runtime.

Replica k of `documents` suffixes every token with a replica-unique
letter pair (stays inside the \\p{L} tokenizer alphabet), so replicas are
NOT near-duplicates of the originals and dedup candidate volume grows
linearly with the corpus, not quadratically (a rotation or verbatim copy
would make every replica a near-dup pair and turn the smoke into a
duplicate-blowup test instead of a growth test). Vocabulary scales with
the corpus, which is exactly what the adaptive rules (df caps, sqrt(n)
IVF centroids, LSH plane counts) are supposed to track.

Replica k of `embeddings` adds a small deterministic per-vector shift so
no two replicas are byte-identical vectors (LSH buckets/IVF cells fill
linearly, not with stacked duplicates).

All other tables copy through unchanged so any query the sweep touches
finds its inputs.

Usage: make_scale_fixtures.py [outRoot]   (default /root/repo/scratch/scale)
"""
import duckdb, os, shutil, sys

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/scale"
LETTERS = "abcdefghij"

con = duckdb.connect()
n_docs, max_doc = con.execute(
    f"SELECT count(*), max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()
n_vecs, max_vec = con.execute(
    f"SELECT count(*), max(vec_id) FROM '{SRC}/embeddings.parquet'").fetchone()
doc_span, vec_span = max_doc + 1, max_vec + 1

for scale in (3, 10):
    out = os.path.join(OUT, f"x{scale}")
    os.makedirs(out, exist_ok=True)
    doc_parts = []
    for k in range(scale):
        if k == 0:
            doc_parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'")
        else:
            suf = "q" + LETTERS[k % 10] + ("z" + LETTERS[k // 10] if k >= 10 else "")
            doc_parts.append(
                f"SELECT doc_id + {k * doc_span} AS doc_id, "
                f"regexp_replace(text, '([^ ]+)', '\\1{suf}', 'g') AS text, "
                f"lang, source, "
                f"length(regexp_replace(text, '([^ ]+)', '\\1{suf}', 'g'))::BIGINT AS n_chars "
                f"FROM '{SRC}/documents.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    vec_parts = []
    for k in range(scale):
        if k == 0:
            vec_parts.append(f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'")
        else:
            vec_parts.append(
                f"SELECT vec_id + {k * vec_span} AS vec_id, "
                f"list_transform(embedding, x -> (x + 0.0009 * (((vec_id * 31 + {k} * 13) % 17) - 8))::FLOAT) AS embedding, "
                f"label FROM '{SRC}/embeddings.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(vec_parts)}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    nd = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    nv = con.execute(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"x{scale}: {nd} docs ({n_docs} base), {nv} vecs ({n_vecs} base) -> {out}")
