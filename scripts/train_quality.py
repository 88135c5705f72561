#!/usr/bin/env python3
"""Offline (build-time) trainer for q208's frozen quality classifier.

The fastText/CCNet play, distilled: a logistic-regression quality
classifier is trained OFFLINE against the rule-based cleaning verdict
(q79's length / stopword-density / language-agreement chain — the
teacher), and only the frozen weight vector ships in the engine. At
run time the model is a broadcast-free, shuffle-free dot product over
six deterministic per-doc features — one codegen pass over the corpus,
which is exactly how a learned quality gate runs at 100 TB (CCNet runs
fastText the same way: weights on every worker, score map-side).

Features are computed HERE with the same formulas (and the same 6-dec
rounding) the Scala query and its DuckDB oracle use, so the frozen
weights mean the same thing in all three places:
  x1 = round(least(n_tokens, 200) / 200, 6)        length signal
  x2 = round(n_stop / max(n_tokens, 1), 6)         stopword density
  x3 = lang_match (marker cascade == lang ? 1 : 0) language agreement
  x4 = round(1 - len(no-space text)/len(text), 6)  space ratio
  x5 = round(n_letter_chars/(10*max(n_tokens,1)),6) mean token length
Teacher label = the q79 rule chain minus the exact-dup stage (dup
removal is the dedup family's job; the classifier is the SOFT quality
gate that follows it).

Training is full-batch gradient descent, zero init, fixed step and
iteration count — no RNG anywhere, so the emitted weights are
reproducible bit-for-bit from the fixture.

Run: python3 scripts/train_quality.py [sfDir]  (driver-side duckdb +
numpy only; the engine itself has no python dependency)
"""
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

FEAT_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, text,
    len(list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
      x -> x <> '')) AS n_tokens,
    len(list_filter(string_split_regex(text, '[^\\p{{L}}]+'),
      x -> list_contains(['the','a','of','and','to','in','is','on'], x)))
      AS n_stop,
    length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_letters,
    ' ' || text || ' ' AS pt
  FROM '{SF}/documents.parquet'),
feat AS (
  SELECT doc_id,
    round(least(n_tokens, 200) / 200.0, 6) AS x1,
    round(n_stop / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS x2,
    CASE WHEN (CASE
        WHEN contains(pt, ' der ') OR contains(pt, ' und ')
          OR contains(pt, ' das ') THEN 'de'
        WHEN contains(pt, ' le ') OR contains(pt, ' la ')
          OR contains(pt, ' et ') THEN 'fr'
        WHEN contains(pt, ' el ') OR contains(pt, ' los ')
          OR contains(pt, ' es ') THEN 'es'
        WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
        ELSE 'en' END) = lang THEN 1.0 ELSE 0.0 END AS x3,
    round(1.0 - length(replace(text, ' ', ''))
      / CAST(length(text) AS DOUBLE), 6) AS x4,
    round(n_letters / (10.0 * greatest(n_tokens, 1)), 6) AS x5,
    -- teacher: the q79 rule chain minus the dup stage
    CASE WHEN n_tokens >= 20
      AND n_stop / CAST(greatest(n_tokens, 1) AS DOUBLE) >= 0.02
      AND (CASE
        WHEN contains(pt, ' der ') OR contains(pt, ' und ')
          OR contains(pt, ' das ') THEN 'de'
        WHEN contains(pt, ' le ') OR contains(pt, ' la ')
          OR contains(pt, ' et ') THEN 'fr'
        WHEN contains(pt, ' el ') OR contains(pt, ' los ')
          OR contains(pt, ' es ') THEN 'es'
        WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
        ELSE 'en' END) = lang
      THEN 1 ELSE 0 END AS y
  FROM base)
SELECT x1, x2, x3, x4, x5, y FROM feat ORDER BY doc_id
"""

rows = duckdb.sql(FEAT_SQL).fetchnumpy()
X = np.column_stack([np.ones(len(rows["x1"]))] +
                    [rows[f"x{i}"] for i in range(1, 6)])
y = rows["y"].astype(np.float64)
print(f"{len(y)} docs, keep rate {y.mean():.4f}")

w = np.zeros(6)
lr = 2.0
for it in range(4000):
    z = X @ w
    p = 1.0 / (1.0 + np.exp(-z))
    g = X.T @ (p - y) / len(y)
    w -= lr * g
    if it % 1000 == 0:
        acc = ((z >= 0) == (y == 1)).mean()
        print(f"iter {it}: loss={-np.mean(y*np.log(p+1e-12)+(1-y)*np.log(1-p+1e-12)):.4f} acc={acc:.4f}")

z = X @ w
acc = ((z >= 0) == (y == 1)).mean()
print(f"final train acc {acc:.4f}")
print("// frozen weights (scripts/train_quality.py @ " + SF + "):")
print("  private val qw = Array(" +
      ", ".join(f"{v!r}" for v in w) + ")")
