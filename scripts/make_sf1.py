#!/usr/bin/env python3
"""Dev-only: inflate /root/testdata/sf0.1 10x into target/sf1.0.

Events replicate as 10 symbol universes (event_type gets a _rN suffix for
replicas 1..9) with event_id/user_id offset per replica so ids stay unique
and ingestion-ordered; timestamps are shared across replicas (more symbols,
same window — how a bigger exchange feed actually scales). Documents
replicate with per-replica doc_id offsets and a replica token appended to
the text so replicas are near- but not exact duplicates. Other tables copy
unchanged. Used for the sf1.0-scale Spark-vs-DuckDB oracle pass; never a
library dependency.
"""
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "target/sf1.0")
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DST.mkdir(parents=True, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT event_id + r.r * 10000000000 AS event_id,
         ts,
         user_id + r.r * 1000000000 AS user_id,
         CASE WHEN r.r = 0 THEN event_type
              ELSE event_type || '_r' || r.r END AS event_type,
         value, props
  FROM '{SRC}/events.parquet', range({REPS}) r(r)
  ORDER BY event_id
) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")

# At REPS > 10 every doc gains more near-replicas than the winnowing
# family's df cap (maxDf=10), so EVERY shared gram hash is boilerplate by
# construction and winnow_candidates/winnow_incremental emit 0 pairs on
# both engines — a vacuous cap-agreement check (round-13 verdict). The
# probe population fixes that: for a ~1% doc subset (doc_id % 97 = 0),
# five near-copies whose token stream is unique PER BASE DOC (every token
# suffixed 'q<base_id>' — a constant suffix is NOT enough: the base corpus
# draws from a ~31-word vocabulary, so constant-suffixed grams repeat
# across different bases and their df blows past the cap anyway, the
# round-14 first-attempt failure) and which differ only in a trailing
# ' zp<r>' token — each base's shared-prefix grams have df exactly 5 <=
# cap, so the keys emit real, hash-checked pairs at 100x. Probe ids sit
# at +2e9 (above the largest replica id ~991M at REPS=100) and keep the
# base residue mod 10M, so the contract queries' %5/%7 splits and +1M
# batch offsets stay collision-free (the id algebra the winnow oracle
# fix fa6bbec relies on).
probe_sql = ""
if REPS > 10:
    probe_sql = f"""
  UNION ALL
  SELECT doc_id + 2000000000 + r.r * 10000000 AS doc_id,
         regexp_replace(text, '(\\S+)',
                        '\\1q' || CAST(doc_id AS VARCHAR), 'g')
           || ' zp' || r.r AS text,
         lang, source,
         len(regexp_replace(text, '(\\S+)',
                            '\\1q' || CAST(doc_id AS VARCHAR), 'g')
             || ' zp' || r.r) AS n_chars
  FROM '{SRC}/documents.parquet', range(5) r(r)
  WHERE doc_id % 97 = 0"""

con.execute(f"""
COPY (
  SELECT * FROM (
    SELECT doc_id + r.r * 10000000 AS doc_id,
           CASE WHEN r.r = 0 THEN text
                ELSE text || ' zrep' || r.r END AS text,
           lang, source,
           CASE WHEN r.r = 0 THEN n_chars
                ELSE n_chars + len(' zrep' || r.r) END AS n_chars
    FROM '{SRC}/documents.parquet', range({REPS}) r(r)
    {probe_sql}
  ) ORDER BY doc_id
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

# Embeddings replicate too (round 16: unreplicated copies made every
# embedding-family key's 10x/100x run re-measure sf0.1 — vacuous scale
# evidence). Replicas get a deterministic per-(vector, dim, replica)
# jitter large enough (+-0.4/dim) that they are DISTINCT vectors in the
# same region, not near-dup clones — the seeded +1e6 query twins stay the
# only intentional near-dups, and the id algebra (r*1e7 offsets, %5 twin
# selection, +1e6 twin offset < 1e7) stays collision-free. Element type
# stays FLOAT[] so the parquet schema matches the source table.
con.execute(f"""
COPY (
  SELECT vec_id + r.r * 10000000 AS vec_id,
         CASE WHEN r.r = 0 THEN embedding
              ELSE CAST(list_transform(embedding, (x, i) ->
                     x + 0.05 * (((vec_id * 7 + i * 13 + r.r * 31) % 17) - 8))
                   AS FLOAT[]) END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', range({REPS}) r(r)
  ORDER BY vec_id
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ["lineitem", "orders", "customer", "supplier",
          "part", "nation", "region"]:
    shutil.copy(SRC / f"{t}.parquet", DST / f"{t}.parquet")

for t in ["events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"[make_sf1] {t}: {n} rows")
print(f"[make_sf1] wrote {DST}")
