#!/usr/bin/env python3
"""Dev-only 100x spot gate: the 5 heaviest oracle-backed keys at sf10
(100x the driver's sf0.1 — 10M events / 500k documents), proving the
PLANS survive two orders of magnitude, not just the answers.

    python3 scripts/sf10_gate.py [--skip-verify] [query ...]

Builds target/sf10 via make_sf1.py with 100 replicas, runs graft.Verify
restricted to the heavy keys, compares against DuckDB over the same
parquet, and writes CORRECTNESS_SF10.json (driver-artifact shape, plus a
spark_secs wall-time per key). Exit 0 only when all keys match.
"""
import sys
from pathlib import Path

from sf1_gate import REPO, run_gate

# The heaviest oracle-backed keys by BENCH_LOCAL medians: composed
# curation capstones (v4 adds the repeated-gram trim stage), near-dup
# clustering, the chained MTF as-of composition, the recursive
# dual-engine backtest, the ExactSubstr-style trim on its own (the
# growing-corpus production scrub whose duplicated-start mass scales
# with the seeded near-dup replicas), and BOTH incremental growing-corpus
# keys (trim_incremental / neardup_incremental: batch-vs-index at 100x
# proves the per-batch cost contract, not just the batch analytics;
# neardup_incremental is rows-only here as at driver scale — its
# ≡-full-pass restriction is LlmSpec-pinned).
HEAVY = {"dedup_clusters", "corpus_pipeline_v2", "corpus_pipeline_v3",
         "corpus_pipeline_v4", "span_dedup", "mtf_join",
         "backtest_dual_engine", "repeated_ngram_trim",
         "trim_incremental", "neardup_incremental",
         # round-13 additions: the mixture-design data card (exact oracle-
         # backed; sketch/incremental twins rows-only as at driver scale)
         # and the span-grain decontamination scrub
         "source_overlap", "source_overlap_sketch",
         "source_overlap_incremental", "contamination_scrub",
         # round-13 continuation: the winnowing fingerprint index, its
         # df-capped candidate join, and the O(batch) incremental loop —
         # the new blocking family's 100x hash evidence (all exact
         # oracle-backed); round 14 adds an under-the-df-cap probe
         # population to the sf10 corpus (make_sf1.py REPS>10) so the
         # candidate/incremental keys emit REAL pairs at 100x instead of
         # the vacuous 0-row cap agreement of round 13
         "winnow_fingerprint", "winnow_candidates", "winnow_incremental",
         # round 14: the Bloom-prefiltered incremental paragraph dedup —
         # span grain like span_dedup, plus the nominate-verify exactness
         # claim is worth 100x hash evidence
         "span_dedup_bloom",
         # round 14 continuation: the four document-grain round-14 keys
         # (prototype_prune is excluded deliberately — make_sf1 copies
         # embeddings unreplicated, so an sf10 run would re-measure sf0.1).
         # heavy_hitters proves the CMS-nominate exchange claim at a 27M-
         # token stream; pack_shards_lpt proves the histogram-offset rank
         # against DuckDB's naive single window at 500K rows; url_dedup's
         # argmax election and source_divergence's token-grain pair
         # explosion get their 100x hash evidence
         "heavy_hitters", "pack_shards_lpt", "url_dedup",
         "source_divergence", "url_dedup_incremental",
         # round 15: the line-grain quality pass (explode + one doc-grain
         # agg — the only new oracle-backed key) plus the perceptual
         # dedup pair (rows-only here as at driver scale; their ≡-pins
         # are LlmSpec's) — banded-join 100x evidence at image grain.
         # perceptual_neardup's ~27M pairs at sf10 are the TRUE answer on
         # this corpus: make_sf1 replicates each doc ~100x, so every
         # replica family is a C(100,2) near-dup clique (~5k families x
         # 4950 pairs) — quadratic by corpus construction, not a plan
         # blowup; production caps template families via maxBucket, and
         # perceptual_incremental carries the O(batch)-decisions 100x
         # evidence (233k rows for a 233k-doc batch).
         "line_quality", "perceptual_neardup", "perceptual_incremental",
         # round 15 capstone: the 10-stage RefinedWeb-shaped chain
         "corpus_pipeline_v5",
         # round 16: make_sf1 now REPLICATES embeddings (jittered,
         # distinct vectors — previously copied unreplicated, so every
         # embedding key's 100x run re-measured sf0.1). The ANN ladder
         # gets its 100x evidence at 240k vectors: ann_topk/embed_kmeans/
         # prototype_prune are oracle-backed anchors; ann_lsh/ann_ivf/
         # ann_pq/ann_ivf_pq/embed_pq are rows-only here as at driver
         # scale (their recall-vs-brute pins are LlmSpec's).
         # semantic_dedup and embed_pipeline stay excluded at THIS scale:
         # their within-cell pair joins are O(c^2) and k is fixed at 8 by
         # the contract query, so 100x data means 10,000x pairs (~3.6B
         # cosines) — measuring a fixed-k query at 100x measures the
         # wrong thing (production scales k with the corpus; SemDeDup
         # uses ~50k cells at web scale). Their 10x hash evidence is in
         # CORRECTNESS_SF1.
         "ann_topk", "embed_kmeans", "prototype_prune",
         "ann_lsh", "ann_ivf", "ann_pq", "ann_ivf_pq", "embed_pq",
         # round 16: lake-maintenance parity at 100x — the two heaviest
         # financial keys without sf10 entries (incremental checkpointed
         # aggregation; per-TF completeness audit)
         "tf_incremental", "audit_derived"}


def main() -> int:
    # cap the oracle engine by default at this scale: an unbounded DuckDB
    # evaluation of the recursive-CTE capstone oracles at 500K docs draws
    # the whole 128 GiB box and the OS kills the gate, losing every key's
    # result (override via GATE_DUCK_MEM)
    import os
    os.environ.setdefault("GATE_DUCK_MEM", "60GB")
    args = [a for a in sys.argv[1:]]
    only = {a for a in args if not a.startswith("--")} or HEAVY
    return run_gate(REPO / "target" / "sf10", REPO / "target" / "verify_sf10",
                    REPO / "CORRECTNESS_SF10.json", reps=100, label="sf10",
                    skip_verify="--skip-verify" in args, only=only)


if __name__ == "__main__":
    sys.exit(main())
