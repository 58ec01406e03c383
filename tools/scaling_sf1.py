"""Second-decade scaling checkpoint: sf0.1 -> sf1 (r8, VERDICT item 6).

The 0.01->0.1 step has twice been saved by density caveats; this
harness measures the NEXT 10x step for the heaviest operators against
the derived sf1 tables (tools/make_sf1.py -> .sf1/, structure-
preserving 10x copies with fresh vocabulary/users per copy) and
rewrites the '## sf1 checkpoint' section of SCALING.md. Same
prepared-plan best-of-3 methodology as tools/scaling.py; both source
dirs are single-file parquet, so the split regime is identical on
both sides of the ratio.

Usage: python tools/make_sf1.py && python tools/scaling_sf1.py
"""

from __future__ import annotations

import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timescaledb_event_streamer_spark.plans.registry import all_queries
from timescaledb_event_streamer_spark.session import get_spark

REPO = Path(__file__).resolve().parents[1]
SF01 = "/root/testdata/sf0.1"
SF1 = str(REPO / ".sf1")

#: the heaviest operators by extended-bench time + the two sampled
#: forms kept as constancy controls; every entry loads only the three
#: tables make_sf1.py actually scales (documents/events/embeddings)
REPS = [
    ("dedup_sparse_cosine", "calibration-sampled sparse cosine (expect ~1x: sample is constant-size)"),
    ("dedup_sparse_cosine_capped", "df-capped shingle sparse cosine"),
    ("cdc_pgoutput_roundtrip", "binary frame codec roundtrip"),
    ("cdc_pgoutput_messages", "admin frame codec"),
    ("pipeline_training_corpus", "composed admission ledger"),
    ("ts_asap_smooth", "bounded smoothing search"),
    ("text_bpe_learn", "iterative merge induction"),
    ("dedup_minhash_estimate_audit", "minhash estimator calibration"),
    ("ann_nprobe_sweep", "recall-vs-scan-fraction sweep"),
    ("text_substring_dedup", "dup-window coverage fold"),
    ("cdc_replication_handshake", "protocol-v3 reply codec"),
    ("text_bigram_lm_score", "bigram-keyed LM joins"),
    ("text_rake_keywords", "regex-phrase RAKE scoring"),
    ("text_hapax_stats", "vocab-grain richness reduce"),
    ("text_zipf_fit", "ranked log-log OLS reduce"),
    # r9 additions: the heaviest new plans
    ("ann_ivfpq_nprobe_sweep", "amortized-build PQ tuning sweep"),
    ("ann_graph_beam_search", "kNN-graph build + beam routing"),
    ("text_trigram_backoff_score", "held-out 3-gram backoff joins"),
    ("dedup_winnowing", "winnowing fingerprint join"),
    ("corpus_quality_feature_matrix", "one-scan feature assembly"),
    ("media_flac_pcm_stats", "FLAC encode+decode Python seam"),
    ("corpus_vocab_growth", "Heaps-curve first-occurrence reduce"),
    # r10 additions: remaining r9 heavies (>0.5s at sf0.1) + the
    # verdict-named trio + the new lossy-audio seam
    ("ts_kama", "adaptive-alpha sequential fold"),
    ("ts_keltner_channels", "ATR+EMA channel windows"),
    ("ts_supertrend", "sequential band-flip fold"),
    ("ts_adx", "Wilder smoothing chain"),
    ("ts_volume_profile", "price-bucket histogram + value area"),
    ("dedup_incremental_minhash", "new-batch-vs-index banded join"),
    ("media_bmp_dhash", "BMP encode+decode+dhash Python seam"),
    ("media_adpcm_pcm_stats", "ADPCM lossy encode+decode Python seam"),
    # r11 additions: the r10 registrations with nontrivial shuffle
    # shape, the three de-single-partitioned doc-grain ranks (after
    # the rework — the before/after delta lives in the prose), the
    # B105-B115 family's heaviest representative, and the new probes
    ("dedup_bucket_skew_audit", "per-band bucket-mass pre-flight"),
    ("dedup_survivorship", "cluster survivor election + ledger"),
    ("embedding_label_centroid_confusion", "dim-keyed centroid confusion"),
    ("corpus_shard_planner", "two-pass distributed rank + serpentine"),
    ("text_vocab_concentration", "sort+limit top-k concentration"),
    ("corpus_curriculum_order", "two-pass rank + closed-form ntile"),
    ("ts_parabolic_sar", "sequential stop-and-reverse fold (B105-115 rep)"),
    ("media_mp4_probe", "ISO-BMFF box-walk codegen probe"),
    # r11 late additions: the heaviest new plans
    ("media_container_router", "8-format sniff+route+probe union"),
    ("dedup_modality_agreement", "minhash-vs-embedding cross audit"),
    ("dedup_semdedup", "seeded-cluster semantic dedup"),
    ("text_heaps_fit", "bigram first-occurrence Heaps reduce"),
    ("ann_hamming_topk", "sign-sketch Hamming scan + rerank"),
    ("media_ogg_probe", "Ogg lacing-offset codec probe"),
    ("media_id3_text_frames", "ID3 frame-walk text extraction"),
    ("dedup_hamming_blocking", "sign-prefix block audit"),
    ("text_decontamination_near", "bench-vs-corpus banded join"),
    # ann_mutual_knn_audit is NOT here: it composes on E5's exact
    # pairwise build (quadratic at toy SF by construction; the scale
    # path is the banded-LSH candidate swap, the same adjudication
    # that keeps E5 itself out of this list)
]

SECTION = "## sf1 checkpoint (second decade, r8)"


def _time(qs, name, sf_dir):
    df = qs[name](SPARK, sf_dir)
    df.write.mode("overwrite").format("noop").save()  # warm + codegen
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    global SPARK
    SPARK = get_spark("scaling-sf1")
    qs = all_queries()
    rows = []
    for name, shape in REPS:
        t01 = _time(qs, name, SF01)
        t1 = _time(qs, name, SF1)
        ratio = round(t1 / max(t01, 1e-9), 1)
        rows.append((name, shape, t01, t1, ratio))
        print(f"{name}: sf0.1 {t01}s  sf1 {t1}s  x{ratio}")

    lines = [
        SECTION,
        "",
        "The 0.01->0.1 step has twice been rescued by density caveats, so",
        "the heaviest operators get a SECOND decade: sf1 = 10x sf0.1,",
        "derived by tools/make_sf1.py (structure-preserving copies — copy i",
        "suffixes every document token, so vocabulary and shingle space",
        "grow 10x instead of planting duplicate cliques; events keep their",
        "time span, so that axis measures per-bucket density; embeddings",
        "are near-duplicated with a one-coordinate nudge). Regenerate with",
        "`python tools/make_sf1.py && python tools/scaling_sf1.py`.",
        "Both sides are single-file parquet (same split regime), best-of-3",
        "prepared plans on local[32]. `x(0.1->1)` near-or-under 10 is",
        "linear-or-better; the sampled sparse-cosine row is a constancy",
        "control (its calibration sample is fixed-size by design).",
        "",
        "| operator | shape | sf0.1 | sf1 | x(0.1->1) |",
        "| --- | --- | --- | --- | --- |",
    ]
    for name, shape, t01, t1, ratio in rows:
        lines.append(f"| {name} | {shape} | {t01} | {t1} | {ratio} |")
    lines.extend(
        [
            "",
            "Reading the r8 numbers: everything lands well under the 10x",
            "linear bar. `dedup_sparse_cosine` DROPS at sf1 because its",
            "fixed-size calibration sample now spans ten disjoint",
            "vocabularies, thinning every posting list — the bound doing",
            "its job. The largest ratio (`dedup_minhash_estimate_audit`)",
            "tracks the collision set, which grows with near-dup pair",
            "count (10x per-copy pairs) on top of the 10x corpus scan —",
            "still sublinear because the banded join never goes all-pairs.",
            "`text_bpe_learn` is flat: its state is word-TYPE grain and",
            "rounds are driver-bounded, exactly the Heaps-law design",
            "claim. The pgoutput decode and training-corpus ledger ride",
            "the single-file scan serialization documented for the 1-split",
            "watchlist above (both sides single-split, so the ratio is",
            "honest).",
            "",
            "r11 rows. The three de-single-partitioned doc-grain ranks",
            "(`corpus_shard_planner`, `text_vocab_concentration`,",
            "`corpus_curriculum_order`) hold 1.2-1.7x across the decade.",
            "The before/after ledger for the F52 rework (one-off A/B of the",
            "old single-window form vs the two-pass rank, same box):",
            "sf0.1 0.40s -> 0.91s, sf1 0.39s -> 0.88s — at these SFs both",
            "forms are FIXED-COST dominated (per-partition scheduling +",
            "shuffle setup; neither moves across the decade), so the",
            "two-pass form pays ~0.5s of constant overhead for its two extra",
            "exchanges. The win is not local latency, it is the plan shape:",
            "the old form funnels EVERY document through one WindowExec task",
            "(the warning the gate now forbids — tools/plan_audit.py), which",
            "at 100 TB is billions of rows through one thread; the two-pass",
            "form's per-task work stays 1/N at any corpus size. The same",
            "trade as broadcast-vs-sort-merge: invisible at toy SF,",
            "decisive at scale. `media_mp4_probe` is the slowest new row",
            "(linear within noise): ~60 us/row wall on local[32] (~2 ms CPU)",
            "of JVM-side hex walking — a 20-step bounded fold over ~700",
            "header bytes per payload (interpreted Catalyst HOF — the",
            "interpreter, not the walk, is the cost), embarrassingly",
            "parallel, never",
            "touching sample data; the bound is MP4_MAX_BOXES x header",
            "bytes regardless of media size, which is the entire point of",
            "a probe-before-decode posture; `media_container_router` is",
            "~its superset (seven synth+probe pipelines unioned).",
            "`ts_volume_profile`'s ratio tracks its per-day price histogram",
            "growing with the 10x per-bucket event density (events keep",
            "their 30-day span at sf1), not a plan defect — its exchanges",
            "stay constant. `dedup_modality_agreement` rides the banded",
            "candidate set (2.7x). `dedup_semdedup` is the one above-linear",
            "r11 row: its within-cluster pair mass grows with DUPLICATE",
            "density (sf1 plants ~10 near-copies per original and they all",
            "assign to the same centroid — finding them is the operator's",
            "job), so pairs grow ~5x on top of the 10x scan; the fix that",
            "matters is structural and landed with the row — the",
            "vector-grain assignment frame is persisted, or the",
            "broadcast-seed scan re-executes under BOTH self-join sides",
            "(measured 49x before the pin, 15.4x after; the paper's own",
            "remedy for pair mass, seeds proportional to N, is this",
            "operator's seed rule already). `dedup_hamming_blocking`'s",
            "12.4x is the same story told by a FIXED key space: with",
            "_HB_BITS=12 the 4096 prefix blocks absorb 10x the vectors,",
            "so within-block pair mass grows quadratically (and sf1's",
            "near-duplicated embeddings concentrate prefixes further) —",
            "at a larger corpus the prefix LENGTHENS (20-24 bits at",
            "100 TB) to hold block sizes constant, which is the knob the",
            "audit's block_size column exists to tune.",
            "ann_mutual_knn_audit is NOT",
            "tabled: it composes on E5's exact pairwise build, quadratic at",
            "toy SF by construction — the scale path is the banded-LSH",
            "candidate swap (the standing E5 adjudication).",
        ]
    )
    block = "\n".join(lines) + "\n"

    md = (REPO / "SCALING.md").read_text()
    if SECTION in md:
        md = re.sub(
            re.escape(SECTION) + r".*?(?=\n###? |\Z)", block, md, flags=re.S
        )
    else:
        md = md.rstrip() + "\n\n" + block
    (REPO / "SCALING.md").write_text(md)
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
