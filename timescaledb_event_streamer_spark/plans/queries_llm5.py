"""LLM / multimodal pipeline queries, part 5 (SURVEY.md §2, round-5
continuation 3): audio silence segmentation over the real PCM decode
path, and corpus word-association mining.

Registered AFTER the round-5 certification-waitlist freeze, so the
rotation (plans/registry.py) schedules these behind the 47 queries
already waiting for driver certification — they certify in round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread


@register(
    "media_wav_silence",
    family="multimodal",
    doc="Silence-run segmentation from WAV PCM bytes (G7, extending "
    "G6's codec-free real decode): per payload, the leading/trailing "
    "silence trim offsets, silence-separated loud-segment count, "
    "longest silent run, and total silent samples — the features an "
    "audio training-data pipeline needs to trim and filter clips "
    "before a decode fleet ever runs. One narrow codegen projection "
    "per row, single capped integer left-fold, no shuffle. The "
    "oracle re-derives every statistic from the waveform generator "
    "formula via gaps-and-islands SQL — a completely different "
    "construction (windows over exploded samples vs a sequential "
    "fold), so a fold-state bug cannot cancel out.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   event_id % 32 + 8 AS n,
                   list_transform(
                       range(event_id % 32 + 8),
                       i -> CASE
                           WHEN (event_id * 6151 + i * 32917) % 65536 >= 32768
                           THEN (event_id * 6151 + i * 32917) % 65536 - 65536
                           ELSE (event_id * 6151 + i * 32917) % 65536
                       END) AS s
            FROM events
        ),
        samp AS (
            SELECT event_id, n, i, abs(s[i + 1]) < 8192 AS silent
            FROM src, unnest(range(n)) AS u(i)
        ),
        flag AS (
            SELECT *,
                   lag(silent) OVER (
                       PARTITION BY event_id ORDER BY i
                   ) AS prev_silent
            FROM samp
        ),
        runs AS (
            SELECT event_id,
                   i - row_number() OVER (
                       PARTITION BY event_id ORDER BY i
                   ) AS grp
            FROM samp WHERE silent
        ),
        longest AS (
            SELECT event_id, CAST(max(len) AS BIGINT) AS longest
            FROM (
                SELECT event_id, grp, count(*) AS len
                FROM runs GROUP BY 1, 2
            ) GROUP BY 1
        ),
        agg AS (
            SELECT event_id,
                   any_value(n) AS n,
                   CAST(coalesce(min(i) FILTER (NOT silent),
                                 any_value(n)) AS BIGINT) AS lead_silence,
                   CAST(coalesce(any_value(n) - 1 - max(i) FILTER (NOT silent),
                                 any_value(n)) AS BIGINT) AS trail_silence,
                   CAST(count(*) FILTER (
                       NOT silent AND (prev_silent IS NULL OR prev_silent)
                   ) AS BIGINT) AS n_segments,
                   CAST(count(*) FILTER (silent) AS BIGINT) AS n_silent
            FROM flag GROUP BY event_id
        )
        SELECT a.event_id AS media_id,
               true AS is_pcm_wav,
               CAST(a.n AS BIGINT) AS n_samples,
               a.lead_silence,
               a.trail_silence,
               a.n_segments,
               coalesce(l.longest, 0) AS longest_silence,
               a.n_silent
        FROM agg a LEFT JOIN longest l ON a.event_id = l.event_id
    """,
)
def media_wav_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        synthesize_wav_pcm,
        wav_silence_segments,
    )

    events = load(spark, sf_dir, "events")
    return wav_silence_segments(synthesize_wav_pcm(events))


#: co-occurrence window: a pair is counted when the two tokens are at
#: most this many positions apart (the skip-gram window of word2vec /
#: PMI association mining)
_COOC_WINDOW = 3


@register(
    "text_cooccurrence_pmi",
    family="text",
    doc="Sliding-window word co-occurrence with PMI scoring (F27) — "
    "the corpus association-mining step (collocation discovery, "
    "word2vec-style skip-gram statistics) over the documents table: "
    "pairs of tokens within a 3-position window, canonicalized "
    "unordered, scored pmi = log2(p(a,b)/(p(a)p(b))). Pair "
    "generation is a nested in-row transform + flatten (pure "
    "codegen — NO positional self-join, which would shuffle the "
    "corpus once per window offset); marginal joins are keyed on "
    "the word (AQE absorbs stopword skew) and the two totals fold "
    "back as 1-row broadcasts. Output is the deterministic top-200 "
    "distributed ordered take by (count, pair). Float discipline: "
    "PMI is one log2 over a pinned division order of exact integer "
    "counts, rounded 6 — bit-stable across engines and partition "
    "orders.",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        pairs AS (
            SELECT least(toks[i + 1], toks[i + 1 + d]) AS w1,
                   greatest(toks[i + 1], toks[i + 1 + d]) AS w2
            FROM t,
                 unnest(range(len(toks) - 1)) AS u(i),
                 unnest(range(1, least({_COOC_WINDOW},
                                       len(toks) - 1 - i) + 1)) AS v(d)
            WHERE len(toks) >= 2
        ),
        pc AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
            FROM pairs GROUP BY 1, 2
        ),
        marg AS (
            SELECT tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1
        ),
        tot AS (
            SELECT (SELECT sum(c) FROM marg) AS t_tokens,
                   (SELECT sum(pair_count) FROM pc) AS t_pairs
        )
        SELECT w1, w2, pair_count,
               m1.c AS w1_count,
               m2.c AS w2_count,
               round(log2((pair_count * 1.0 / t_pairs)
                          / ((m1.c * 1.0 / t_tokens)
                             * (m2.c * 1.0 / t_tokens))), 6) AS pmi_bits
        FROM pc
        JOIN marg m1 ON pc.w1 = m1.tok
        JOIN marg m2 ON pc.w2 = m2.tok
        CROSS JOIN tot
        ORDER BY pair_count DESC, w1, w2
        LIMIT 200
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the in-row pair explosion is the expensive projection,
    # and the single-split local parquet would run it on one core
    # (measured 0.97s -> 0.70s at sf0.1; no-op on a real multi-split
    # table)
    docs = spread(load(spark, sf_dir, "documents"))
    k = _COOC_WINDOW
    toks = F.split("text", " ")
    pairs = (
        docs.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(sequence(0, size(t) - 2), i -> "
                        f"transform(sequence(1, least({k}, size(t) - 1 - i)), "
                        "d -> struct(least(t[i], t[i + d]) AS w1, "
                        "greatest(t[i], t[i + d]) AS w2)))"
                    )
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    marg = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pc.agg(F.sum("pair_count").alias("t_pairs")).crossJoin(
        marg.agg(F.sum("c").alias("t_tokens"))
    )
    m1 = marg.select(F.col("tok").alias("w1"), F.col("c").alias("w1_count"))
    m2 = marg.select(F.col("tok").alias("w2"), F.col("c").alias("w2_count"))
    scored = (
        pc.join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            "w2_count",
            F.round(
                F.log2(
                    (F.col("pair_count") * 1.0 / F.col("t_pairs"))
                    / (
                        (F.col("w1_count") * 1.0 / F.col("t_tokens"))
                        * (F.col("w2_count") * 1.0 / F.col("t_tokens"))
                    )
                ),
                6,
            ).alias("pmi_bits"),
        )
    )
    return scored.orderBy(
        F.col("pair_count").desc(), "w1", "w2"
    ).limit(200)


#: epoch-shuffle geometry: 3 training epochs over 8 dataloader shards
_N_EPOCHS = 3
_N_SHARDS = 8


@register(
    "corpus_epoch_shuffle",
    family="text",
    doc="Deterministic epoch-salted shard assignment (F28) — the "
    "distributed-dataloader shuffle: for each training epoch, every "
    "document maps to a shard via md5(doc_id ':' epoch), so (a) the "
    "assignment is reproducible from the doc id alone (any worker "
    "can recompute its shard list without coordination or a "
    "materialized permutation), (b) consecutive epochs see "
    "different groupings (the salt), and (c) shards stay balanced "
    "by hash uniformity. Output is the per-(epoch, shard) manifest "
    "a training job reads: doc and char totals. One scan with an "
    "in-row 3-way epoch unfold, one (epoch, shard) reduce — at "
    "100 TB this replaces a full-corpus sort-based shuffle with a "
    "stateless hash, the standard shard-assignment trick.",
    oracle=f"""
        WITH assigned AS (
            SELECT e.epoch,
                   CAST(('0x' || substr(md5(doc_id || ':' || e.epoch),
                                        1, 8)) AS BIGINT)
                       % {_N_SHARDS} AS shard,
                   n_chars
            FROM documents,
                 (SELECT unnest(range({_N_EPOCHS})) AS epoch) e
        )
        SELECT epoch, shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        FROM assigned
        GROUP BY 1, 2
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))
    ).alias("epoch")
    assigned = docs.select("doc_id", "n_chars", epochs).select(
        "epoch",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("doc_id").cast("string"),
                            F.col("epoch").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _N_SHARDS
        ).alias("shard"),
        "n_chars",
    )
    return assigned.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )


@register(
    "corpus_leakage_safe_split",
    family="text",
    doc="Leakage-safe train/val/test split (F29): the fold is hashed "
    "from the NEAR-DUP CLUSTER id (D7's connected components), not "
    "the document id, so near-duplicate documents can never straddle "
    "train and eval — the contamination a doc-keyed split silently "
    "allows. Singleton docs use their own id. 80/10/10 by "
    "md5(group) % 10; the zero-violation invariant (no group in two "
    "splits, true by construction since fold is a function of the "
    "group) is EMITTED and re-derived by the oracle, so the output "
    "itself proves the guarantee. Plan: D7's bounded shingle-join + "
    "label propagation for clusters, one doc-grain left join, one "
    "(split, source) reduce + a group-grain distinct for the proof "
    "column.",
    oracle="""
        WITH RECURSIVE
        s0 AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i + 1 : i + 5], ' ') AS s
            FROM s0, unnest(range(len(toks) - 4)) AS u(i)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        dup AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN sz x ON c.doc_a = x.doc_id
            JOIN sz y ON c.doc_b = y.doc_id
            WHERE round(c.n_inter * 1.0 / (x.n + y.n - c.n_inter), 6) >= 0.3
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM dup
            UNION SELECT doc_b, doc_a FROM dup
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src
        ),
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
        assigned AS (
            SELECT d.doc_id, d.source, d.n_chars,
                   coalesce(cc.cluster_id, d.doc_id) AS grp,
                   CASE
                       WHEN CAST(('0x' || substr(
                           md5(CAST(coalesce(cc.cluster_id, d.doc_id)
                                    AS VARCHAR)), 1, 8)) AS BIGINT)
                            % 10 < 8 THEN 'train'
                       WHEN CAST(('0x' || substr(
                           md5(CAST(coalesce(cc.cluster_id, d.doc_id)
                                    AS VARCHAR)), 1, 8)) AS BIGINT)
                            % 10 = 8 THEN 'val'
                       ELSE 'test'
                   END AS split
            FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
        ),
        viol AS (
            SELECT CAST(count(*) AS BIGINT) AS n
            FROM (
                SELECT grp FROM assigned
                GROUP BY grp HAVING count(DISTINCT split) > 1
            )
        )
        SELECT split, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
               (SELECT n FROM viol) AS leakage_violations
        FROM assigned
        GROUP BY 1, 2
    """,
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        dedup_clusters,
        shingle_pairs_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    pairable = docs.filter(F.size(F.split(F.col("text"), " ")) >= 5)
    cc = dedup_clusters(
        shingle_pairs_jaccard(pairable).filter(F.col("jaccard") >= 0.3)
    ).select(F.col("doc_id").alias("cc_doc"), "cluster_id")
    grp = F.coalesce("cluster_id", "doc_id")
    fold = F.conv(
        F.substring(F.md5(grp.cast("string")), 1, 8), 16, 10
    ).cast("long") % 10
    assigned = (
        docs.join(cc, docs["doc_id"] == cc["cc_doc"], "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            grp.alias("grp"),
            F.when(fold < 8, F.lit("train"))
            .when(fold == 8, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
    viol = (
        assigned.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leakage_violations"))
    )
    return (
        assigned.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("grp").alias("n_groups"),
            F.sum("n_chars").alias("n_chars_total"),
        )
        .crossJoin(F.broadcast(viol))
        .select(
            "split", "source", "n_docs", "n_groups", "n_chars_total",
            "leakage_violations",
        )
    )


#: every Nth wire line is deterministically truncated to simulate the
#: torn/corrupt records a real JSONL drop always contains
_JSONL_CORRUPT_MOD = 97


@register(
    "text_jsonl_ingest",
    family="text",
    doc="JSONL corpus ingestion with corrupt-record DLQ routing "
    "(F30) — the training-data front door: documents arrive as "
    "JSON-lines wire text (the lingua franca of corpus drops), "
    "every 97th line torn mid-record, and the parse side sees ONLY "
    "the line plus its transport offset. from_json(PERMISSIVE) "
    "yields null for malformed lines, which route to the DLQ with a "
    "reason instead of killing the batch (the A21 failure-handling "
    "contract applied to corpus ingest); parsed lines re-emit their "
    "typed fields. Wire build and parse are separate projections so "
    "a build bug can't cancel a parse bug, and the oracle derives "
    "every output column from the source table + the corruption "
    "rule WITHOUT any JSON machinery (the H8 independent-derivation "
    "pattern). One scan, pure codegen, no shuffle.",
    oracle=f"""
        SELECT doc_id AS offset,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} = 0
                    THEN 'corpus.dlq' ELSE 'corpus.ok' END AS route,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} = 0
                    THEN 'malformed_json' END AS reason,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} != 0
                    THEN source END AS src,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} != 0
                    THEN lang END AS lang,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} != 0
                    THEN n_chars END AS n_chars,
               CASE WHEN doc_id % {_JSONL_CORRUPT_MOD} != 0
                    THEN md5(text) END AS text_hash
        FROM documents
    """,
)
def text_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # wire build: one JSONL line per doc + transport offset; the
    # corruption tears the line at half length (always invalid JSON —
    # the outer object only closes at the final character)
    line = F.to_json(F.struct("doc_id", "lang", "source", "n_chars", "text"))
    torn = F.when(
        F.col("doc_id") % _JSONL_CORRUPT_MOD == 0,
        F.substring(line, 1, (F.length(line) / 2).cast("int")),
    ).otherwise(line)
    wire = docs.select(F.col("doc_id").alias("offset"), torn.alias("line"))
    # parse side: line + offset only
    schema = "doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING"
    parsed = wire.select(
        "offset", F.from_json("line", schema).alias("p")
    )
    bad = F.col("p").isNull() | F.col("p.doc_id").isNull()
    return parsed.select(
        "offset",
        F.when(bad, F.lit("corpus.dlq")).otherwise(F.lit("corpus.ok")).alias(
            "route"
        ),
        F.when(bad, F.lit("malformed_json")).alias("reason"),
        F.when(~bad, F.col("p.source")).alias("src"),
        F.when(~bad, F.col("p.lang")).alias("lang"),
        F.when(~bad, F.col("p.n_chars")).alias("n_chars"),
        F.when(~bad, F.md5(F.col("p.text"))).alias("text_hash"),
    )


#: BPE induction rounds (merge rules learned)
_BPE_MERGES = 10


#: separator for the merge-map keys; cannot occur inside a symbol
#: (symbols are text characters, "</w>", and their concatenations)
_BPE_SEP = "\x00"


def _select_merge_batch(
    top: list, budget: int, collected_all: bool
) -> list:
    """Pick the pairs safe to merge in ONE rewrite pass while staying
    EXACTLY equivalent to sequential Sennrich BPE (same rule sequence,
    same tie-breaks).

    `top` is the pair table sorted by (freq desc, a, b). Accept the
    maximal contiguous prefix whose pairs are pairwise symbol-
    disjoint, then shrink it until every accepted count is STRICTLY
    greater than the best remaining count (`c_next`). Proof of
    equivalence: applying a batch pair cannot change the count of any
    other accepted pair (symbol-disjoint), can only decrease counts
    of non-accepted pre-existing pairs (all ranked after the prefix,
    so count <= c_next), and any NEWLY CREATED pair (m, x) with
    m = cd merged satisfies count(m, x) <= count(d, x) where (d, x)
    shares d with an accepted pair and is therefore non-accepted, so
    count(m, x) <= c_next < every accepted count. Hence when
    sequential BPE recounts after each merge, the accepted pairs stay
    the strict argmaxes in exactly the accepted order, ties included.
    A batch of one is the classic sequential step (always exact), so
    the fallback after over-shrinking is top[0] alone."""
    accepted: list = []
    used: set[str] = set()
    stop = len(top)
    for i, r in enumerate(top):
        if len(accepted) >= budget or r["a"] in used or r["b"] in used:
            stop = i
            break
        accepted.append(r)
        used.add(r["a"])
        used.add(r["b"])
    if stop < len(top):
        c_next = top[stop]["pair_freq"]
    elif not collected_all:
        # pairs beyond the collected window may tie the tail
        c_next = top[-1]["pair_freq"]
    else:
        c_next = 0
    while len(accepted) > 1 and accepted[-1]["pair_freq"] <= c_next:
        accepted.pop()
    if accepted and accepted[0]["pair_freq"] <= c_next:
        accepted = accepted[:1]
    return accepted or top[:1]


def bpe_learn(
    docs: DataFrame,
    n_merges: int = _BPE_MERGES,
    batch_limit: int = 64,
    rounds_log: list | None = None,
    word_freq: DataFrame | None = None,
) -> DataFrame:
    """Sennrich-style BPE merge-rule induction over the corpus's word
    types (the tokenizer-TRAINING step, not just tokenization): each
    round counts adjacent symbol pairs weighted by word frequency,
    selects the largest batch of merges that is provably order-
    equivalent to taking sequential argmaxes (see
    :func:`_select_merge_batch` — pairwise symbol-disjoint, strictly
    separated from the next candidate count), and rewrites every
    word's symbol sequence with ALL of them in one left-to-right
    non-overlapping pass. State stays DISTRIBUTED at the word-type
    grain (Heaps-law sublinear in corpus size — the 10M-type vocab of
    a 100 TB corpus still fits a few hundred partitions) with
    localCheckpoint truncating lineage per round; driver traffic is
    one <=batch_limit-row pair window per ROUND, and batching cuts
    rounds (and checkpoints) by the mean batch size — the r5 verdict's
    30k-merge concern: a production tokenizer pays ~merges/batch
    round-trips instead of one per merge, with zero change to the
    learned rule sequence (pytest-proven parity). Returns the rule
    table (step, left, right, merged, pair_freq)."""
    spark = docs.sparkSession
    if word_freq is None:
        # the standard entry: count the corpus's word types. Trainers
        # that already hold a (w, freq) table — the usual tokenizer-
        # training input — pass it directly and skip the scan.
        word_freq = (
            docs.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
    syms = word_freq.select(
        "freq",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit("</w>"))
        ).alias("syms"),
    ).localCheckpoint()
    rules = []
    while len(rules) < n_merges:
        pairs = (
            # fully-merged word types (single symbol) contribute no
            # pairs — without the filter, sequence(0, -1) auto-steps
            # backwards and the transform indexes syms[-1]/syms[1] of
            # a 1-element array (ANSI INVALID_ARRAY_INDEX crash)
            syms.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = (
            pairs.orderBy(F.col("pair_freq").desc(), "a", "b")
            .limit(batch_limit)
            .collect()
        )
        if not top:
            break
        batch = _select_merge_batch(
            top, n_merges - len(rules), collected_all=len(top) < batch_limit
        )
        if rounds_log is not None:
            rounds_log.append(len(batch))
        map_entries = []
        for r in batch:
            a, b = r["a"], r["b"]
            rules.append((len(rules), a, b, a + b, int(r["pair_freq"])))
            map_entries.append((F.lit(a + _BPE_SEP + b), F.lit(a + b)))
        merge_map = F.create_map(
            *[c for pair in map_entries for c in pair]
        )
        # left-to-right non-overlapping merge as a fold: `prev` is the
        # one-symbol lookahead buffer; a merged token is finalized
        # immediately so it cannot re-merge within the same pass
        # (re.sub semantics of the reference implementation). Batch
        # pairs are symbol-disjoint, so their occurrences can never
        # overlap and one simultaneous pass == one pass per pair.
        init = F.struct(
            F.array().cast("array<string>").alias("arr"),
            F.lit(None).cast("string").alias("prev"),
        )

        # PySpark derives the lambda arity from the signature, so the
        # map must be captured by closure, not a default argument
        mm = merge_map

        def _fold_step(acc, x):
            hit = F.try_element_at(mm, F.concat(acc["prev"], F.lit(_BPE_SEP), x))
            return (
                F.when(
                    acc["prev"].isNull(),
                    F.struct(acc["arr"].alias("arr"), x.alias("prev")),
                )
                .when(
                    hit.isNotNull(),
                    F.struct(
                        F.concat(acc["arr"], F.array(hit)).alias("arr"),
                        F.lit(None).cast("string").alias("prev"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(acc["arr"], F.array(acc["prev"])).alias("arr"),
                        x.alias("prev"),
                    )
                )
            )

        folded = F.aggregate(
            F.col("syms"),
            init,
            _fold_step,
            lambda acc: F.when(
                acc["prev"].isNull(), acc["arr"]
            ).otherwise(F.concat(acc["arr"], F.array(acc["prev"]))),
        )
        syms = syms.select("freq", folded.alias("syms")).localCheckpoint()
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_freq long"
    )


@register(
    "text_bpe_learn",
    family="text",
    doc="BPE tokenizer TRAINING (F31): learn the first 10 merge rules "
    "from the corpus (Sennrich et al. 2016) — pair counting and "
    "sequence rewriting stay distributed at the word-type grain; "
    "driver traffic is one bounded pair window per ROUND, and "
    "rounds batch every provably order-safe merge (pairwise "
    "symbol-disjoint, strictly separated from the next candidate "
    "count), so a production 30k-merge run pays ~merges/batch "
    "round-trips instead of one per merge. Iterative and order-"
    "dependent, so not SQL-portable: driver does the rows-only "
    "check and the pytest proves EXACT rule-sequence parity (pair, "
    "frequency, tie-breaks) against a pure-Python reference BPE on "
    "planted corpora and real testdata.",
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_learn(load(spark, sf_dir, "documents"))
