"""Distributed BPE tokenizer-merge training (Sennrich et al. 2016) —
the training-data pipeline's "train a subword vocab on the corpus" verb.

``bpe_merges`` learns the first N byte-pair merges from the corpus's
word-frequency table: each step counts adjacent symbol pairs (weighted
by word frequency, overlaps counted — Sennrich ``get_stats``), picks the
most frequent pair (ties broken lexicographically so both engines agree),
and rewrites every word by merging that pair LEFT-TO-RIGHT
non-overlapping (Sennrich ``merge_vocab``'s replace semantics).

Scale shape (distributed path): after the initial ``groupBy(word)``, the
working set is the DISTINCT-WORD table — corpus-sublinear, the classic
reason BPE training is tractable at all. Each merge step is

* one map-side-partial pair-count aggregate (shuffle carries pair TYPES),
* a 1-row argmax (ORDER BY count DESC, pair LIMIT 1 — a sentinel row
  with count -1 rides the union so a pairless step degrades to a no-op
  instead of annihilating the plan through an empty cross join),
* a PURE-CATALYST left-to-right merge: ``F.aggregate`` folds each word's
  symbol array with (out, pending) state — no Python in the rewrite, no
  explode of the corpus — with the chosen pair cross-joined in as a
  broadcast 1-row literal,

each step checkpointed (``stage_checkpoint``) so step k+1 reads
materialized symbols instead of re-deriving k layers of folds. N merges
= N short jobs, the same iteration structure every BPE trainer has.

The DuckDB oracle REALLY trains the same merges: per step, a pair-count
CTE, the sentinel argmax, and a per-word RECURSIVE cursor CTE that walks
positions left-to-right applying the merge — unrolled N times by
``_bpe_oracle_sql`` (programmatically generated SQL; hand-maintaining N
copies would drift). Symbols start as codepoints (``[\\s\\S]`` — '.'
misses U+2028/29 in Java but not RE2, so the explicit class keeps the
engines aligned).

Reference parity: none — tokenizer training is part of the
training-pipeline extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, stage_checkpoint, table

N_MERGES = 6

_OUT_SCHEMA = (
    "step long, left string, right string, merged string, pair_count long"
)


def _pair_counts(words: DataFrame) -> DataFrame:
    from tomixpanel_spark.functions.text import adjacent_pairs

    return (
        words.select("freq", F.explode(adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.l").alias("__l"), F.col("p.r").alias("__r"))
        .agg(F.sum("freq").alias("__c"))
    )


def _best_pair(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    sentinel = spark.sql(
        "SELECT '' AS __l, '' AS __r, CAST(-1 AS BIGINT) AS __c"
    )
    return (
        pairs.unionByName(sentinel)
        .orderBy(F.col("__c").desc(), "__l", "__r")
        .limit(1)
    )


def _merge_step(words: DataFrame, best: DataFrame) -> DataFrame:
    """Left-to-right non-overlapping merge of the chosen pair in every
    word, as a Catalyst fold: state (out, pend); a merge consumes pend+x
    and clears pend so the merged token cannot chain within this step —
    exactly Sennrich's non-overlapping replace."""
    j = words.crossJoin(F.broadcast(best))
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        merged = F.concat(F.col("__l"), F.col("__r"))
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == F.col("__l")) & (x == F.col("__r")),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    folded = F.aggregate(
        F.col("syms"),
        init,
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )
    return j.select("word", "freq", folded.alias("syms"))


def _fold_train(docs: DataFrame, n_merges: int):
    """Classic Sennrich training loop over the driver-collected
    word-frequency table — dict counters, exact ties. Returns the merge
    rows AND the final word -> symbol-list vocab (token counting reads
    the latter)."""
    from collections import Counter

    from tomixpanel_spark.operators.dedup import _fold_tokenize
    from tomixpanel_spark.operators.textops import docs_pdf

    pdf = docs_pdf(docs)
    wc: Counter = Counter()
    for t in pdf["text"]:
        wc.update(_fold_tokenize(t))
    vocab = {w: list(w) for w in wc}
    rows = []
    for i in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = wc[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )
        for w, syms in vocab.items():
            out: list = []
            pend = None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            vocab[w] = out
        rows.append((i + 1, left, right, left + right, int(cnt)))
    return rows, vocab


def _train_distributed(spark: SparkSession, docs: DataFrame, n_merges: int,
                       need_final: bool):
    """The distributed training chain: returns (per-step 1-row merge
    DataFrames, final words table after ALL merges or None). The final
    merge is skipped when nothing consumes it (bpe_merges only reads
    the merge rows)."""
    from tomixpanel_spark.functions.text import tokens

    words = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.expr(r"regexp_extract_all(word, '[\\s\\S]', 0)").alias("syms"),
        )
    )
    cur = stage_checkpoint(words)
    steps = []
    for i in range(n_merges):
        # best is NOT checkpointed: its input (cur) is already
        # materialized, so the two consumers (output row + merge
        # broadcast) each recompute one cheap vocab-sized aggregate.
        # Measured equal wall-clock to checkpointing it at the 50k
        # probe (2.66 s vs 2.67 s) — kept for one fewer materialization
        # per step; the step cost is the fold+aggregate stages, not
        # lineage
        best = _best_pair(spark, _pair_counts(cur))
        steps.append(
            best.select(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.col("__l").alias("left"),
                F.col("__r").alias("right"),
                F.concat("__l", "__r").alias("merged"),
                F.col("__c").alias("pair_count"),
            )
        )
        if i + 1 < n_merges or need_final:
            cur = stage_checkpoint(_merge_step(cur, best))
    return steps, (cur if need_final else None)


def _under_fold_cap(spark: SparkSession, sf_dir: str, docs: DataFrame) -> bool:
    from tomixpanel_spark.operators.textops import (
        _corpus_count,
        _tfidf_driver_fold_cap,
    )

    return _corpus_count(spark, sf_dir, docs) <= _tfidf_driver_fold_cap()


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tomixpanel_spark.operators.base import ensure_parallel

    docs = ensure_parallel(table(spark, sf_dir, "documents"), "doc_id")
    if _under_fold_cap(spark, sf_dir, docs):
        rows, _vocab = _fold_train(docs, N_MERGES)
        return spark.createDataFrame(rows, schema=_OUT_SCHEMA)
    steps, _final = _train_distributed(spark, docs, N_MERGES, need_final=False)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.filter(F.col("pair_count") > 0)


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE training: per-document subword token budget
    under the learned merges — (doc_id, n_words, n_bpe_tokens). The
    practical accounting verb ("how many tokens is my corpus under this
    vocab") that every training-data pipeline runs after training.

    Distributed: the per-word final symbol count is a VOCAB-sized table
    (Heaps' law keeps it corpus-sublinear), broadcast to the exploded
    document words while under ``TOMIX_TFIDF_BCAST_VOCAB`` (the shared
    vocab-broadcast gate; shuffle join above), then one map-side-partial
    per-doc aggregate. Docs with no tokens emit (0, 0) — accounting must
    cover every document."""
    from tomixpanel_spark.functions.text import tokens
    from tomixpanel_spark.operators.base import ensure_parallel
    from tomixpanel_spark.operators.textops import _tfidf_vocab_cap, _vocab_count

    docs = ensure_parallel(table(spark, sf_dir, "documents"), "doc_id")
    schema = "doc_id long, n_words long, n_bpe_tokens long"
    if _under_fold_cap(spark, sf_dir, docs):
        from tomixpanel_spark.operators.dedup import _fold_tokenize
        from tomixpanel_spark.operators.textops import docs_pdf

        _rows, vocab = _fold_train(docs, N_MERGES)
        pdf = docs_pdf(docs)
        out = [
            (
                int(doc_id),
                len(ws),
                sum(len(vocab[w]) for w in ws),
            )
            for doc_id, ws in (
                (d, _fold_tokenize(t))
                for d, t in zip(pdf["doc_id"], pdf["text"])
            )
        ]
        return spark.createDataFrame(out, schema=schema)
    _steps, final = _train_distributed(spark, docs, N_MERGES, need_final=True)
    wl = final.select("word", F.size("syms").cast("bigint").alias("k"))
    key = (spark.sparkContext.applicationId, sf_dir, "bpe_vocab")
    if _vocab_count(spark, key, wl) <= _tfidf_vocab_cap():
        wl = F.broadcast(wl)
    doc_words = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    per_doc = (
        doc_words.join(wl, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("k").alias("n_bpe"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_bpe", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
    )


def _bpe_oracle_sql(n_merges: int = N_MERGES, emit: str = "merges") -> str:
    """Programmatically unrolled DuckDB mirror: per step a pair-count
    CTE, the sentinel argmax, and a per-word recursive position-cursor
    CTE applying the left-to-right merge. ``emit='merges'`` yields the
    training table; ``emit='doc_counts'`` applies the final vocab to
    every document (bpe_token_count's oracle)."""
    parts = [
        "WITH RECURSIVE words0 AS MATERIALIZED (",
        "  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,",
        "         regexp_extract_all(word, '[\\s\\S]') AS syms",
        "  FROM (SELECT unnest(list_filter(string_split(",
        "          translate(text, chr(9)||chr(10)||chr(13)||chr(11)||chr(12),",
        "          '     '), ' '), t -> t <> '')) AS word FROM documents)",
        "  GROUP BY word)",
    ]
    for i in range(1, n_merges + 1):
        p = f""", pairs{i} AS MATERIALIZED (
  SELECT syms[j] AS l, syms[j + 1] AS r, CAST(SUM(freq) AS BIGINT) AS c
  FROM words{i - 1}, UNNEST(range(1, len(syms))) AS t(j)
  GROUP BY 1, 2),
best{i} AS MATERIALIZED (
  SELECT l, r, c FROM (
    SELECT l, r, c FROM pairs{i}
    UNION ALL SELECT '', '', CAST(-1 AS BIGINT))
  ORDER BY c DESC, l, r LIMIT 1),
walk{i}(word, freq, pos, out) AS (
  SELECT word, freq, 1, CAST([] AS VARCHAR[]) FROM words{i - 1}
  UNION ALL
  SELECT k.word, k.freq,
    CASE WHEN k.pos < len(w.syms) AND w.syms[k.pos] = b.l
              AND w.syms[k.pos + 1] = b.r
         THEN k.pos + 2 ELSE k.pos + 1 END,
    CASE WHEN k.pos < len(w.syms) AND w.syms[k.pos] = b.l
              AND w.syms[k.pos + 1] = b.r
         THEN list_append(k.out, b.l || b.r)
         ELSE list_append(k.out, w.syms[k.pos]) END
  FROM walk{i} k
  JOIN words{i - 1} w ON k.word = w.word
  CROSS JOIN best{i} b
  WHERE k.pos <= len(w.syms)),
words{i} AS MATERIALIZED (
  SELECT k.word, k.freq, k.out AS syms
  FROM walk{i} k JOIN words{i - 1} w ON k.word = w.word
  WHERE k.pos > len(w.syms))"""
        parts.append(p)
    if emit == "doc_counts":
        parts.append(f""", docw AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(string_split(
    translate(text, chr(9)||chr(10)||chr(13)||chr(11)||chr(12), '     '),
    ' '), t -> t <> '')) AS word FROM documents),
perdoc AS MATERIALIZED (
  SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(len(f.syms)) AS BIGINT) AS n_bpe
  FROM docw dw JOIN words{n_merges} f ON dw.word = f.word
  GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
  CAST(COALESCE(p.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id""")
        return "\n".join(parts)
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS step, l AS left, r AS right,"
        f" l || r AS merged, c AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1)
    ]
    parts.append(
        "SELECT * FROM (" + " UNION ALL ".join(selects) + ") WHERE pair_count > 0"
    )
    return "\n".join(parts)


# Helper modules whose changes should count as a change to this
# module's registered queries for the external-window rotation
# (rule: code changed since last external green outranks staleness).
ROTATION_DEPS = [
    "tomixpanel_spark.functions.text",
    "tomixpanel_spark.operators.textops",
]

REGISTRY = {
    "bpe_merges": QuerySpec(
        bpe_merges,
        _bpe_oracle_sql(),
        "ext:text distributed BPE tokenizer-merge training",
    ),
    "bpe_token_count": QuerySpec(
        bpe_token_count,
        _bpe_oracle_sql(emit="doc_counts"),
        "ext:text BPE-vocab token budget per document",
    ),
}
