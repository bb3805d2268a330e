"""Deduplication queries over ``documents`` (operators/dedup.py).

The DuckDB oracles restate each pipeline with the same md5-based hash
family and the same tokenization, so minhash/simhash values match
bit-for-bit — the checks are exact, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_usnvc_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from pipeline_usnvc_spark.plans.registry import query
from pipeline_usnvc_spark.sources.tables import load_table

from pipeline_usnvc_spark.functions.text import TOKENIZE_SQL as _TOKS_SQL

# 3-gram word shingles, 1-indexed (mirrors functions.text.word_shingles)
_SHINGLES_SQL = f"""
    SELECT doc_id, unnest(
        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> toks[i] || '_' || toks[i+1] || '_' || toks[i+2])
    ) AS shingle
    FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
"""

_MINHASH_SQL = f"""
    SELECT doc_id, CAST(seed AS INT) AS seed,
           min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minhash
    FROM ({_SHINGLES_SQL}) sh
    CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) seeds
    GROUP BY doc_id, seed
"""


# ---------------------------------------------------------------------------
# q50 — exact dedup via normalized fingerprint groupBy.
# ---------------------------------------------------------------------------
@query(
    "q50_exact_dedup",
    oracle=f"""
    SELECT md5(coalesce(array_to_string({_TOKS_SQL}, ' '), '')) AS fingerprint,
           count(*) AS n_copies,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def q50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q51 — MinHash signatures (8 hashes, 3-gram shingles).
# ---------------------------------------------------------------------------
@query("q51_minhash_signature", oracle=_MINHASH_SQL)
def q51_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q52 — LSH banding → candidate near-dup pairs (2 bands × 4 rows).
# ---------------------------------------------------------------------------
@query(
    "q52_lsh_candidate_pairs",
    oracle=f"""
    WITH sig AS ({_MINHASH_SQL}),
    band_sig AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(minhash, ',' ORDER BY seed) AS bs
        FROM sig GROUP BY doc_id, seed // 4
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
    FROM band_sig a JOIN band_sig b
      ON a.band = b.band AND a.bs = b.bs AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def q52_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q53 — SimHash (32-bit, frequency-weighted bit votes).
# ---------------------------------------------------------------------------
@query(
    "q53_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(toks) AS tok
        FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    ),
    hashed AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM tok
    ),
    bits AS (
        SELECT doc_id, h, unnest(range(0, 32)) AS bit FROM hashed
    ),
    votes AS (
        SELECT doc_id, bit,
               sum(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        FROM bits GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q53_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q57 — span-level dedup: fixed 20-token chunks hashed and grouped —
# finds boilerplate/duplicated spans ACROSS documents even when whole
# documents differ (the paragraph-granularity pass of a corpus dedup).
# ---------------------------------------------------------------------------
@query(
    "q57_span_dedup",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, CAST(ceil(len(toks) / 20.0) AS BIGINT) + 1),
                                     i -> md5(array_to_string(toks[(i-1)*20+1 : i*20], ' ')))) AS chunk_hash
        FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
        WHERE len(toks) > 0
    )
    SELECT chunk_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occurrences
    FROM chunks GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def q57_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks")).filter(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / 20.0).cast("bigint")
    chunk = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1).cast("bigint"), n_chunks),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("toks", ((i - 1) * 20 + 1).cast("int"), F.lit(20)))
                ),
            )
        ).alias("chunk_hash"),
    )
    return (
        chunk.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# q54 — exact n-gram Jaccard for pairs sharing ≥1 shingle.
# ---------------------------------------------------------------------------
@query(
    "q54_ngram_jaccard",
    oracle=f"""
    WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.1
    """,
)
def q54_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.1)


# ---------------------------------------------------------------------------
# q94 — prefix-filtered set-similarity self-join (PPJoin-lite) on
# 3-gram shingle sets: the scale path for exact Jaccard. The oracle
# is the BRUTE-FORCE inverted-index join — identical output proves
# the prefix filter is lossless at this threshold, which is the whole
# point of the technique: at 100 TB the full index joins on every
# shingle (one boilerplate shingle shared by 1M docs = 10^12
# candidates), the prefix join only on each doc's rarest few
# shingles. (Shingle sets, not word tokens: the synthetic corpus has
# a ~30-word vocabulary, so token-set Jaccard is degenerately high —
# 86% of all pairs clear 0.4 — while shingle similarity isolates the
# planted near-duplicates.)
# ---------------------------------------------------------------------------
@query(
    "q94_prefix_filter_jaccard",
    oracle=f"""
    WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.2
    """,
)
def q94_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.operators.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.2, shingle_n=3
    )


# ---------------------------------------------------------------------------
# q153 — cross-source duplication matrix: for every ordered source
# pair, how many verified near-dup pairs (3-gram Jaccard ≥ 0.1) link
# a document of one source to the other — the corpus-forensics report
# that surfaces which feeds copy from which (and how much of each
# source is internal duplication, on the diagonal).
#
# Scale shape: reuses the verified-pair path (inverted shingle index,
# candidates only); the matrix aggregation joins the tiny pair set to
# the doc→source map twice (broadcast at any realistic source count)
# and groups on |sources|² keys.
# ---------------------------------------------------------------------------
@query(
    "q153_cross_source_dups",
    oracle=f"""
    WITH sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM inter
          JOIN sizes sa ON inter.id_a = sa.doc_id
          JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.1
    )
    SELECT least(da.source, db.source) AS source_x,
           greatest(da.source, db.source) AS source_y,
           count(*) AS n_dup_pairs
    FROM pairs
      JOIN documents da ON da.doc_id = pairs.id_a
      JOIN documents db ON db.doc_id = pairs.id_b
    GROUP BY least(da.source, db.source), greatest(da.source, db.source)
    """,
)
def q153_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.1).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    a = src.withColumnRenamed("doc_id", "id_a").withColumnRenamed("source", "src_a")
    b = src.withColumnRenamed("doc_id", "id_b").withColumnRenamed("source", "src_b")
    return (
        # a/b are doc-grain (one row per document): no broadcast hints —
        # at corpus scale an O(n) forced broadcast OOMs executors; the
        # id equi-join shuffles fine and AQE still broadcasts when small.
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .agg(F.count("*").alias("n_dup_pairs"))
    )


# ---------------------------------------------------------------------------
# q246 — sorted-neighborhood dedup (Hernández–Stolfo SNM, the third
# classic blocking family next to LSH banding and prefix-filter
# PPJoin): sort the corpus by a domain key (first-5-token prefix),
# compare each document only against its next w=5 neighbors in sort
# order, and emit pairs whose 40-char normalized prefixes sit within
# edit distance 10. Exact + oracle-paired: the global order is
# total ((key, doc_id)), the neighbor pairing is an EQUI-join on
# integer ranks (rank_b = rank_a + i for i in 1..5 — never a range
# or theta join), and levenshtein is engine-identical (q47
# precedent).
#
# Scale shape: the global rank comes from the two-phase
# range-exchange rank (operators/rank.with_global_rank — NO
# single-partition window sort), the offset fan-out is a 5-row
# in-row explode, and the neighbor join shuffles on integer rank
# keys. SNM's whole point at 100 TB: candidate volume is O(n·w),
# chosen by sort locality instead of hashing.
# ---------------------------------------------------------------------------
@query(
    "q246_sorted_neighborhood",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               array_to_string(({0})[1:5], ' ') AS sort_key,
               substr(lower(text), 1, 40) AS prefix40
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, sort_key, prefix40,
               CAST(row_number() OVER (ORDER BY sort_key, doc_id) AS BIGINT) AS rn
        FROM keyed
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.prefix40, b.prefix40) AS BIGINT) AS edit_dist
        FROM ranked a
        JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS i) offs ON true
        JOIN ranked b ON b.rn = a.rn + offs.i
    )
    SELECT id_a, id_b, edit_dist
    FROM pairs WHERE edit_dist <= 10
    """.format(_TOKS_SQL),
)
def q246_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import tokens
    from pipeline_usnvc_spark.operators.rank import with_global_rank

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(tokens("text"), 1, 5)).alias("sort_key"),
        F.substring(F.lower("text"), 1, 40).alias("prefix40"),
    )
    ranked = with_global_rank(keyed, "sort_key", "doc_id", rank_col="rn")
    a = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("prefix40").alias("pa"),
        F.explode(F.array(*[F.lit(i) for i in range(1, 6)])).alias("i"),
        F.col("rn").alias("rn_a"),
    ).withColumn("rn_b", F.col("rn_a") + F.col("i"))
    b = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("prefix40").alias("pb"),
        F.col("rn").alias("rn_b"),
    )
    return (
        a.join(b, "rn_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pa", "pb").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 10)
    )


# ---------------------------------------------------------------------------
# q249 — INCREMENTAL dedup: classify an incoming batch against the
# EXISTING corpus (the production shape — full self-dedup of 100 TB
# per ingest is not affordable; new-vs-history is): exact dup by
# content fingerprint, else near-dup by cross-set shingle Jaccard
# ≥ 0.5 (candidates via the shared-shingle inverted index — an
# equi-join on shingle, never incoming × existing), else new. Every
# incoming doc appears exactly once with its verdict and the lowest
# matching existing id. All counts exact ints; Jaccard threshold is
# cross-multiplied (2·inter ≥ union means ≥ 0.5 — integer-only).
# ---------------------------------------------------------------------------
@query(
    "q249_incremental_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    fp AS (SELECT doc_id, md5(coalesce(array_to_string(toks, ' '), '')) AS fp FROM toks),
    incoming AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 = 0),
    existing AS (SELECT doc_id, fp FROM fp WHERE doc_id % 5 <> 0),
    exact_m AS (
        SELECT i.doc_id, min(e.doc_id) AS matched_id
        FROM incoming i JOIN existing e ON e.fp = i.fp
        GROUP BY i.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS in_id, b.doc_id AS ex_id, CAST(count(*) AS BIGINT) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        GROUP BY a.doc_id, b.doc_id
    ),
    near_m AS (
        SELECT i.in_id AS doc_id, min(i.ex_id) AS matched_id
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.in_id
        JOIN sizes sb ON sb.doc_id = i.ex_id
        WHERE 2 * i.n_inter >= sa.n + sb.n - i.n_inter
        GROUP BY i.in_id
    )
    SELECT i.doc_id,
           CASE WHEN e.matched_id IS NOT NULL THEN 'exact_dup'
                WHEN n.matched_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS verdict,
           coalesce(e.matched_id, n.matched_id) AS matched_existing_id
    FROM incoming i
    LEFT JOIN exact_m e ON e.doc_id = i.doc_id
    LEFT JOIN near_m n ON n.doc_id = i.doc_id
    """,
)
def q249_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import doc_fingerprint, tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", doc_fingerprint("text").alias("fp"))
    incoming = fp.filter(F.col("doc_id") % 5 == 0)
    existing = fp.filter(F.col("doc_id") % 5 != 0)
    exact_m = (
        incoming.alias("i")
        .join(existing.alias("e"), F.col("e.fp") == F.col("i.fp"))
        .groupBy(F.col("i.doc_id").alias("doc_id"))
        .agg(F.min(F.col("e.doc_id")).alias("matched_id"))
    )
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(tokens("text")))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    a = sh.filter(F.col("doc_id") % 5 == 0).alias("a")
    b = sh.filter(F.col("doc_id") % 5 != 0).alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.doc_id").alias("in_id"), F.col("b.doc_id").alias("ex_id")
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("in_id"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("ex_id"), F.col("n").alias("n_b"))
    # shingle-size tables are doc-grain (corpus-proportional) — no
    # broadcast hint; AQE picks the strategy (r4 review).
    near_m = (
        inter.join(sa, "in_id")
        .join(sb, "ex_id")
        .filter(2 * F.col("n_inter") >= F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .groupBy(F.col("in_id").alias("doc_id"))
        .agg(F.min("ex_id").alias("matched_id"))
    )
    e = exact_m.select(F.col("doc_id"), F.col("matched_id").alias("exact_id"))
    n = near_m.select(F.col("doc_id"), F.col("matched_id").alias("near_id"))
    return (
        incoming.select("doc_id")
        .join(e, "doc_id", "left")
        .join(n, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_id").isNotNull(), "exact_dup")
            .when(F.col("near_id").isNotNull(), "near_dup")
            .otherwise("new")
            .alias("verdict"),
            F.coalesce("exact_id", "near_id").alias("matched_existing_id"),
        )
    )


# ---------------------------------------------------------------------------
# q252 — dedup survivorship policy audit: for every exact-duplicate
# group (same normalized-token fingerprint), compare the two standard
# keeper policies — keep-first (min doc_id, the ingestion-order
# default) vs keep-longest (max n_chars, the quality-preserving
# default) — and flag where they disagree, so a pipeline migration
# from one policy to the other knows its blast radius. Scale shape:
# one digest-keyed shuffle carrying 16-byte digests + two ints per
# doc (never the text); the keep-longest argmax folds into a native
# lexicographic struct max ((n_chars, -doc_id) — tie-free by
# construction), so no per-group window materializes a dup group in
# one task.
#
# Planted duplicates (round 11): the shipped documents table carries
# NO exact duplicates at ANY SF (the round-11 zero-row sweep found
# this query's every green row — incl. its r06 driver row — verified
# an EMPTY frame, the q342/q111 vacuous-signal class), so the query
# plants its own controlled classes with the q427 ledger scaffolding:
# every doc_id % 7 == 0 doc gets an EXACT copy (same text, same
# n_chars — keep-first and keep-longest agree: the length tie breaks
# to the lowest id), and every doc_id % 21 == 0 doc additionally a
# punctuation-padded copy (' !!!' — the tokenizer collapses it, so
# the digest is unchanged while n_chars grows by 4: keep-longest now
# picks the copy and the policies DISAGREE). Both outcomes occur at
# every SF, so the driver row certifies the argmax and the
# disagreement flag, not an empty frame.
# ---------------------------------------------------------------------------
@query(
    "q252_dedup_survivorship",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
    corpus AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT 2 * mx.mx - doc_id + 1, text, n_chars
        FROM documents CROSS JOIN mx WHERE doc_id % 7 = 0
        UNION ALL
        SELECT 3 * mx.mx + 2 + doc_id, text || ' !!!', n_chars + 4
        FROM documents CROSS JOIN mx WHERE doc_id % 21 = 0
    ),
    keyed AS (
        SELECT md5(coalesce(array_to_string({_TOKS_SQL}, ' '), '')) AS digest, doc_id, n_chars
        FROM corpus
    ),
    groups AS (
        SELECT digest,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(min(doc_id) AS BIGINT) AS keeper_first,
               CAST(first(doc_id ORDER BY n_chars DESC, doc_id) AS BIGINT) AS keeper_longest
        FROM keyed GROUP BY digest
        HAVING count(*) > 1
    )
    SELECT digest, group_size, keeper_first, keeper_longest,
           keeper_first = keeper_longest AS policies_agree
    FROM groups
    """,
)
def q252_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pipeline_usnvc_spark.functions.text import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    mx = F.broadcast(docs.agg(F.max("doc_id").alias("mx")))
    exact_copies = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .crossJoin(mx)
        .select(
            (F.lit(2) * F.col("mx") - F.col("doc_id") + 1).alias("doc_id"),
            "text",
            "n_chars",
        )
    )
    padded_copies = (
        docs.filter(F.col("doc_id") % 21 == 0)
        .crossJoin(mx)
        .select(
            (F.lit(3) * F.col("mx") + 2 + F.col("doc_id")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" !!!")).alias("text"),
            (F.col("n_chars") + 4).alias("n_chars"),
        )
    )
    corpus = docs.unionByName(exact_copies).unionByName(padded_copies)
    # doc_fingerprint (md5 of concat_ws) not md5(array_join): for a
    # NULL text, array_join yields NULL -> NULL digest, while the
    # oracle's md5(coalesce(array_to_string(...), '')) yields md5('')
    # — concat_ws('') matches the oracle's NULL-safe behavior, and
    # keeps q252 on the same keying as the q427/q428 ledger family
    # (ADVICE r11).
    keyed = corpus.select(
        doc_fingerprint("text").alias("digest"),
        "doc_id",
        "n_chars",
    )
    groups = (
        keyed.groupBy("digest")
        .agg(
            F.count("*").cast("bigint").alias("group_size"),
            F.min("doc_id").cast("bigint").alias("keeper_first"),
            # lexicographic struct max == argmax by (n_chars, -doc_id):
            # longest text wins, lowest doc_id breaks length ties.
            F.max(
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
            ).alias("_s"),
        )
        .filter(F.col("group_size") > 1)
    )
    return groups.select(
        "digest",
        "group_size",
        "keeper_first",
        (-F.col("_s.neg_id")).cast("bigint").alias("keeper_longest"),
        (F.col("keeper_first") == -F.col("_s.neg_id")).alias("policies_agree"),
    )
