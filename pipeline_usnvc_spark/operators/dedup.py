"""Deduplication operators for a large text corpus.

Four families, all shuffle-conscious:

  exact        — hash-groupBy on a 16-byte fingerprint (never on raw
                 text: the shuffle moves digests, not documents).
  minhash+LSH  — shingle → K minhashes → band signatures → bucket
                 self-join. The self-join key is (band, signature), so
                 candidate generation is an equi-join Catalyst can
                 shuffle-partition; no all-pairs blowup.
  simhash      — 32-bit near-dup sketch from per-token hash bit votes.
  n-gram Jaccard — exact pair similarity, restricted to pairs sharing
                 at least one shingle (inverted-index join), which is
                 the classic "candidates only" guard at scale.

Hashing is md5-based everywhere so results are engine-portable and
deterministic (no seed state, no JVM hashCode dependence) — the DuckDB
correctness oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_usnvc_spark.functions.text import doc_fingerprint, tokens, word_shingles
from pipeline_usnvc_spark.operators.checkpoint import fan_out, materialize


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, n_copies, keeper_id): groups of exact duplicates
    after whitespace/punctuation normalization; keeper = min id."""
    fp = docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_copies"),
        F.min(id_col).alias("keeper_id"),
    )


# Size-adaptive read-side parallelization (no-op at scale); canonical
# implementation lives next to materialize in operators/checkpoint.
_spread = fan_out


def shingle_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded (id, shingle) pairs — the inverted-index base."""
    return _spread(docs).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(text_col), n=n)).alias("shingle"),
    )


def _minhash_cols(num_hashes: int):
    """The ONE definition of the minhash hash family: seed-s hash of a
    shingle is md5('{s}|' || shingle); the signature is the array_min
    over the in-row shingle array. Shared by ``minhash_signatures``
    and ``band_signatures_mapside`` so the stream/batch equivalence
    (q222's contract) is structural, not merely tested."""
    return [
        F.array_min(
            F.transform("_shs", lambda x: F.md5(F.concat(F.lit(f"{s}|"), x)))
        ).alias(f"m{s}")
        for s in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, seed, minhash) — K independent min-hashes per document.

    Hash family: md5(seed || '|' || shingle); the min over a doc's
    shingle set estimates Jaccard similarity between documents.
    Documents with fewer than ``shingle_n`` tokens produce no rows.
    """
    # Fully map-side — ZERO shuffle: min over a multiset equals min
    # over the set, so each signature is array_min over the in-row
    # shingle array, no explode and no aggregation. The shingle array
    # is projected in its own select so CollapseProject keeps it
    # evaluated once, not once per seed (it only inlines cheap
    # expressions). Rows whose docs have < shingle_n tokens yield an
    # empty array → null minhash → dropped, matching the exploded
    # formulation's "no rows" semantics.
    arr = _spread(docs).select(
        F.col(id_col),
        word_shingles(tokens(text_col), n=shingle_n).alias("_shs"),
    )
    per_doc = arr.select(id_col, *_minhash_cols(num_hashes))
    seeds = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"m{s}").alias("minhash"))
            for s in range(num_hashes)
        ]
    )
    return (
        per_doc.select(id_col, F.explode(seeds).alias("x"))
        .select(id_col, F.col("x.seed").alias("seed"), F.col("x.minhash").alias("minhash"))
        .filter(F.col("minhash").isNotNull())
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """(id_a, id_b, n_shared_bands) candidate near-dup pairs.

    Band signature = ordered concat of the band's minhashes; docs
    sharing any band signature become candidates. The join key
    (band, signature) keeps this an equi-join — at 100 TB the bucket
    join shuffles only (id, band_sig) pairs and AQE splits skewed
    buckets (e.g., boilerplate-heavy shingle sets).
    """
    if num_hashes % bands:
        # a floored rows_per_band silently creates MORE bands than
        # requested (seed // rows_per_band overruns), shifting the
        # recall/precision curve the caller tuned
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    # Band signatures come from the zero-shuffle map-side builder (r4:
    # formerly an explode + groupBy(id, band) re-aggregation — one
    # whole exchange of signature rows that the column-wise concat
    # never needed; the same builder feeds streaming near-dup, so
    # stream and batch banding are structurally identical).
    band_sig = band_signatures_mapside(
        docs, id_col, text_col, num_hashes, bands, shingle_n
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) — per-token 32-bit hashes vote per bit position;
    bit set where the vote is positive. Token multiplicity counts
    (frequency-weighted, the standard Charikar construction)."""
    tok = _spread(docs).select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hashed = tok.select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    # All ``bits`` votes as independent aggregate expressions in ONE
    # groupBy: no bits× row explosion and a single shuffle (the
    # exploded two-shuffle formulation was 3× slower at sf0.1 and
    # multiplies shuffle volume by ``bits`` at 100 TB). Partial
    # aggregation makes the map side emit one 32-long row per doc.
    #
    # r13 per-task-work cut (guide §4.1 "prefer built-ins", applied to
    # the EXPRESSION-BUILD side): each aggregate is ONE parsed SQL
    # string instead of a nested F.sum(F.when(F.expr(...))) tree —
    # building 32 such trees cost 1.2-3.7 s of py4j round trips per
    # invocation (measured: DataFrame CONSTRUCTION dominated the query;
    # planning 0.05 s, execution ~0.8 s). The vote itself drops the
    # per-row CASE WHEN: vote_b = 2*sum(bit_b) - n  (each set bit votes
    # +1, each clear bit -1), so the map side sums the raw bit — the
    # identical integer, branch-free.
    # Aggregate aliases are double-underscore-prefixed (ADVICE r13):
    # sim_sql references them UNQUALIFIED via F.expr, so a caller's
    # id_col named 'n' or 's<k>' would otherwise silently win the
    # resolution and corrupt every vote.
    votes = [
        F.expr(f"sum(shiftright(h, {b}) & 1)").alias(f"__sh_s{b}") for b in range(bits)
    ]
    per_doc = hashed.groupBy(id_col).agg(F.count("*").alias("__sh_n"), *votes)
    # bit b set where vote > 0  <=>  2*s_b > n
    sim_sql = "cast(" + " + ".join(
        f"(case when 2 * __sh_s{b} > __sh_n then {2**b}L else 0L end)"
        for b in range(bits)
    ) + " as bigint)"
    return per_doc.select(id_col, F.expr(sim_sql).alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
    int_hash: bool = False,
) -> DataFrame:
    """(id_a, id_b, jaccard) for candidate pairs sharing ≥1 shingle.

    Exact Jaccard on distinct shingle sets via inverted-index
    self-join: |A∩B| from the join, |A|,|B| from per-doc counts.
    The double division is int/int → IEEE-identical across engines.

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents BEFORE the self-join — the stop-shingle cap that bounds
    join fan-out at corpus scale (a boilerplate shingle shared by 1M
    docs would otherwise produce 10^12 candidate rows). This changes
    the Jaccard denominator (capped shingles leave both sets), so it
    is an approximation knob: None = exact.

    ``int_hash`` replaces each shingle string (~25 bytes + string
    compare) with its 60-bit md5-prefix hash (8-byte long) BEFORE the
    self-join — the shuffle-bytes compaction for 100 TB corpora where
    exchange volume, not CPU, dominates. Collision probability at 60
    bits is ~n²/2^61 per doc pair's shingles — vanishingly below the
    threshold granularity — and the oracle applies the identical hash,
    so the check stays exact.
    """
    if max_doc_freq is not None:
        # The doc-frequency cap needs a global per-shingle count, and
        # set sizes must be recomputed AFTER dropping capped shingles,
        # so this path keeps the exploded-table formulation.
        sh = shingle_table(docs, id_col, text_col, shingle_n).distinct()
        if int_hash:
            # the compaction applies in the capped branch too — the
            # df-count exchange and the pair self-join both ride the
            # 8-byte hash instead of ~25-byte strings (previously the
            # flag was silently ignored when max_doc_freq was set)
            sh = sh.select(
                id_col,
                F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
                .cast("long")
                .alias("shingle"),
            )
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
        sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
        sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("inter"))
            .join(sz_a, "id_a")
            .join(sz_b, "id_b")
        )
    else:
        # Exact path, shuffle-minimal: the distinct shingle SET is
        # built map-side per document (array_distinct — no dedup
        # shuffle at all), the set size rides along through the
        # self-join (8 bytes/row on the one unavoidable exchange), and
        # first(sz) inside the pair aggregation replaces two
        # re-shuffling joins of the intersection table. Three shuffles
        # total (two join sides + pair groupBy, sides shared via
        # ReusedExchange) vs six in the naive formulation. The
        # self-join itself beats a postings/explode formulation
        # (measured 3.3s vs 3.4-3.7s at sf0.1) and AQE splits hot
        # shingle buckets.
        # Materialized in ARRAY form (one compact row per doc): both
        # self-join sides consume it, and without a shared exchange
        # between them (Spark may broadcast one side) the whole
        # tokenize+shingle map would otherwise execute twice. The
        # array form is the cheapest thing to cache — far smaller
        # than the exploded index.
        shs = word_shingles(tokens(text_col), n=shingle_n)
        if int_hash:
            # 60-bit hash (15 hex digits < 2^63, no sign issues),
            # applied map-side so only longs ever hit the exchange.
            # array_distinct AFTER hashing: a (negligible) collision
            # merges set elements identically in engine and oracle.
            shs = F.transform(
                shs, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
            )
        arr = (
            _spread(docs)
            .select(
                F.col(id_col),
                F.array_distinct(shs).alias("_shs"),
            )
            .transform(materialize)
        )
        sh = arr.select(
            id_col,
            F.size("_shs").alias("sz"),
            F.explode("_shs").alias("shingle"),
        )
        a, b = sh.alias("a"), sh.alias("b")
        # Size-ratio candidate prune (r14, guide §2.3 — shuffle fewer
        # bytes): J(A,B) >= t forces min(|A|,|B|) >= t*max(|A|,|B|)
        # (inter <= min, union >= max), so pairs failing the size test
        # can NEVER pass the threshold filter below — dropping them in
        # the join condition shrinks the pair-aggregation exchange
        # without changing one output row. Same float hygiene as
        # prefix_filter_jaccard_pairs: the 1e-9 slack means binary
        # rounding of t*max can only KEEP extra pairs (which the exact
        # jaccard filter then rejects), never drop a passing one.
        cond = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
        if threshold > 0:
            cond = cond & (
                F.least("a.sz", "b.sz").cast("double")
                >= F.lit(threshold) * F.greatest("a.sz", "b.sz") - F.lit(1e-9)
            )
        inter = (
            a.join(b, cond)
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(
                F.count("*").alias("inter"),
                F.first("a.sz").alias("sz_a"),
                F.first("b.sz").alias("sz_b"),
            )
        )
    return inter.select(
        "id_a",
        "id_b",
        (
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, cont_a_in_b, cont_b_in_a) for pairs where either
    direction's shingle containment |A∩B|/|A| reaches ``threshold``.

    Containment catches what Jaccard structurally cannot: a short
    document embedded verbatim in a much longer one (quotation,
    boilerplate wrapper, page-in-crawl-dump) has tiny Jaccard —
    |A∩B|/|A∪B| is diluted by the big doc — but containment of the
    small side ≈ 1. The training-data dedup rule "drop docs mostly
    contained in another" needs this directional score.

    Same shuffle-minimal shape as the exact Jaccard path: map-side
    distinct shingle arrays (set size rides the exchange as 8 bytes),
    inverted-index equi-join on shingle, one pair aggregation. The
    int/int → double divisions are IEEE-identical across engines.
    """
    arr = (
        _spread(docs)
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles(tokens(text_col), n=shingle_n)).alias("_shs"),
        )
        .transform(materialize)
    )
    sh = arr.select(
        id_col, F.size("_shs").alias("sz"), F.explode("_shs").alias("shingle")
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("sz_a"),
            F.first("b.sz").alias("sz_b"),
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (F.col("inter").cast("double") / F.col("sz_a").cast("double")).alias("cont_a_in_b"),
        (F.col("inter").cast("double") / F.col("sz_b").cast("double")).alias("cont_b_in_a"),
    ).filter(
        (F.col("cont_a_in_b") >= threshold) | (F.col("cont_b_in_a") >= threshold)
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.4,
    shingle_n: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with set Jaccard ≥ t over
    word tokens (``shingle_n=None``) or word n-gram shingles, found
    via PPJoin-style prefix filtering — the scale path past the full
    inverted-index join.

    Completeness argument (why no pair is missed): order every token
    set by one global total order; if J(x, y) ≥ t then x and y share
    at least one token among the first ``|s| - ceil(t*|s|) + 1``
    tokens of each set. So the candidate join only indexes each
    document's *prefix* under that order. We order by ascending corpus
    document frequency (token string as tie-break), which puts the
    RAREST tokens in the prefix — candidate fan-out per token stays
    small even on boilerplate-heavy corpora, unlike the full index
    where one stop-token shared by every doc produces O(n^2) pairs.

    Float hygiene: ``ceil(t*sz)`` and the size filter both subtract a
    1e-9 slack so binary-rounding of ``t*sz`` (0.4*5 = 2.0000000000000004)
    can only ENLARGE the prefix / candidate set, never shrink it —
    pruning stays conservative, the exact verify stage decides.

    Verification joins candidates back to the (array-form, one row per
    doc) token sets and computes exact ``|A∩B| / (|A|+|B|-|A∩B|)``;
    the int/int double division is IEEE-identical across engines, so
    the result hash-matches a brute-force oracle.
    """
    t = F.lit(threshold)
    elems = tokens(text_col) if shingle_n is None else word_shingles(tokens(text_col), n=shingle_n)
    arr = (
        _spread(docs)
        .select(
            F.col(id_col),
            F.array_distinct(elems).alias("_toks"),
        )
        .withColumn("sz", F.size("_toks"))
        .transform(materialize)
    )
    exploded = arr.select(id_col, "sz", F.explode("_toks").alias("tok"))
    freq = exploded.groupBy("tok").agg(F.count("*").alias("_df"))
    # Global order = (document frequency asc, token asc); prefix =
    # first sz - ceil(t*sz) + 1 tokens under that order.
    plen = (F.col("sz") - F.ceil(t * F.col("sz") - F.lit(1e-9)) + 1).cast("int")
    prefix = (
        exploded.join(freq, "tok")
        .groupBy(id_col, "sz")
        .agg(F.array_sort(F.collect_list(F.struct("_df", "tok"))).alias("_ord"))
        .select(
            id_col,
            "sz",
            F.explode(
                F.transform(F.slice("_ord", F.lit(1), plen), lambda s: s["tok"])
            ).alias("tok"),
        )
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # Length filter: J ≥ t forces min(|x|,|y|) ≥ t*max(|x|,|y|).
            & (F.least("a.sz", "b.sz").cast("double") >= t * F.greatest("a.sz", "b.sz") - F.lit(1e-9)),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    ta = arr.select(F.col(id_col).alias("id_a"), F.col("_toks").alias("_ta"), F.col("sz").alias("sz_a"))
    tb = arr.select(F.col(id_col).alias("id_b"), F.col("_toks").alias("_tb"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("sz_a") + F.col("sz_b") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def band_signatures_mapside(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, band_sig) computed with ZERO shuffle: the per-doc
    minhash columns concat directly into per-band signatures (the
    banding of ``lsh_candidate_pairs`` without its groupBy), so the
    transformation is STATELESS and legal on an unbounded stream —
    the signature stage of streaming near-dup detection. Matches the
    batch semantics exactly: seeds order within a band, band = seed
    div rows_per_band, and docs with < shingle_n tokens drop out
    (null minhash)."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    arr = _spread(docs).select(
        F.col(id_col),
        word_shingles(tokens(text_col), n=shingle_n).alias("_shs"),
    )
    per_doc = arr.select(id_col, *_minhash_cols(num_hashes)).filter(
        F.col("m0").isNotNull()
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"m{b * rows_per_band + i}") for i in range(rows_per_band)]
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    return per_doc.select(F.col(id_col), F.explode(band_structs).alias("x")).select(
        id_col, F.col("x.band").alias("band"), F.col("x.band_sig").alias("band_sig")
    )
