"""BPE merge training (operators/bpe.py) — correctness of the greedy
fold, round-1 argmax parity vs DuckDB, symbol-count reconciliation,
and determinism. The query itself (q171) is rows-only: the training
loop is iterative and has no SQL equivalent."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline_usnvc_spark.operators.bpe import (
    adjacent_pair_counts,
    merge_pair,
    train_bpe,
    word_symbol_table,
)

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-zA-Z0-9]+'), t -> t <> '')"


def _apply(spark, seq: list[str], left: str, right: str) -> list[str]:
    df = spark.createDataFrame([(seq,)], "syms: array<string>")
    return df.select(merge_pair(F.col("syms"), left, right).alias("m")).head()["m"]


def test_merge_fold_basic(spark):
    assert _apply(spark, ["a", "b", "c"], "a", "b") == ["ab", "c"]
    assert _apply(spark, ["c", "a", "b"], "a", "b") == ["c", "ab"]
    assert _apply(spark, ["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]


def test_merge_fold_overlapping_run(spark):
    # Greedy leftmost non-overlapping: "a a a" with (a, a) -> [aa, a].
    assert _apply(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _apply(spark, ["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]


def test_merge_fold_no_match_and_edges(spark):
    assert _apply(spark, ["x", "y"], "a", "b") == ["x", "y"]
    assert _apply(spark, ["a"], "a", "b") == ["a"]
    assert _apply(spark, [], "a", "b") == []


def test_round1_argmax_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=1).collect()
    assert len(merges) == 1
    got = merges[0]
    expect = duckdb.sql(
        f"""
        WITH words AS (
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest({_TOKS_SQL}) AS word
                FROM '{sf_dir}/documents.parquet'
            ) GROUP BY word
        ),
        pairs AS (
            SELECT word[i:i] AS l, word[i+1:i+1] AS r, cnt
            FROM words, unnest(range(1, length(word))) AS t(i)
        )
        SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n FROM pairs
        GROUP BY l, r ORDER BY n DESC, l || chr(0) || r LIMIT 1
        """
    ).fetchone()
    assert (got["left"], got["right"], got["pair_count"]) == expect


def test_symbol_count_reconciliation(spark, sf_dir):
    """Replaying each learned merge shrinks the weighted symbol count
    by exactly the number of merged-symbol occurrences it created, and
    that number is within the greedy bounds [ceil(n/2), n] of the
    reported pair_count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=3).collect()
    assert merges, "expected at least one merge on the corpus"
    syms = word_symbol_table(docs)

    def weighted_len(df):
        return df.select(
            F.sum(F.size("syms") * F.col("cnt")).alias("s")
        ).head()["s"]

    for m in merges:
        before = weighted_len(syms)
        syms = syms.select(
            merge_pair(F.col("syms"), m["left"], m["right"]).alias("syms"), "cnt"
        ).localCheckpoint()
        after = weighted_len(syms)
        occurrences = syms.select(
            F.sum(
                F.size(F.filter("syms", lambda s: s == F.lit(m["merged"])))
                * F.col("cnt")
            ).alias("o")
        ).head()["o"]
        assert before - after == occurrences
        assert (m["pair_count"] + 1) // 2 <= occurrences <= m["pair_count"]


def test_training_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = [tuple(r) for r in train_bpe(docs, n_merges=3).collect()]
    b = [tuple(r) for r in train_bpe(docs, n_merges=3).collect()]
    assert a == b
    rounds = [r[0] for r in a]
    assert rounds == sorted(rounds)


def test_merged_pair_no_longer_adjacent(spark, sf_dir):
    """After applying round 1's merge, the (left, right) adjacency
    count is limited to what greedy overlap legitimately leaves
    (zero unless left == right or chains re-create it)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=1).collect()
    m = merges[0]
    syms = word_symbol_table(docs)
    merged_syms = syms.select(
        merge_pair(F.col("syms"), m["left"], m["right"]).alias("syms"), "cnt"
    )
    pair_key = m["left"] + "\x00" + m["right"]
    remaining = (
        adjacent_pair_counts(merged_syms)
        .filter(F.col("pair") == pair_key)
        .collect()
    )
    if m["left"] != m["right"]:
        assert remaining == [] or remaining[0]["n"] < m["pair_count"]
    else:
        # (x, x) on an odd run leaves one trailing x that can pair
        # with a following fresh x only across merge boundaries —
        # still strictly fewer than before.
        assert remaining == [] or remaining[0]["n"] < m["pair_count"]


def _py_bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference greedy-leftmost-non-overlapping BPE encoder."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_q219_encode_matches_reference(spark, sf_dir):
    """q219's chained-fold encoding equals a reference Python BPE
    encoder applying the SAME trained merges, and every round-trip
    contract holds (the in-plan assert_true would have errored
    otherwise)."""
    from pipeline_usnvc_spark.plans import QUERIES

    rows = QUERIES["q219_bpe_encode"](spark, sf_dir).collect()
    assert len(rows) == 20
    from pipeline_usnvc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(docs, n_merges=5).orderBy("merge_round").collect()
    ]
    for r in rows:
        want = _py_bpe_encode(r["word"], merges)
        assert r["encoding"].split(" ") == want, (r["word"], r["encoding"], want)
        assert r["roundtrip_ok"]
        assert r["n_tokens"] == len(want)
        assert r["corpus_tokens"] <= r["corpus_chars"]


def test_q171_contract_fires_on_wrong_first_merge(spark, sf_dir, monkeypatch):
    """The in-plan training contract recounts round 1's best pair; a
    tampered merge table must raise at execution time."""
    import pytest
    from pyspark.sql import functions as F

    import pipeline_usnvc_spark.operators.bpe as bpe
    from pipeline_usnvc_spark.plans import QUERIES

    orig = bpe.train_bpe

    def tampered(docs, n_merges=5, text_col="text", min_pair_count=2):
        out = orig(docs, n_merges, text_col, min_pair_count)
        return out.withColumn(
            "pair_count",
            F.when(F.col("merge_round") == 1, F.col("pair_count") + 1).otherwise(
                F.col("pair_count")
            ),
        )

    monkeypatch.setattr(bpe, "train_bpe", tampered)
    with pytest.raises(Exception, match="merge-table contract breach"):
        QUERIES["q171_bpe_merge_train"](spark, sf_dir).count()


def test_oracle_chain_early_break_passthrough():
    """The shared chained-CTE oracle's early-break semantics, pinned
    on a crafted corpus where training dries up after ONE merge:
    later m-CTEs must be empty (q171 emits exactly one round) while
    the s-CTEs pass every word through UNCHANGED (q219 keeps the full
    vocabulary with only the learned merge applied) — the LEFT JOIN
    identity-fold path, which a CROSS JOIN would silently empty."""
    import duckdb

    from pipeline_usnvc_spark.plans.curation_queries import (
        _q171_oracle,
        _q219_oracle,
    )

    con = duckdb.connect()
    # 'ab' x2 is the only pair reaching min_pair_count=2; after merging
    # it, every remaining adjacent pair is unique -> rounds 2..5 empty.
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES"
        " (1, 'abcx'), (2, 'abdy'), (3, 'z')) t(doc_id, text)"
    )
    merges = con.execute(_q171_oracle()).fetchall()
    assert [(r[0], r[1], r[2]) for r in merges] == [(1, "a", "b")]

    enc = {
        r[0]: r[4]
        for r in con.execute(_q219_oracle()).fetchall()
    }
    assert enc == {"abcx": "ab c x", "abdy": "ab d y", "z": "z"}
    vocab_sizes = {r[8] for r in con.execute(_q219_oracle()).fetchall()}
    assert vocab_sizes == {3}
