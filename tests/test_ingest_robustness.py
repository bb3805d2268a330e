"""Ingest robustness: malformed rows, quoted/multiline fields,
encoding — the PERMISSIVE contract of sources/delimited.py on hostile
real-world TSV input.
"""

from __future__ import annotations

from pyspark.sql import types as T

from pipeline_usnvc_spark.sources.delimited import read_delimited

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("note", T.StringType()),
    ]
)


def test_malformed_rows_become_nulls_not_failures(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text(
        "id\tn\tnote\n"
        "a\t1\tok\n"
        "b\tNOT_AN_INT\tstill here\n"  # bad int -> null cell, row kept
        "c\t3\n"                        # missing column -> null
        "d\t4\tfine\n",
        encoding="ISO-8859-1",
    )
    df = read_delimited(spark, str(p), SCHEMA)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert rows["b"]["n"] is None and rows["b"]["note"] == "still here"
    assert rows["c"]["note"] is None
    assert rows["d"]["n"] == 4


def test_quoted_multiline_and_latin1(spark, tmp_path):
    p = tmp_path / "quoted.txt"
    p.write_text(
        "id\tn\tnote\n"
        'a\t1\t"line one\nline two"\n'
        "b\t2\tM\xfcller caf\xe9\n",
        encoding="ISO-8859-1",
    )
    df = read_delimited(spark, str(p), SCHEMA, multiline=True)
    rows = {r["id"]: r for r in df.collect()}
    assert rows["a"]["note"] == "line one\nline two"
    assert rows["b"]["note"] == "Müller café"
    # without multiline the same file mis-splits the quoted row —
    # documents why rich-text tables opt in
    df2 = read_delimited(spark, str(p), SCHEMA, multiline=False)
    rows2 = {r["id"]: r for r in df2.collect() if r["id"] in rows}
    assert rows2["a"]["note"] != "line one\nline two"


def test_jsonl_corrupt_lines_quarantine(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pipeline_usnvc_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        '{"doc_id": 3, "text": "gamma", TRUNCATED\n'
        "not json at all\n"
        '{"doc_id": 4, "text": "delta"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, quarantine = read_jsonl(spark, str(p), schema)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 4]
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("TRUNCATED" in b for b in bad)
    assert any("not json" in b for b in bad)


def test_jsonl_all_good_lines(spark, tmp_path):
    from pipeline_usnvc_spark.sources.jsonl import read_jsonl

    p = tmp_path / "clean.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    good, quarantine = read_jsonl(spark, str(p))
    assert good.count() == 2
    assert quarantine.count() == 0


def test_parquet_schema_evolution_merges(spark, tmp_path):
    from pipeline_usnvc_spark.sources.jsonl import read_parquet_evolved

    old = tmp_path / "v1"
    new = tmp_path / "v2"
    spark.createDataFrame([(1, "a")], "id long, text string").write.parquet(str(old))
    spark.createDataFrame(
        [(2, "b", "en")], "id long, text string, lang string"
    ).write.parquet(str(new))
    df = read_parquet_evolved(spark, str(old), str(new))
    assert set(df.columns) == {"id", "text", "lang"}
    rows = {r.id: r.lang for r in df.collect()}
    assert rows[1] is None and rows[2] == "en"
