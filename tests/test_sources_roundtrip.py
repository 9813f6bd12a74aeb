"""Source/sink format coverage: the document schema must survive
JSON and CSV roundtrips (the reference's only interchange format was
whole-file JSON — SURVEY §1.1)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_json_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "docs_json")
    docs.write.mode("overwrite").json(p)
    back = spark.read.schema(docs.schema).json(p)
    assert back.count() == docs.count()
    # exact content equality via anti-joins both ways
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_csv_roundtrip_with_quoting(spark, tmp_path):
    docs = _docs(spark).select("doc_id", "lang", "source", "text")
    p = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(p)
    back = (
        spark.read.option("header", True)
        .option("escape", '"')
        .schema("doc_id bigint, lang string, source string, text string")
        .csv(p)
    )
    assert back.count() == docs.count()
    # text with embedded newlines/commas must survive quoting
    joined = docs.alias("a").join(back.alias("b"), "doc_id")
    mismatches = joined.filter(F.col("a.text") != F.col("b.text")).count()
    assert mismatches == 0
