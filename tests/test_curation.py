"""Crafted-input tests for the redaction pipeline (the synthetic corpus
contains no emails or digit runs, so the oracle never exercises those
branches — these inputs do)."""

from __future__ import annotations

from pyspark.sql import functions as F

from velib_lakehouse_spark.operators.curation import clean_text_expr


def _clean(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(clean_text_expr(F.col("text")).alias("c")).collect()[0].c


def test_email_redaction(spark):
    assert (
        _clean(spark, "Contact John.Doe+spam@Example.co.uk today")
        == "contact <email> today"
    )


def test_long_digit_runs_masked_short_kept(spark):
    assert _clean(spark, "call 4155551234 or ext 42") == "call <number> or ext 42"


def test_symbols_stripped_whitespace_collapsed(spark):
    assert _clean(spark, "A  B\t(c)! [d]#e") == "a b c d e"


def test_idempotent_on_clean_text(spark):
    once = _clean(spark, "Order 1234567 from a.b@c.de NOW!!")
    assert once == "order <number> from <email> now"
    assert _clean(spark, once) == once
