"""Normalization + shingling vs hand-computed values (pure Catalyst ops)."""

from pyspark.sql import functions as F

from entity_deduplication_spark.functions.text import (
    char_shingles,
    normalize_text,
    tokens,
    word_shingles,
)


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [("  Hello,   WORLD! foo-bar  ",), ("",), ("a.b,c",)], ["t"]
    )
    out = [r[0] for r in df.select(normalize_text(F.col("t"))).collect()]
    assert out == ["hello world foo bar", "", "a b c"]


def test_tokens(spark):
    df = spark.createDataFrame([("One two THREE",)], ["t"])
    assert df.select(tokens(F.col("t"))).first()[0] == ["one", "two", "three"]


def test_word_shingles_count_and_determinism(spark):
    df = spark.createDataFrame([("a b c d e",), ("a b c d e",), ("x y",)], ["t"])
    rows = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    # 5 words, k=3 -> 3 shingles (all distinct here)
    assert len(rows[0]["s"]) == 3
    assert rows[0]["s"] == rows[1]["s"]  # deterministic
    # short text falls back to single whole-text shingle
    assert len(rows[2]["s"]) == 1


def test_word_shingles_shift_overlap(spark):
    # one token dropped at the front shifts shingles; overlap must be high
    df = spark.createDataFrame(
        [("w1 w2 w3 w4 w5 w6 w7 w8",), ("w2 w3 w4 w5 w6 w7 w8",)], ["t"]
    )
    rows = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    s1, s2 = set(rows[0]["s"]), set(rows[1]["s"])
    assert len(s1 & s2) == len(s2)  # suffix shingles all shared


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcdefgh",), ("ab",)], ["t"])
    rows = df.select(char_shingles(F.col("t"), 5).alias("s")).collect()
    assert len(rows[0]["s"]) == 4  # 8-5+1
    assert len(rows[1]["s"]) == 1  # fallback
