import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.operators.text import (
    bpe_ish_token_count,
    char_shingles,
    fingerprint,
    lang_id,
    quality_score,
    quality_signals,
    token_count,
    tokens,
    word_shingles,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], "text: string").select(
        expr.alias("x")
    ).collect()[0]["x"]


def test_tokens_and_count(spark):
    assert _one(spark, "Hello  World foo", tokens("text")) == ["hello", "world", "foo"]
    assert _one(spark, "Hello  World foo", token_count("text")) == 3
    assert _one(spark, "   ", token_count("text")) == 0


def test_bpe_ish_token_count(spark):
    # 3 word pieces + 2 punctuation marks
    assert _one(spark, "hello, world!", bpe_ish_token_count("text")) == 4


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles("text", 3))
    assert got == ["a b c", "b c d"]
    # shorter than n: no shingles (full n-gram semantics; the MinHash
    # sentinel path relies on the empty set)
    assert _one(spark, "a b", word_shingles("text", 3)) == []
    assert _one(spark, "", word_shingles("text", 3)) == []


def test_char_shingles(spark):
    assert _one(spark, "abcd", char_shingles("text", 3)) == ["abc", "bcd"]


def test_quality_signals_and_score(spark):
    text = "the cat sat on the mat with 42 things."
    sigs = quality_signals(F.col("text"))
    df = spark.createDataFrame([(text,)], "text: string").select(
        *[v.alias(k) for k, v in sigs.items()]
    )
    row = df.collect()[0]
    assert row["n_tokens"] == 9
    assert row["digit_ratio"] == pytest.approx(2 / len(text))
    assert 0 < row["stopword_ratio"] < 1
    score = _one(spark, text, quality_score("text"))
    assert 0.0 <= score <= 1.0


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of a house", lang_id("text")) == "en"
    assert _one(spark, "der hund und die katze ist da", lang_id("text")) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id("text")) == "und"


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "ab", fingerprint("text"))
    b = _one(spark, "ba", fingerprint("text"))
    assert a != b
    # deterministic
    assert a == _one(spark, "ab", fingerprint("text"))
    # fp('ab') = 1*97 + 2*98 = 293
    assert a == 293
