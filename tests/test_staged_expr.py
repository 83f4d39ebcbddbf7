"""The staged-expression memo (r11 optimization round): reusing one
frame-independent Column tree per SparkContext must be observationally
identical to rebuilding it, and the cache must die with its context."""

import pytest
from pyspark.sql import functions as F

from sync_spark.functions import text as T


@pytest.fixture(scope="module")
def spark():
    from sync_spark.session import get_spark

    return get_spark("test_staged_expr")


def test_same_object_per_key(spark):
    a = T.staged_expr("t.tokens(text)", lambda: T.tokens(F.col("text")))
    b = T.staged_expr("t.tokens(text)", lambda: T.tokens(F.col("text")))
    assert a is b  # the whole point: zero rebuild cost on a hit


def test_memoized_equals_fresh(spark):
    df = spark.createDataFrame(
        [("a b the c",), ("",), ("   ",), ("der und ist",)], "text string"
    )
    staged = df.withColumn("__toks", T.tokens(F.col("text")))
    got = staged.select(
        T.quality_named().alias("q"), T.langid_named().alias("l")
    ).collect()
    want = staged.select(
        T.quality_score_toks(F.col("__toks"), F.col("text")).alias("q"),
        T.langid_toks(F.col("__toks")).alias("l"),
    ).collect()
    assert got == want


def test_cache_invalidates_on_new_context(spark):
    key = "t.invalidation_probe"
    first = T.staged_expr(key, lambda: F.lit(1))
    # simulate a context swap: the generation guard must drop the entry
    T._STAGED["__sc"] = object()
    second = T.staged_expr(key, lambda: F.lit(2))
    assert first is not second
    # restore a consistent cache for the other tests in this session
    T._STAGED.clear()
