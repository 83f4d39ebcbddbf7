"""Error bounds for the sketch-based operators (no SQL oracle by
nature): HLL distinct and GK quantiles vs their exact companions."""

from __future__ import annotations

from sync_spark.operators.extended_queries import a_approx_distinct, a_quantile_sketch


def test_hll_within_published_error(spark, sf_oracle):
    row = a_approx_distinct(spark, sf_oracle).collect()[0]
    # default rsd = 0.05; allow 3 sigma
    assert abs(row.approx_users - row.exact_users) <= max(3, 0.15 * row.exact_users)


def test_gk_quantiles_within_accuracy(spark, sf_oracle):
    rows = a_quantile_sketch(spark, sf_oracle).collect()
    assert len(rows) > 0
    for r in rows:
        # accuracy=1000 → rank error ≤ 1/1000; values span ~[0,100] so
        # a loose value tolerance of 2% of the exact value + 0.5 abs
        assert abs(r.p50_approx - r.p50_exact) <= 0.02 * abs(r.p50_exact) + 0.5
        assert abs(r.p99_approx - r.p99_exact) <= 0.02 * abs(r.p99_exact) + 0.5
