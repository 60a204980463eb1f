"""Unit tests: key derivation, date parsing, cleaning, profiling, flatten.

These encode the reference's behavioral contracts (SURVEY.md §2.6/§5):
sha2/concat_ws null semantics, to_date format order, typed null handling,
trim/dedup equivalence.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from weather_bigquery_lakehouse_spark.functions import (
    composite_key,
    consistency_violations,
    dedupe_rows,
    drop_null_rows,
    flatten_structs,
    normalize_names,
    parse_date_multi,
    profile,
    surrogate_key,
    trim_strings,
)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


class TestKeys:
    def test_surrogate_key_matches_sha256(self, spark):
        df = spark.createDataFrame([("hello",)], ["x"])
        assert df.select(surrogate_key("x").alias("k")).first()["k"] == _sha("hello")

    def test_surrogate_key_null_gives_null(self, spark):
        df = spark.createDataFrame([Row(x=None)], schema="x string")
        assert df.select(surrogate_key("x").alias("k")).first()["k"] is None

    def test_composite_key_skips_nulls(self, spark):
        # concat_ws null-skipping is part of the reference contract
        # (silver_to_gold.py:98-101): (a, NULL, c) hashes like (a, c).
        df = spark.createDataFrame([Row(a="a", b=None, c="c")], "a string, b string, c string")
        key = df.select(composite_key("a", "b", "c").alias("k")).first()["k"]
        assert key == _sha("a:c")

    def test_composite_key_casts_non_strings(self, spark):
        df = spark.createDataFrame([(1, 2)], ["a", "b"])
        assert df.select(composite_key("a", "b").alias("k")).first()["k"] == _sha("1:2")


class TestDates:
    def test_format_order_first_match_wins(self, spark):
        rows = [("2024-03-25",), ("25/03/2024",), ("03-25-2024",), ("garbage",), (None,)]
        df = spark.createDataFrame(rows, "s string")
        out = [r["d"] and str(r["d"]) for r in df.select(parse_date_multi("s").alias("d")).collect()]
        assert out == ["2024-03-25", "2024-03-25", "2024-03-25", None, None]

    def test_ambiguous_rejected_by_earlier_formats(self, spark):
        # '11-04-2024' must parse as MM-dd-yyyy (Nov 4), never dd/MM or ISO.
        df = spark.createDataFrame([("11-04-2024",)], "s string")
        assert str(df.select(parse_date_multi("s").alias("d")).first()["d"]) == "2024-11-04"


class TestCleaning:
    def test_drop_null_rows_handles_nan_for_floats(self, spark):
        df = spark.createDataFrame(
            [Row(a=1.0, b="x"), Row(a=float("nan"), b="y"), Row(a=None, b="z"), Row(a=2.0, b=None)],
            "a double, b string",
        )
        kept = drop_null_rows(df).collect()
        assert [(r["a"], r["b"]) for r in kept] == [(1.0, "x")]

    def test_trim_strings_only_touches_strings(self, spark):
        df = spark.createDataFrame([Row(a="  x  ", n=7)], "a string, n int")
        row = trim_strings(df).first()
        assert row["a"] == "x" and row["n"] == 7

    def test_dedupe_rows(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], ["x", "y"])
        assert dedupe_rows(df).count() == 2

    def test_normalize_names(self, spark):
        df = spark.createDataFrame([(1,)], ["regiao-imediata-id"])
        assert normalize_names(df).columns == ["regiao_imediata_id"]

    def test_removal_accounting_matches_eager_loop_semantics(self, spark):
        """One-agg accounting must equal the reference's per-column eager
        counts (data_cleaning.py:8-53) computed the naive way."""
        from weather_bigquery_lakehouse_spark.functions.cleaning import (
            removal_accounting,
        )

        df = spark.createDataFrame(
            [
                Row(a=1.0, s=" x ", t="k"),
                Row(a=float("nan"), s="y", t="k"),
                Row(a=None, s="z ", t=None),
                Row(a=2.0, s=None, t="m"),
                Row(a=2.0, s=None, t="m"),  # exact duplicate
            ],
            "a double, s string, t string",
        )
        row = removal_accounting(df).first()

        # naive eager-loop ground truth, reference semantics
        assert row["n_rows"] == df.count() == 5
        assert row["n_null_a"] == df.filter(
            F.col("a").isNull() | F.isnan("a")
        ).count() == 2
        assert row["n_null_s"] == df.filter(F.col("s").isNull()).count() == 2
        assert row["n_null_t"] == df.filter(F.col("t").isNull()).count() == 1
        assert row["n_untrimmed_s"] == df.filter(
            F.col("s").isNotNull() & (F.col("s") != F.trim("s"))
        ).count() == 2
        assert row["n_untrimmed_t"] == 0
        assert row["n_distinct_rows"] == df.dropDuplicates().count() == 4
        assert row["n_duplicate_rows"] == 1

    def test_quality_observer_rides_one_action(self, spark, tmp_path):
        """All three CollectMetrics points must resolve after the SINGLE
        write action — the zero-extra-pass contract of the silver quality
        accounting (a second scan of bronze at 100 TB would double the
        stage's read volume). Values must match the eager ground truth."""
        from weather_bigquery_lakehouse_spark.functions.cleaning import (
            dedupe_rows,
            drop_null_rows,
            trim_strings,
        )
        from weather_bigquery_lakehouse_spark.pipeline.silver import QualityObserver

        df = spark.createDataFrame(
            [
                Row(a=1.0, s=" x "),
                Row(a=float("nan"), s="y"),
                Row(a=None, s="z"),
                Row(a=2.0, s="m"),
                Row(a=2.0, s="m"),  # duplicate — removed by dedupe
            ],
            "a double, s string",
        )
        q = QualityObserver()
        mid = q.observe_mid(drop_null_rows(trim_strings(q.observe_pre(df))))
        out = q.observe_out(dedupe_rows(mid))
        out.write.mode("overwrite").parquet(str(tmp_path / "o"))  # ONE action
        q.write_report(spark, str(tmp_path / "z"), "e", "2024-03-25")
        rep = spark.read.parquet(str(tmp_path / "z") + "/silver/_quality/e").first()
        assert rep["rows_in"] == 5
        assert rep["n_null_a"] == 2  # NULL + NaN
        assert rep["n_untrimmed_s"] == 1
        assert rep["rows_out"] == 2  # 3 survive null filter, 1 dup removed
        assert rep["n_duplicate_rows"] == 1
        assert rep["entity"] == "e"
        assert str(rep["_processing_date"]) == "2024-03-25"


class TestProfiling:
    def test_profile_is_single_row(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b"), (2, None)], ["n", "s"])
        row = profile(df).first()
        assert row["count_n"] == 3 and row["distinct_n"] == 2
        assert row["count_s"] == 2 and row["min_n"] == 1 and row["max_n"] == 2

    def test_exact_quantiles_matches_percentile_and_numpy(self, spark):
        import numpy as np

        from weather_bigquery_lakehouse_spark.functions.profiling import (
            exact_quantiles,
        )

        vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 97, -4]]
        df = spark.createDataFrame([(v,) for v in vals], ["x"])
        ps = [0.05, 0.25, 0.5, 0.9]
        row = exact_quantiles(df, "x", ps, "x").first()
        spark_row = df.agg(
            *[
                F.round(F.percentile("x", F.lit(p)), 6).alias(f"p{int(p*100)}")
                for p in ps
            ]
        ).first()
        for p in ps:
            got = row[f"x_p{int(p*100)}"]
            assert got == spark_row[f"p{int(p*100)}"]
            assert abs(got - float(np.quantile(vals, p))) < 1e-6

    def test_exact_quantiles_with_nulls_and_duplicates(self, spark):
        from weather_bigquery_lakehouse_spark.functions.profiling import (
            exact_quantiles,
        )

        df = spark.createDataFrame(
            [(1.0,), (1.0,), (1.0,), (2.0,), (None,)], ["x"]
        )
        row = exact_quantiles(df, "x", [0.5, 1.0], "x").first()
        assert row["x_p50"] == 1.0  # nulls excluded, dup mass respected
        assert row["x_p100"] == 2.0

    def test_consistency_violations(self, spark):
        df = spark.createDataFrame(
            [("x", 1), ("x", 2), ("y", 3), ("y", 3)], ["name", "id"]
        )
        rows = consistency_violations(df, "name", "id").collect()
        assert [(r["name"], r["unique_ids"]) for r in rows] == [("x", 2)]


class TestFlatten:
    def test_flatten_nested_structs(self, spark):
        schema = T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField(
                    "uf",
                    T.StructType(
                        [
                            T.StructField("sigla", T.StringType()),
                            T.StructField(
                                "regiao",
                                T.StructType([T.StructField("nome", T.StringType())]),
                            ),
                        ]
                    ),
                ),
            ]
        )
        df = spark.createDataFrame([(1, ("SP", ("Sudeste",)))], schema)
        flat = flatten_structs(df)
        assert set(flat.columns) == {"id", "uf_sigla", "uf_regiao_nome"}
        assert flat.first()["uf_regiao_nome"] == "Sudeste"

    def test_arrays_left_intact(self, spark):
        df = spark.createDataFrame([(1, [1, 2])], "id int, xs array<int>")
        assert flatten_structs(df).columns == ["id", "xs"]


def test_distinct_counts_approx_within_hll_error(spark, sf_dir):
    """The HLL path (the 100 TB per-column distinct: sketches merge
    map-side, the shuffle carries one sketch per column instead of the
    full column) must land within the sketch's error envelope of exact."""
    from weather_bigquery_lakehouse_spark.functions.profiling import distinct_counts
    from weather_bigquery_lakehouse_spark.io.readers import load_testdata

    o = load_testdata(spark, sf_dir, ["orders"])["orders"]
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    exact = distinct_counts(o, cols).first()
    approx = distinct_counts(o, cols, approx=True).first()
    for c in cols:
        e, a = exact[f"distinct_{c}"], approx[f"distinct_{c}"]
        assert abs(a - e) <= max(2, 0.10 * e), (c, e, a)


def test_exact_group_quantiles_matches_reference_with_dominant_group(spark):
    """A group owning ~95% of the rows must still produce exact
    quantile_cont values — the design point is that a dominant group
    spans range partitions instead of buffering in one task."""
    from weather_bigquery_lakehouse_spark.functions.profiling import (
        exact_group_quantiles,
    )

    big = [("hot", float(v)) for v in range(1000)]
    small = [("cold", float(v)) for v in (3, 1, 4, 1, 5)]
    edge = [(None, 10.0), (None, 20.0), ("allnull", None)]  # SQL GROUP BY edges
    df = spark.createDataFrame(big + small + edge, "g string, x double").repartition(16)
    got = {
        r.g: (r.x_p25, r.x_p50, r.x_p95)
        for r in exact_group_quantiles(df, "g", "x", [0.25, 0.5, 0.95], "x").collect()
    }

    def ref(vals, p):
        s = sorted(vals)
        pos = p * (len(s) - 1)
        lo, hi = int(pos // 1), -(-pos // 1)
        return round(s[int(lo)] + (s[int(hi)] - s[int(lo)]) * (pos - lo), 6)

    for g, vals in (("hot", [v for _, v in big]), ("cold", [v for _, v in small])):
        assert got[g] == tuple(ref(vals, p) for p in (0.25, 0.5, 0.95)), g
    # NULL group aggregates like any other; all-NULL group emits NULL row
    assert got[None] == tuple(ref([10.0, 20.0], p) for p in (0.25, 0.5, 0.95))
    assert got["allnull"] == (None, None, None)


def test_expectation_report_counts_and_null_semantics(spark):
    """Expectations: exact pass/fail accounting, NULL predicate results
    count as failures, uniqueness flags duplicated keys, and a failing
    rule sets passed=0 while pass_ppm stays exact."""
    from pyspark.sql import functions as F

    from weather_bigquery_lakehouse_spark.functions.profiling import (
        expectation_report,
    )

    rows = [
        (1, 10.0),
        (2, -1.0),     # fails positive
        (3, None),     # NULL predicate result → counts as FAIL
        (1, 5.0),      # duplicate key
    ]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r["rule"]: (r["n_rows"], r["n_pass"], r["n_fail"], r["pass_ppm"], r["passed"])
        for r in expectation_report(
            df, [("positive(v)", F.col("v") > 0)], unique_cols=["k"]
        ).collect()
    }
    assert got["positive(v)"] == (4, 2, 2, 500_000, 0)
    assert got["unique(k)"] == (4, 3, 1, 750_000, 0)

    clean = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    ok = {
        r["rule"]: r["passed"]
        for r in expectation_report(
            clean, [("positive(v)", F.col("v") > 0)], unique_cols=["k"]
        ).collect()
    }
    assert ok == {"positive(v)": 1, "unique(k)": 1}

    # an empty expectation set is a config bug, not a vacuous pass
    import pytest

    with pytest.raises(ValueError, match="empty expectation"):
        expectation_report(clean, [])

    # NULL keys count as uniqueness failures: 3 rows, distinct non-null
    # keys = 1 → n_fail 2, even though no non-null key repeats
    nullk = spark.createDataFrame(
        [(1, 1.0), (None, 2.0), (None, 3.0)], "k long, v double"
    )
    u = {
        r["rule"]: (r["n_rows"], r["n_pass"], r["n_fail"], r["passed"])
        for r in expectation_report(nullk, [], unique_cols=["k"]).collect()
    }
    assert u["unique(k)"] == (3, 1, 2, 0)
