"""Edge-case unit tests on tiny in-memory DataFrames (SURVEY.md §5.2 layer
3): the cases the synthetic tables can't produce — NULL join keys, empty
groups, empty arrays, malformed JSON — plus property-style invariants
(semi ∪ anti partitions the left table; window totals ≡ group totals)."""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from modforms_db_spark.io import load
from modforms_db_spark.registry import get_registry

from tests.conftest import SF_DIR


def test_null_keys_dont_equijoin(spark):
    left = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x"), (None, "y")], "k int, w string")
    assert left.join(right, "k").count() == 1  # null != null
    # Null-safe equality treats the nulls as equal.
    nsafe = left.alias("l").join(
        right.alias("r"), F.col("l.k").eqNullSafe(F.col("r.k"))
    )
    assert nsafe.count() == 2


def test_semi_anti_partition_left(spark):
    cust = load(spark, SF_DIR, "customer").select("c_custkey")
    orders = load(spark, SF_DIR, "orders").select("o_custkey")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    assert semi.count() + anti.count() == cust.count()
    assert semi.intersect(anti).count() == 0


def test_window_totals_equal_group_totals(spark):
    orders = load(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    via_window = (
        orders.select("o_custkey", F.sum("o_totalprice").over(w).alias("t"))
        .groupBy("o_custkey")
        .agg(F.max("t").alias("t"))
    )
    via_group = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("t"))
    assert via_window.exceptAll(via_group).count() == 0


def test_dedup_groups_cover_collisions(spark):
    """Every doc in a canonical-dup group shares its token set with the
    group's min_doc_id doc; group sizes ≥ 2."""
    out = get_registry()["q_dedup_canonical"].builder(spark, SF_DIR).collect()
    for r in out:
        assert r["n"] >= 2


def test_explode_empty_array(spark):
    df = spark.createDataFrame(
        [Row(id=1, arr=["a"]), Row(id=2, arr=[]), Row(id=3, arr=None)]
    )
    assert df.select("id", F.explode("arr")).count() == 1
    assert df.select("id", F.explode_outer("arr")).count() == 3


def test_malformed_json_yields_null(spark):
    schema = T.StructType([T.StructField("k", T.LongType())])
    df = spark.createDataFrame(
        [("{\"k\": 1}",), ("not json",), (None,)], "props string"
    )
    parsed = df.select(F.from_json("props", schema).alias("j")).collect()
    assert parsed[0]["j"]["k"] == 1
    assert parsed[1]["j"] is None or parsed[1]["j"]["k"] is None
    assert parsed[2]["j"] is None


def test_empty_group_agg(spark):
    df = spark.createDataFrame([], "k int, v double")
    out = df.groupBy("k").agg(F.sum("v")).collect()
    assert out == []
    # Global agg over empty input: count 0, sum NULL — SQL semantics.
    row = df.agg(F.count("v").alias("c"), F.sum("v").alias("s")).first()
    assert row["c"] == 0 and row["s"] is None


def test_ties_broken_deterministically(spark):
    """q_win_topk_pergroup must be replay-stable: two runs, same rows."""
    b = get_registry()["q_win_topk_pergroup"].builder
    a = sorted(map(tuple, b(spark, SF_DIR).collect()))
    c = sorted(map(tuple, b(spark, SF_DIR).collect()))
    assert a == c


def test_knn_symmetric_under_exact_cosine(spark):
    """Exact cosine is symmetric: if b is in a's candidate pairs with
    similarity s, then a is in b's with the same s (checked on the
    threshold variant which emits both directions deduped to a<b)."""
    out = get_registry()["q_sim_threshold"].builder(spark, SF_DIR)
    pairs = out.select("v1", "v2").collect()
    assert all(r["v1"] < r["v2"] for r in pairs)


def test_salted_join_spreads_hot_key_and_preserves_result(spark):
    """q_join_skew_salted's mechanics on a synthetic skewed input: one hot
    key (80% of rows) must be spread over >1 salt sub-key, and the salted
    join must return exactly the plain join's rows."""
    S = 8
    fact = spark.createDataFrame(
        [(1, i) for i in range(400)] + [(k, 1000 + k) for k in range(2, 102)],
        "k int, seq int",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 102)], "k int, w string")

    salted_fact = fact.withColumn("salt", F.pmod(F.xxhash64("k", "seq"), F.lit(S)))
    salted_dim = dim.withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(S)])))

    # The hot key's 400 rows land on several sub-keys, not one reducer.
    hot_salts = (
        salted_fact.where(F.col("k") == 1).select("salt").distinct().count()
    )
    assert hot_salts == S  # 400 draws over 8 buckets: all hit w.p. ~1

    plain = fact.join(dim, "k").select("k", "seq", "w")
    salted = salted_fact.join(
        salted_dim, ["k", "salt"]
    ).select("k", "seq", "w")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_approx_percentile_within_rank_tolerance(spark):
    """The query is self-validating (GK estimate must land between the
    exact q±0.01 interpolated percentiles, computed in the same pass);
    assert every group's booleans came out TRUE and the group counts
    reconcile with the table."""
    reg = get_registry()
    rows = reg["q_agg_approx_percentile"].builder(spark, SF_DIR).collect()
    orders = load(spark, SF_DIR, "orders")
    assert len(rows) == 5
    assert sum(r.n_orders for r in rows) == orders.count()
    for r in rows:
        assert r.median_within and r.p90_within, r


def test_driver_verified_row_classification():
    """The registry's window rotation depends on classifying driver
    CORRECTNESS rows correctly: hash matches and clean rows-only runs
    are verified; errors and hash mismatches must re-enter the window."""
    from modforms_db_spark.registry import _driver_verified_names, _is_verified_row

    ok_hash = {"rows_match": True, "schema_match": True, "hash_match": True,
               "spark_rows": 5, "oracle_rows": 5, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 5, "oracle_rows": None, "err": None}
    no_oracle = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 1, "oracle_rows": None, "err": "no_oracle"}
    mismatch = {"rows_match": True, "schema_match": True, "hash_match": False,
                "spark_rows": 5, "oracle_rows": 5, "err": None}
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": "AnalysisException"}
    assert _is_verified_row(ok_hash)
    assert _is_verified_row(rows_only)
    assert not _is_verified_row(no_oracle)
    assert not _is_verified_row(mismatch)
    assert not _is_verified_row(crashed)
    # Integration: every r1-green name must be in the verified set, and
    # the five reformulated no_oracle names must NOT be.
    seen = _driver_verified_names()
    assert "q_agg_flagship" in seen and "q_join_broadcast" in seen
    for name in ("q_scan_metadata", "q_agg_approx_distinct",
                 "q_agg_approx_percentile", "q_agg_hll_merge",
                 "q_stat_freq_items"):
        assert name not in seen, name


def test_driver_window_orders_unverified_first():
    """queries() must lead with names lacking a green CORRECTNESS row so
    the driver's 50-query sample always covers fresh operators."""
    from modforms_db_spark.registry import _driver_verified_names, get_queries

    seen = _driver_verified_names()
    names = list(get_queries())
    first_seen_verified = next(
        (i for i, n in enumerate(names) if n in seen), len(names)
    )
    # No unverified name may appear after the first verified one.
    assert all(n in seen for n in names[first_seen_verified:])
    assert first_seen_verified >= 50  # window is fully unverified
