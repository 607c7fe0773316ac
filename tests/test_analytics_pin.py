"""Golden end-to-end tests for T4..T11 over cleaned pin/geo/user
(SURVEY.md §5 plan item 2): DataFrame mode vs a DuckDB oracle running
equivalent SQL on the same cleaned data, plus DataFrame-vs-SQL-compat
agreement and the reference's semantic properties (rank ties, join row
preservation)."""

import pyspark.sql.functions as F
import pytest

from pinterest_data_pipeline218_spark.operators import analytics as A

from conftest import canon, rows_set


@pytest.fixture(scope="module")
def duck(clean_tables, tmp_path_factory):
    """DuckDB with views over the Spark-cleaned tables (checks query
    semantics against an independent engine; cleaning itself is unit-tested)."""
    import duckdb

    out = tmp_path_factory.mktemp("clean_parquet")
    pin, geo, user = clean_tables
    con = duckdb.connect()
    for name, df in (("pin_table", pin), ("geo_table", geo), ("user_table", user)):
        p = str(out / name)
        df.write.mode("overwrite").parquet(p)
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}/*.parquet'")
    return con


def oracle_rows(duck, sql):
    return sorted(tuple(canon(v) for v in row) for row in duck.sql(sql).fetchall())


AGE_SQL = A.SQL_COMPAT["t8"].split("WHEN age")[0]  # unused; kept simple below

AGE_CASE = """CASE WHEN age BETWEEN 18 AND 24 THEN '18-24'
                   WHEN age BETWEEN 25 AND 35 THEN '25-35'
                   WHEN age BETWEEN 36 AND 50 THEN '36-50'
                   WHEN age > 50 THEN '+50' END"""


def test_t4_vs_oracle(clean_tables, duck):
    pin, geo, _ = clean_tables
    got = rows_set(A.t4_top_category_per_country(pin, geo))
    want = oracle_rows(duck, """
        WITH c AS (
          SELECT country, category, COUNT(*) AS category_count
          FROM pin_table JOIN geo_table USING (ind) GROUP BY 1, 2
        ), r AS (SELECT *, RANK() OVER (PARTITION BY country ORDER BY category_count DESC) rk FROM c)
        SELECT DISTINCT country, category, category_count FROM r WHERE rk = 1
    """)
    assert got == want


def test_t5_vs_oracle(clean_tables, duck):
    pin, geo, _ = clean_tables
    got = rows_set(A.t5_category_counts_by_year(pin, geo))
    want = oracle_rows(duck, """
        SELECT CAST(EXTRACT(YEAR FROM timestamp) AS INT) AS post_year, category,
               COUNT(category) AS category_count
        FROM pin_table JOIN geo_table USING (ind)
        WHERE EXTRACT(YEAR FROM timestamp) BETWEEN 2018 AND 2022
        GROUP BY 1, 2
    """)
    assert got == want


def test_t6_vs_oracle(clean_tables, duck):
    pin, geo, user = clean_tables
    top = A.t6p1_top_follower_per_country(pin, geo, user)
    got = rows_set(top)
    want = oracle_rows(duck, """
        WITH r AS (
          SELECT country, poster_name, follower_count,
                 RANK() OVER (PARTITION BY country ORDER BY follower_count DESC) rk
          FROM geo_table JOIN user_table USING (ind) JOIN pin_table USING (ind)
        )
        SELECT DISTINCT country, poster_name, follower_count FROM r WHERE rk = 1
    """)
    assert got == want
    # t6p2: single deterministic row
    assert A.t6p2_top_country(top).count() == 1


def test_t6_rank_tie_preserved(clean_tables):
    """The generator plants two Liechtenstein users tied at 500k — RANK must
    return both (BatchProcessingFinal.ipynb:5687 semantics)."""
    pin, geo, user = clean_tables
    tie = (
        A.t6p1_top_follower_per_country(pin, geo, user)
        .filter(F.col("country") == "Liechtenstein")
        .collect()
    )
    assert len(tie) == 2
    assert all(r.follower_count == 500_000 for r in tie)


def test_t7_vs_oracle(clean_tables, duck):
    pin, _, user = clean_tables
    got = rows_set(A.t7_top_category_per_age_group(pin, user))
    want = oracle_rows(duck, f"""
        WITH c AS (
          SELECT {AGE_CASE} AS age_group, category, COUNT(category) AS category_count
          FROM pin_table JOIN user_table USING (ind) GROUP BY 1, 2
        ), r AS (SELECT *, RANK() OVER (PARTITION BY age_group ORDER BY category_count DESC) rk FROM c)
        SELECT DISTINCT age_group, category, category_count FROM r WHERE rk = 1
    """)
    assert got == want


def test_t8_vs_oracle_exact_median(clean_tables, duck):
    pin, _, user = clean_tables
    got = rows_set(A.t8_median_follower_by_age_group(pin, user))
    want = oracle_rows(duck, f"""
        SELECT {AGE_CASE} AS age_group,
               CAST(QUANTILE_CONT(follower_count, 0.5) AS DOUBLE) AS median_follower_count
        FROM pin_table JOIN user_table USING (ind) GROUP BY 1
    """)
    assert got == want


def test_t9_vs_oracle(clean_tables, duck):
    _, _, user = clean_tables
    got = rows_set(A.t9_users_joined_by_year(user))
    want = oracle_rows(duck, """
        SELECT CAST(EXTRACT(YEAR FROM date_joined) AS INT) AS post_year,
               COUNT(user_name) AS number_users_joined
        FROM user_table
        WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        GROUP BY 1
    """)
    assert got == want


def test_t10_t11_vs_oracle(clean_tables, duck):
    pin, _, user = clean_tables
    got10 = rows_set(A.t10_median_follower_by_join_year(pin, user))
    want10 = oracle_rows(duck, """
        SELECT CAST(EXTRACT(YEAR FROM date_joined) AS INT) AS post_year,
               CAST(QUANTILE_CONT(follower_count, 0.5) AS DOUBLE) AS median_follower_count
        FROM pin_table JOIN user_table USING (ind)
        WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        GROUP BY 1
    """)
    assert got10 == want10
    got11 = rows_set(A.t11_median_follower_by_join_year_age(pin, user))
    want11 = oracle_rows(duck, f"""
        SELECT {AGE_CASE} AS age_group,
               CAST(EXTRACT(YEAR FROM date_joined) AS INT) AS post_year,
               CAST(QUANTILE_CONT(follower_count, 0.5) AS DOUBLE) AS median_follower_count
        FROM pin_table JOIN user_table USING (ind)
        WHERE EXTRACT(YEAR FROM date_joined) BETWEEN 2015 AND 2020
        GROUP BY 1, 2
    """)
    assert got11 == want11


def test_dataframe_vs_sql_compat(spark, clean_tables):
    """The idiomatic DataFrame plans and the reference's SQL shapes agree."""
    pin, geo, user = clean_tables
    A.register_views(pin, geo, user)
    pairs = [
        (A.t4_top_category_per_country(pin, geo), "t4"),
        (A.t5_category_counts_by_year(pin, geo), "t5"),
        (A.t6p1_top_follower_per_country(pin, geo, user), "t6p1"),
        (A.t6p2_top_country(A.t6p1_top_follower_per_country(pin, geo, user)), "t6p2"),
        (A.t7_top_category_per_age_group(pin, user), "t7"),
        (A.t8_median_follower_by_age_group(pin, user), "t8"),
        (A.t9_users_joined_by_year(user), "t9"),
        (A.t10_median_follower_by_join_year(pin, user), "t10"),
        (A.t11_median_follower_by_join_year_age(pin, user), "t11"),
    ]
    for df, key in pairs:
        compat = A.run_sql_compat(spark, key)
        assert rows_set(df) == rows_set(compat), key


def test_join_preserves_rowcount(clean_tables):
    """Property: pin/geo/user are 1:1 on ind → the 3-way inner join has
    exactly one row per key present in all three tables (pollution rows
    dropped by cleaning shrink pin/geo but not user)."""
    pin, geo, user = clean_tables
    n = pin.join(geo, "ind").join(user, "ind").count()
    keys = (
        pin.select("ind")
        .intersect(geo.select("ind"))
        .intersect(user.select("ind"))
        .count()
    )
    assert n == keys
    assert user.count() >= pin.count() == geo.count()


def test_approx_median_within_rank_bounds(clean_tables):
    """percentile_approx(.., 0.5) returns an actual group element (no
    interpolation) — assert it lies between the exact 40th and 60th
    percentiles of its group (reference compat mode, README.md:213)."""
    pin, _, user = clean_tables
    joined = pin.join(user, "ind").withColumn(
        "age_group", __import__("pinterest_data_pipeline218_spark.functions.cleaning",
                                fromlist=["age_group"]).age_group(F.col("age"))
    )
    bounds = {
        r.age_group: (r.p40, r.p60)
        for r in joined.groupBy("age_group")
        .agg(
            F.percentile("follower_count", F.lit(0.4)).alias("p40"),
            F.percentile("follower_count", F.lit(0.6)).alias("p60"),
        )
        .collect()
    }
    approx = dict(
        (r.age_group, r.median_follower_count)
        for r in A.t8_median_follower_by_age_group(pin, user, approx=True).collect()
    )
    for k, (lo, hi) in bounds.items():
        if approx[k] is None:
            assert lo is None
        else:
            assert lo <= approx[k] <= hi, k


def test_funnel_ordering_semantics(spark, tmp_path):
    """The funnel's defining rule, hand-pinned: a user whose click PRECEDES
    their first view does NOT convert at step 2 (per-type distinct counts
    would wrongly count them), and a purchase before the qualifying click
    does not convert at step 3."""
    import datetime as dt

    from pinterest_data_pipeline218_spark.plans.events import ev_funnel_steps

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, user, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        # user 1: view -> click -> purchase, fully ordered: converts all 3
        ev(1, 1, "view", 0), ev(2, 1, "click", 5), ev(3, 1, "purchase", 10),
        # user 2: click BEFORE the first view, none after: stops at step 1
        ev(4, 2, "click", 0), ev(5, 2, "view", 5),
        # user 3: view, click, but purchase BEFORE the click: stops at step 2
        ev(6, 3, "view", 0), ev(7, 3, "purchase", 2), ev(8, 3, "click", 4),
        # user 4: never viewed: appears nowhere
        ev(9, 4, "click", 0), ev(10, 4, "purchase", 1),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.step: (r.n_users, r.conv_bp) for r in ev_funnel_steps(spark, str(tmp_path)).collect()}
    # step 1: users 1,2,3 viewed; step 2: only 1 and 3 clicked after their
    # view; step 3: only user 1 purchased after the qualifying click
    assert got == {1: (3, 10000), 2: (2, 6666), 3: (1, 3333)}


def test_retention_cohort_offsets_hand_computed(spark, tmp_path):
    """Retention triangle semantics, hand-pinned: a user active in their
    cohort week and again two ISO weeks later contributes to offsets 0 and
    2 (not 1); two users first seen in different weeks land in different
    cohorts; within-week repeat activity counts once."""
    import datetime as dt

    from pinterest_data_pipeline218_spark.plans.events import ev_retention_cohorts

    # 2024-01-01 is a Monday: clean ISO week boundaries
    mon1 = dt.datetime(2024, 1, 1, 9, 0, 0)
    mon2 = mon1 + dt.timedelta(weeks=1)
    mon3 = mon1 + dt.timedelta(weeks=2)

    def ev(i, user, ts):
        return (i, ts, user, "view", 1.0, "{}")

    rows = [
        # user 1: cohort week 1, active weeks 1 and 3 -> offsets {0, 2}
        ev(1, 1, mon1),
        ev(2, 1, mon1 + dt.timedelta(days=3)),  # same week: counts once
        ev(3, 1, mon3),
        # user 2: cohort week 2 only -> offset {0} in the week-2 cohort
        ev(4, 2, mon2 + dt.timedelta(days=1)),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.cohort_week.isoformat(), r.week_offset): r.n_users
        for r in ev_retention_cohorts(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }
