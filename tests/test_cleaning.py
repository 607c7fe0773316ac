"""Unit tests for the cleaning combinators (SURVEY.md §5 plan item 1),
covering the reference's discovered edge cases: k/K/m/M suffixes, decimal
suffixes, sentinels, empty strings, all-null rows, index/ind rename,
string-vs-int age."""

import datetime as dt

import pyspark.sql.functions as F

from pinterest_data_pipeline218_spark.functions import cleaning as C


def test_expand_count_suffixes_numeric(spark):
    df = spark.createDataFrame(
        [("25k",), ("1M",), ("1.5k",), ("3K",), ("2m",), ("812",), ("User Info Error",), (None,)],
        "follower_count string",
    )
    got = [r[0] for r in C.expand_count_suffixes(df, "follower_count").collect()]
    assert got == [25_000, 1_000_000, 1_500, 3_000, 2_000_000, 812, None, None]


def test_expand_count_suffixes_compat_reproduces_reference_bug(spark):
    df = spark.createDataFrame([("25k",), ("1.5k",)], "follower_count string")
    got = [r[0] for r in C.expand_count_suffixes(df, "follower_count", compat=True).collect()]
    # The reference's string replace: "25k"→25000 fine, "1.5k"→"1.5000"→cast int→ null
    assert got == [25_000, None]


def test_null_out_like_sentinels(spark):
    df = spark.createDataFrame(
        [("No Title Data Available", "ok"), ("Real Title", "User Info Error")],
        "title string, poster_name string",
    )
    out = C.null_out_like(C.null_out_like(df, "title", "No Title Data%"),
                          "poster_name", "User Info Error%")
    rows = out.collect()
    assert rows[0].title is None and rows[0].poster_name == "ok"
    assert rows[1].title == "Real Title" and rows[1].poster_name is None


def test_empty_to_null_only_hits_strings(spark):
    df = spark.createDataFrame([("", 1), ("x", 2)], "category string, n int")
    rows = C.empty_to_null(df).collect()
    assert rows[0].category is None and rows[0].n == 1
    assert rows[1].category == "x"


def test_strip_prefix(spark):
    df = spark.createDataFrame(
        [("Local save in /data/art",), ("/data/diy",)], "save_location string"
    )
    got = [r[0] for r in C.strip_prefix(df, "save_location", C.SAVE_LOCATION_PREFIX).collect()]
    assert got == ["/data/art", "/data/diy"]


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "a", None), (3, "b", "c")], "ind int, x string, y string"
    )
    got = [r.ind for r in C.drop_all_null_rows(df, ["x", "y"]).collect()]
    assert got == [2, 3]


def test_age_group_buckets(spark):
    df = spark.createDataFrame([(17,), (18,), (24,), (25,), (35,), (36,), (50,), (51,), (None,)],
                               "age int")
    got = [r[0] for r in df.select(C.age_group(F.col("age")).alias("g")).collect()]
    assert got == [None, "18-24", "18-24", "25-35", "25-35", "36-50", "36-50", "+50", None]


def test_clean_user_contract(spark):
    from pinterest_data_pipeline218_spark.schemas import USER_RAW

    df = spark.createDataFrame(
        [(1, "Ada", "Lovelace", "36", "2016-05-01 10:00:00")], USER_RAW
    )
    rows = C.clean_user(df).collect()
    assert rows[0].user_name == "Ada Lovelace"
    assert rows[0].age == 36  # string age normalized to int
    assert rows[0].date_joined == dt.datetime(2016, 5, 1, 10, 0, 0)
    assert C.clean_user(df).columns == ["ind", "user_name", "age", "date_joined"]


def test_clean_geo_contract(spark):
    from pinterest_data_pipeline218_spark.schemas import GEO_RAW

    df = spark.createDataFrame(
        [(7, "2020-08-28 03:52:47", 1.5, -2.5, "Chile")], GEO_RAW
    )
    rows = C.clean_geo(df).collect()
    assert rows[0].coordinates == [1.5, -2.5]
    assert rows[0].timestamp == dt.datetime(2020, 8, 28, 3, 52, 47)
    assert C.clean_geo(df).columns == ["ind", "country", "coordinates", "timestamp"]


def test_clean_pin_contract_and_rename(clean_tables):
    pin, _, _ = clean_tables
    assert pin.columns == [
        "ind", "unique_id", "title", "description", "follower_count", "poster_name",
        "tag_list", "is_image_or_video", "image_src", "save_location", "category",
    ]
    assert dict(pin.dtypes)["follower_count"] == "int"
    # sentinels eliminated
    assert pin.filter(F.col("title") == "No Title Data Available").count() == 0
    assert pin.filter(F.col("tag_list").like("N,o, ,T,a,g,s,%")).count() == 0
    assert pin.filter(F.col("save_location").like("Local save in %")).count() == 0
    assert pin.filter(F.col("category") == "").count() == 0


def test_cleaning_idempotent(raw_tables):
    """Property: cleaning the cleaned pin table changes nothing that the
    second pass can touch (suffixes/sentinels/prefixes already gone)."""
    pin_raw, _, _ = raw_tables
    once = C.clean_pin(pin_raw)
    # re-apply the string-side combinators to the cleaned frame
    again = C.null_out_all_sentinels(C.empty_to_null(once))
    again = C.strip_prefix(again, "save_location", C.SAVE_LOCATION_PREFIX)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, again.collect()))
