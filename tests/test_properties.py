"""Property-based tests (hypothesis) for the cleaning combinators — the
SURVEY.md §5 plan item: model-check the tricky value transforms against a
plain-Python model over generated inputs, batched through one Spark call."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from pinterest_data_pipeline218_spark.functions.cleaning import (
    age_group,
    expand_count_suffixes,
)

_num = st.one_of(
    st.integers(min_value=0, max_value=10**6).map(str),
    st.tuples(
        st.integers(min_value=0, max_value=999), st.integers(min_value=1, max_value=9)
    ).map(lambda t: f"{t[0]}.{t[1]}"),
)
_suffix = st.sampled_from(["", "k", "K", "m", "M"])
_garbage = st.sampled_from(["", "User Info Error", "n/a", "12abc34", "k", "M", "-5k"])

follower_strings = st.one_of(
    st.tuples(_num, _suffix).map(lambda t: t[0] + t[1]), _garbage
)


def _model_expand(s: str):
    """The declared numeric semantics: leading decimal number, optional
    single k/M suffix, truncate-toward-zero after scaling; else NULL."""
    import re

    m = re.match(r"^([0-9]+\.?[0-9]*)", s)
    if not m or m.group(1) == "":
        return None
    mult = 1.0
    sm = re.search(r"([kKmM])$", s)
    if sm:
        mult = 1_000.0 if sm.group(1).upper() == "K" else 1_000_000.0
    v = int(float(m.group(1)) * mult)
    return v if -(2**31) <= v < 2**31 else None  # int overflow -> NULL (try_cast)


@settings(max_examples=30, deadline=None)
@given(st.lists(follower_strings, min_size=1, max_size=40))
def test_expand_count_suffixes_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["follower_count"])
    got = [
        r.follower_count
        for r in expand_count_suffixes(df, "follower_count").collect()
    ]
    assert got == [_model_expand(v) for v in values]


def _model_age_group(age):
    if age is None:
        return None
    if 18 <= age <= 24:
        return "18-24"
    if 25 <= age <= 35:
        return "25-35"
    if 36 <= age <= 50:
        return "36-50"
    if age > 50:
        return "+50"
    return None


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-5, 120)), min_size=1, max_size=60))
def test_age_group_matches_model(spark, ages):
    df = spark.createDataFrame([(a,) for a in ages], "age int")
    got = [r.g for r in df.select(age_group(F.col("age")).alias("g")).collect()]
    assert got == [_model_age_group(a) for a in ages]


def _model_asof(purchases, clicks):
    """Naive as-of LEFT semantics: greatest click ts <= purchase ts per user."""
    out = {}
    for pid, (u, t) in enumerate(purchases):
        cand = [ct for (cu, ct) in clicks if cu == u and ct <= t]
        out[pid] = max(cand) if cand else None
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
    ),
)
def test_asof_join_matches_model(spark, purchases, clicks):
    """Model-check asof_join (union + window carry-forward) against the
    obvious quadratic per-row max over generated user/ts sets — including
    ts ties (>= semantics), users with no clicks, and empty right sides."""
    from pinterest_data_pipeline218_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(pid, u, t) for pid, (u, t) in enumerate(purchases)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(u, t) for (u, t) in clicks] or [(99, -1)],  # dummy keeps schema; user 99 unused by left
        "user_id long, ts long",
    )
    got = {
        r.event_id: r.asof_ts
        for r in asof_join(left, right, key="user_id", ts="ts").collect()
    }
    assert got == _model_asof(purchases, clicks)
