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


def _model_dupspan(docs: dict[int, list[str]], n: int = 10):
    """Naive reference for dupspan_remove: count every n-token window
    corpus-wide, mark positions covered by any window occurring >= 2
    times, rebuild the surviving tokens in order."""
    from collections import Counter

    counts = Counter()
    for toks in docs.values():
        for i in range(len(toks) - n + 1):
            counts[" ".join(toks[i : i + n])] += 1
    out = {}
    for doc_id, toks in docs.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            if counts[" ".join(toks[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=26),
        min_size=1,
        max_size=8,
    )
)
def test_dupspan_remove_matches_model(spark, doclists):
    """Model-check dupspan_remove on a 2-letter alphabet, where duplicated
    10-grams are common and overlap heavily — exercising intra-doc
    repeats, cross-doc spans, full-coverage wipeouts, and sub-window
    short docs against an exhaustive Python reference."""
    from pinterest_data_pipeline218_spark.operators.text_analysis import (
        dupspan_remove,
    )

    docs = {i: toks for i, toks in enumerate(doclists)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in dupspan_remove(df).collect()
    }
    assert got == _model_dupspan(docs)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_containment_matches_set_model(spark, docs_tokens):
    """dedup_containment vs brute-force Python set arithmetic on a dense
    4-token alphabet: every same-source pair with a shared 3-shingle must
    appear with exactly the model's n_common / basis-point containments /
    subdup flag (the 60-bit shingle hashing must be count-preserving)."""
    from pinterest_data_pipeline218_spark.operators.dedup import (
        CONTAINMENT_MIN_BP,
        containment_pairs,
    )

    rows = [(i, "s", " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.cont_a_bp, r.cont_b_bp, r.subdup)
        for r in containment_pairs(df).collect()
    }

    def sh(text):
        toks = text.split(" ")  # mirrors F.split / string_split exactly
        return {
            " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
        }

    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = sh(rows[i][2]), sh(rows[j][2])
            inter = len(a & b)
            if inter > 0:
                ca, cb = 10000 * inter // len(a), 10000 * inter // len(b)
                want[(i, j)] = (inter, ca, cb, max(ca, cb) >= CONTAINMENT_MIN_BP)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=86_399_999_999),  # offset µs in day
            st.integers(min_value=1, max_value=50_000),          # centi value
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.data(),
)
def test_twa_invariant_under_same_value_subdivision(spark, series, data):
    """LOCF semantics, property-checked: inserting an extra observation at
    any instant inside a held span, carrying exactly the value held there,
    must not change the day's time-weighted average or its span (it splits
    one rectangle into two of the same height). Model equality is also
    asserted against plain-Python integer arithmetic."""
    from pinterest_data_pipeline218_spark.plans.sequences import (
        DAY_US,
        twa_daily_from,
    )

    day_us = 1_767_225_600_000_000  # 2026-01-01 UTC midnight, exact µs
    series = sorted(series)
    # pick an insertion instant strictly inside a held span
    spans = [
        (t, (series[i + 1][0] if i + 1 < len(series) else DAY_US))
        for i, (t, _) in enumerate(series)
    ]
    i = data.draw(st.integers(min_value=0, max_value=len(series) - 1))
    lo, hi = spans[i]
    if hi - lo < 2:
        return  # no interior instant exists
    tx = data.draw(st.integers(min_value=lo + 1, max_value=hi - 1))
    held_v = series[i][1]

    rows = []
    for eid, (t, v) in enumerate(series):
        rows.append((1, "2026-01-01", day_us + t, day_us, eid, v))       # original
        rows.append((2, "2026-01-01", day_us + t, day_us, eid, v))       # subdivided
    rows.append((2, "2026-01-01", day_us + tx, day_us, 999, held_v))
    df = spark.createDataFrame(
        rows, "user_id long, day string, t_us long, day_us long, event_id long, v long"
    )
    got = {r.user_id: (r.span_us, r.twa_centi) for r in twa_daily_from(df).collect()}
    assert got[1] == got[2]

    # python model for user 1
    num = den = 0
    for (t, v), (_, nxt) in zip(series, spans):
        num += v * (nxt - t)
        den += nxt - t
    assert got[1] == (den, num // den)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="cvpse", min_size=0, max_size=40), min_size=1, max_size=10
    )
)
def test_journey_classifiers_match_regex_model(spark, journeys):
    """The journey classifiers (replace-and-measure cp counter, anchored
    start, c[ve]*p search) vs plain-Python re on arbitrary initial
    strings — including overlapping 'cpcp' runs and empty journeys."""
    import re as _re

    from pinterest_data_pipeline218_spark.plans.sequences import journey_finisher

    rows = [(i, j, len(j)) for i, j in enumerate(journeys)]
    df = spark.createDataFrame(rows, "user_id long, journey string, n_events long")
    got = {
        r.user_id: (
            r.journey_len, r.n_quick_convert, r.starts_signup, r.has_assisted_convert
        )
        for r in journey_finisher(df).collect()
    }
    for i, j in enumerate(journeys):
        want = (
            len(j),
            (len(j) - len(j.replace("cp", ""))) // 2,
            1 if j.startswith("s") else 0,
            1 if _re.search("c[ve]*p", j) else 0,
        )
        assert got[i] == want, (i, j)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 10),
    st.binary(min_size=0, max_size=0).flatmap(lambda _: st.randoms(use_true_random=False)),
    st.sampled_from(["palette", "truecolor", "auto"]),
)
def test_webp_roundtrip_property(w, h, rng, mode):
    """VP8L encode→decode is the identity for ANY RGB image in every
    encoder profile (r12). Small random images always fit the palette
    constraint (w·h ≤ 120 < 256 distinct colors), so all three modes are
    exercised across shapes incl. single-row/column and images with heavy
    value repetition (runs + cache hits)."""
    from pinterest_data_pipeline218_spark.functions.webp import (
        decode_webp,
        encode_webp,
    )

    n = w * h * 3
    # bias toward repetition so runs/cache-hit paths fire often
    palette_bytes = bytes(rng.randrange(256) for _ in range(12))
    px = bytes(palette_bytes[rng.randrange(len(palette_bytes))] for _ in range(n))
    assert decode_webp(encode_webp(w, h, px, mode=mode)) == (w, h, px)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-400, 400), min_size=3, max_size=25),
)
def test_cusum_closed_form_equals_recursion_property(spark, daily_cents):
    """Property (staged r13, range extended to NEGATIVE values r14 per
    ADVICE r13): on ANY daily series — including net-negative days, where
    target and h go negative — cusum_flag's cumulative-window closed form
    equals the textbook max(0, S+dev) recursion with TRUNCATING division
    (Spark's `div`; DuckDB's integer `//` truncates identically, see
    test_cusum_negative_values_agree_cross_engine) — flagged-day set,
    statistics, and directions."""
    import datetime

    from pinterest_data_pipeline218_spark.plans.events import (
        CUSUM_H_PCT,
        cusum_flag,
    )

    def tdiv(a: int, b: int) -> int:  # truncating division, b > 0
        return a // b if a >= 0 else -((-a) // b)

    base = datetime.date(2024, 5, 1)
    rows = [
        ("t", (base + datetime.timedelta(days=d)).isoformat(), int(v))
        for d, v in enumerate(daily_cents)
    ]
    daily = spark.createDataFrame(
        rows, "event_type string, day string, v_cents long"
    )
    got = {
        r.day: (r.s_up, r.s_dn, r.direction)
        for r in cusum_flag(daily).collect()
    }

    n = len(daily_cents)
    target = tdiv(sum(daily_cents), n)
    h = tdiv(CUSUM_H_PCT * target, 100)
    s_up, s_dn, want = 0, 0, {}
    for d, x in enumerate(daily_cents):
        s_up = max(0, s_up + (x - target))
        s_dn = max(0, s_dn + (target - x))
        if s_up > h or s_dn > h:
            direction = (
                "both" if s_up > h and s_dn > h else "up" if s_up > h else "down"
            )
            want[(base + datetime.timedelta(days=d)).isoformat()] = (
                s_up, s_dn, direction,
            )
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
def test_k_core_equals_peel_model_property(spark, pairs, k):
    """Property (staged r13): on ANY small directed graph, k_core's 3
    unrolled peels equal a 3-step Python peel replay (same round count —
    the contract is the fixed unroll, convergence is a separate pinned
    fact on the real graph)."""
    import collections

    from pinterest_data_pipeline218_spark.operators.graph import k_core

    pairs = [(f"n{a}", f"n{b}") for a, b in pairs if a != b]
    if not pairs:
        return
    E = set(pairs)
    for _ in range(3):
        deg = collections.Counter(s for s, _ in E)
        keep = {x for x, c in deg.items() if c >= k}
        E = {(s, d) for s, d in E if s in keep and d in keep}
    want = dict(collections.Counter(s for s, _ in E))

    df = spark.createDataFrame(list(set(pairs)), "src string, dst string")
    got = {r.node: r.core_deg for r in k_core(df, k=k, rounds=3).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-8, 8), st.integers(-8, 8),
            st.integers(-8, 8), st.integers(-8, 8),
        ).filter(lambda t: any(t)),
        min_size=3,
        max_size=12,
        unique=True,
    ),
)
def test_mmr_select_equals_independent_greedy_property(spark, vecs):
    """Property (staged r14): on ANY small candidate pool, mmr_select's
    distributed-sims + driver greedy equals an INDEPENDENT Python greedy
    replay that recomputes the FLOOR-ppm cosines with the same IEEE
    left-fold (dot as a sequential sum over element products — the
    `cosine` / list_reduce shared fold), the 700/300 integer split, and
    the smallest-vec_id tie rule. Vectors are small integers /16 so the
    doubles are exact dyadics and folds cannot hide rounding surprises;
    rel_ppm is an arbitrary deterministic integer (MMR never recomputes
    it), so the property covers relevance/diversity trade-offs the real
    pool cut would rarely produce."""
    import math

    from pinterest_data_pipeline218_spark.operators.similarity import (
        MMR_LAMBDA_MILLI,
        mmr_select,
    )

    rows = [
        (i, [x / 16.0 for x in v], (v[0] * 131 + v[1] * 17 + i) * 1000)
        for i, v in enumerate(vecs)
    ]
    pool = spark.createDataFrame(
        rows, "vec_id long, v array<double>, rel_ppm long"
    )
    got = [tuple(r) for r in mmr_select(pool, k=5).collect()]

    def cos_ppm(a, b):
        def dot(x, y):
            acc = 0.0
            for xi, yi in zip(x, y):
                acc = acc + xi * yi
            return acc

        den = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
        if den == 0:
            return None
        return math.floor(dot(a, b) / den * 1000000.0)

    lam, lam_c = MMR_LAMBDA_MILLI, 1000 - MMR_LAMBDA_MILLI
    by_id = {i: v for i, v, _ in rows}
    rel = {i: r for i, _, r in rows}
    remaining, selected, want = sorted(by_id), [], []
    for t in range(min(5, len(remaining))):
        best = None
        for x in remaining:
            maxsim = max(
                (cos_ppm(by_id[x], by_id[s]) for s in selected), default=0
            )
            score = lam * rel[x] - lam_c * maxsim
            if best is None or (-score, x) < best[0]:
                best = ((-score, x), x, maxsim, score)
        _, x, maxsim, score = best
        remaining.remove(x)
        selected.append(x)
        want.append((t, x, rel[x], maxsim, score))
    assert got == want
