import numpy as np
import pandas as pd
import ray.data as rd

from illumio_ray.ops import privacy


def _toy():
    # groups: (1,a)x4, (1,b)x2, (2,a)x3
    return pd.DataFrame({
        "rid": range(9),
        "u": [1, 1, 1, 1, 1, 1, 2, 2, 2],
        "t": ["a", "a", "a", "a", "b", "b", "a", "a", "a"],
    })


def test_k_anonymize_suppress_keeps_only_big_groups():
    ds = rd.from_pandas(_toy()).repartition(3)
    got = privacy.k_anonymize_suppress(ds, ["u", "t"], 3).to_pandas()
    assert sorted(got.rid) == [0, 1, 2, 3, 6, 7, 8]
    # every released row shares its quasi-tuple with >= k-1 others
    assert got.groupby(["u", "t"]).size().ge(3).all()

    # hash-join fallback path must agree (same rows, any order)
    gotj = privacy.k_anonymize_suppress(
        ds, ["u", "t"], 3, broadcast_groups_max=0).to_pandas()
    assert sorted(gotj.rid) == sorted(got.rid)


def test_k_anonymity_violations_reports_small_groups():
    ds = rd.from_pandas(_toy()).repartition(2)
    got = privacy.k_anonymity_violations(ds, ["u", "t"], 3).to_pandas()
    assert [(r.u, r.t, r.group_n) for r in got.itertuples()] == [(1, "b", 2)]


def test_k_anonymize_generalize_picks_finest_satisfying_width():
    # one quasi group, values 0..19: w=1 -> each bin n=1; w=4 -> n=4;
    # w=16 -> bins of 16 and 4 -> min 4; so k=4 picks w=4, k=5 picks...
    # w=16 min 4 < 5, w=64 covers all 20 -> k=5 picks 64
    df = pd.DataFrame({"g": ["x"] * 20, "v": np.arange(20, dtype=float)})
    ds = rd.from_pandas(df).repartition(3)
    got4 = privacy.k_anonymize_generalize(
        ds, ["g"], "v", 4, widths=[1, 4, 16, 64]).to_pandas()
    assert (got4.bin_hi - got4.bin_lo == 4).all()
    assert got4.groupby(["g", "bin_lo"]).size().ge(4).all()

    got5 = privacy.k_anonymize_generalize(
        ds, ["g"], "v", 5, widths=[1, 4, 16, 64]).to_pandas()
    assert (got5.bin_hi - got5.bin_lo == 64).all()

    # no ladder level reaches k -> the attribute is fully suppressed
    gotn = privacy.k_anonymize_generalize(
        ds, ["g"], "v", 99, widths=[1, 4]).to_pandas()
    assert gotn.bin_lo.isna().all() and gotn.bin_hi.isna().all()
    assert len(gotn) == 20


def test_l_diversity_report_counts_distinct_sensitive():
    df = pd.DataFrame({
        "q": ["a", "a", "a", "b", "b"],
        "s": [1, 1, 2, 3, 3],
    })
    ds = rd.from_pandas(df).repartition(2)
    got = privacy.l_diversity_report(ds, ["q"], "s", 2).to_pandas() \
        .sort_values("q").reset_index(drop=True)
    assert list(got.q) == ["a", "b"]
    assert list(got.n_distinct) == [2, 1]
    assert list(got.diverse) == [True, False]


def test_cohort_retention_matrix():
    from illumio_ray.ops import relational as rel
    ts = pd.to_datetime([
        "2026-01-01 05:00", "2026-01-01 09:00", "2026-01-02 01:00",
        "2026-01-02 02:00", "2026-01-03 07:00",
        "2026-01-02 03:00", "2026-01-04 00:00",
    ])
    df = pd.DataFrame({"u": [1, 1, 1, 1, 1, 2, 2], "ts": ts})
    ds = rd.from_pandas(df).repartition(3)
    got = rel.cohort_retention(ds, "u", "ts").to_pandas() \
        .sort_values(["cohort", "day_n"]).reset_index(drop=True)
    # user1 cohort 01-01 active days 0,1,2; user2 cohort 01-02 days 0,2
    want = [("2026-01-01", 0, 1), ("2026-01-01", 1, 1), ("2026-01-01", 2, 1),
            ("2026-01-02", 0, 1), ("2026-01-02", 2, 1)]
    assert [(r.cohort, r.day_n, r.n_users) for r in got.itertuples()] == want
