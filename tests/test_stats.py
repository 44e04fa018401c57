"""ops/stats: bivariate moments + equi-width histogram.

Every test checks against a plain-numpy reference computed on the same
arrays, plus partition invariance (the driver-combined partials must be
independent of block boundaries)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from illumio_ray.ops import stats


def _toy(n=5000, seed=3, with_nulls=True):
    rng = np.random.default_rng(seed)
    g = rng.choice(["A", "B", "C"], n)
    x = rng.normal(10, 3, n)
    y = 2.5 * x + rng.normal(0, 4, n) + np.where(g == "B", 50.0, 0.0)
    if with_nulls:
        x[::37] = np.nan
        y[::53] = np.nan
    return pa.table({"g": g, "x": x, "y": y})


def _np_ref(t: pa.Table):
    """Reference grouped stats on the non-null pairs."""
    df = t.to_pandas().dropna()
    out = {}
    for k, sub in df.groupby("g"):
        xv, yv = sub["x"].values, sub["y"].values
        mx, my = xv.mean(), yv.mean()
        m2x = ((xv - mx) ** 2).sum()
        m2y = ((yv - my) ** 2).sum()
        cxy = ((xv - mx) * (yv - my)).sum()
        slope = cxy / m2x
        out[k] = {
            "n": len(sub), "mean_x": mx, "mean_y": my,
            "corr": cxy / np.sqrt(m2x * m2y),
            "covar_samp": cxy / (len(sub) - 1),
            "slope": slope, "intercept": my - slope * mx,
            "r2": (cxy / np.sqrt(m2x * m2y)) ** 2}
    return out


@pytest.mark.parametrize("nblocks", [1, 7])
def test_bivariate_grouped_matches_numpy(nblocks):
    t = _toy()
    ds = rd.from_arrow(t).repartition(nblocks)
    got = stats.bivariate_stats(ds, "x", "y", by=["g"]).to_pandas()
    ref = _np_ref(t)
    assert sorted(got["g"]) == sorted(ref)
    for _, row in got.iterrows():
        r = ref[row["g"]]
        assert row["n"] == r["n"]
        for f in ("mean_x", "mean_y", "corr", "covar_samp", "slope",
                  "intercept", "r2"):
            assert row[f] == pytest.approx(r[f], rel=1e-10), f


def test_bivariate_global_equals_single_group():
    t = _toy()
    ds = rd.from_arrow(t).repartition(5)
    glob = stats.bivariate_stats(ds, "x", "y").to_pandas()
    assert list(glob.columns)[0] == "n" and len(glob) == 1
    # global == grouped over a constant key
    const = rd.from_arrow(t.set_column(
        t.schema.get_field_index("g"), "g",
        pa.array(["k"] * t.num_rows))).repartition(5)
    gg = stats.bivariate_stats(const, "x", "y", by=["g"]).to_pandas()
    for f in ("n", "corr", "slope", "intercept"):
        assert glob[f][0] == pytest.approx(gg[f][0], rel=1e-12)


def test_bivariate_sql_null_and_degenerate_semantics():
    # group "a": all-null pairs -> absent; "b": n == 1 -> covar_samp NULL;
    # "c": zero x-variance -> corr/slope/intercept/r2 NULL, covar defined
    t = pa.table({
        "g": ["a", "a", "b", "c", "c", "c"],
        "x": pa.array([None, 1.0, 1.0, 2.0, 2.0, 2.0], pa.float64()),
        "y": pa.array([5.0, None, 2.0, 1.0, 2.0, 3.0], pa.float64())})
    got = stats.bivariate_stats(
        rd.from_arrow(t).repartition(3), "x", "y", by=["g"]).to_pandas()
    got = got.set_index("g")
    assert "a" not in got.index
    assert got.loc["b", "n"] == 1 and np.isnan(got.loc["b", "covar_samp"])
    assert got.loc["c", "n"] == 3 and got.loc["c", "var_x"] == 0.0
    for f in ("corr", "slope", "intercept", "r2"):
        assert np.isnan(got.loc["c", f])
    assert got.loc["c", "covar_pop"] == pytest.approx(0.0)


def test_bivariate_all_null_returns_empty_with_schema():
    t = pa.table({"g": ["a", "b"],
                  "x": pa.array([None, None], pa.float64()),
                  "y": pa.array([None, None], pa.float64())})
    for by in (None, ["g"]):
        got = stats.bivariate_stats(rd.from_arrow(t), "x", "y", by=by)
        assert got.num_rows == 0
        assert "corr" in got.column_names and "n" in got.column_names


@pytest.mark.parametrize("nblocks", [1, 9])
def test_histogram_matches_numpy(nblocks):
    t = _toy()
    ds = rd.from_arrow(t).repartition(nblocks)
    got = stats.histogram_equi_width(ds, "x", 12).to_pandas()
    xv = t["x"].to_numpy(zero_copy_only=False)
    xv = xv[~np.isnan(xv)]
    lo, hi = xv.min(), xv.max()
    w = (hi - lo) / 12
    b = np.minimum(np.floor((xv - lo) / w).astype(np.int64), 11)
    ref = np.bincount(b, minlength=12)
    nz = np.flatnonzero(ref)
    assert list(got["bucket"]) == list(nz)
    assert list(got["n"]) == list(ref[nz])
    assert got["n"].sum() == len(xv)
    assert got["bin_lo"][0] == pytest.approx(lo)
    assert got["bin_hi"].iloc[-1] == pytest.approx(lo + 12 * w)


def test_histogram_explicit_range_drops_out_of_range():
    t = pa.table({"x": pa.array([-5.0, 0.0, 1.0, 2.5, 5.0, 99.0])})
    got = stats.histogram_equi_width(
        rd.from_arrow(t), "x", 5, lo=0.0, hi=5.0).to_pandas()
    assert got["n"].sum() == 4            # -5 and 99 dropped
    assert got.set_index("bucket").loc[4, "n"] == 1  # x == hi clamps into last


def test_histogram_degenerate_and_empty():
    one = rd.from_arrow(pa.table({"x": pa.array([7.0] * 5)}))
    got = stats.histogram_equi_width(one, "x", 4).to_pandas()
    assert len(got) == 1 and got["bucket"][0] == 0 and got["n"][0] == 5
    nul = rd.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())}))
    assert stats.histogram_equi_width(nul, "x", 4).num_rows == 0
    with pytest.raises(ValueError):
        stats.histogram_equi_width(one, "x", 0)
    with pytest.raises(ValueError):
        stats.histogram_equi_width(one, "x", 4, lo=5.0, hi=1.0)


# ---------------------------------------------------------------------------
# seasonal_hod_anomalies
# ---------------------------------------------------------------------------

def _events_toy(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 14 * 24 * 3600, n).astype("timedelta64[s]")
    key = rng.choice(["a", "b"], n)
    # plant a burst: key 'a', day 5, hour 3 gets 300 extra events
    burst = (base + np.timedelta64(5 * 24 + 3, "h")
             + rng.integers(0, 3600, 300).astype("timedelta64[s]"))
    ts = np.concatenate([ts.astype("datetime64[us]"),
                         burst.astype("datetime64[us]")])
    key = np.concatenate([key, np.array(["a"] * 300)])
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "k": pa.array(key)})


def _anomaly_ref(t: pa.Table, k=2):
    df = t.to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    df["hod"] = df["ts"].dt.hour
    cells = df.groupby(["k", "day", "hod"]).size().reset_index(name="n")
    out = set()
    for (key, hod), grp in cells.groupby(["k", "hod"]):
        ns = grp["n"].to_numpy()
        d, s, ss = len(ns), int(ns.sum()), int((ns.astype(object) ** 2).sum())
        for day, n in zip(grp["day"], ns):
            if (int(n) * d - s) ** 2 > k * k * (ss * d - s * s):
                out.add((key, day, int(hod), int(n)))
    return out


@pytest.mark.parametrize("nblocks", [1, 9])
def test_seasonal_anomalies_match_reference(nblocks):
    t = _events_toy()
    ds = rd.from_arrow(t).repartition(nblocks)
    got = stats.seasonal_hod_anomalies(ds, "ts", "k", k=2).to_pandas()
    got_set = {(r.k, r.day, int(r.hod), int(r.n))
               for r in got.itertuples()}
    assert got_set == _anomaly_ref(t)
    # the planted burst is flagged
    assert any(key == "a" and hod == 3 and n >= 300
               for key, _, hod, n in got_set)
    # μ/σ are consistent with the flag: every flagged row deviates > 2σ
    assert ((got["n"] - got["mu"]).abs() >= 2 * got["sigma"] - 1e-6).all()


def test_seasonal_anomalies_uniform_stream_flags_little():
    # perfectly regular stream: 2 events per (hour, key) every day → σ = 0
    # everywhere, nothing flagged (strict > on an all-equal cell set)
    hours = np.arange(7 * 24)
    ts = (np.datetime64("2024-03-01T00:30:00", "us")
          + np.repeat(hours, 2) * np.timedelta64(3600, "s"))
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "k": pa.array(["a"] * len(ts))})
    got = stats.seasonal_hod_anomalies(rd.from_arrow(t), "ts", "k", k=2)
    assert got.num_rows == 0


# ---------------------------------------------------------------------------
# welch_ttest_by
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nblocks", [1, 8])
def test_welch_ttest_matches_scipy_formula(nblocks):
    rng = np.random.default_rng(5)
    g = rng.choice(["x", "y", "z"], 6000, p=[0.5, 0.3, 0.2])
    v = rng.normal(100.0, 10.0, 6000) + np.where(g == "y", 3.0, 0.0)
    t = pa.table({"g": g, "v": v})
    ds = rd.from_arrow(t).repartition(nblocks)
    got = stats.welch_ttest_by(ds, "g", "v").to_pandas().set_index("g")
    for key in ["x", "y", "z"]:
        a = v[g == key]
        b = v[g != key]
        se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        t_ref = (a.mean() - b.mean()) / np.sqrt(se)
        df_ref = se ** 2 / ((a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
                            + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1))
        row = got.loc[key]
        assert row["n"] == len(a)
        assert abs(row["t_stat"] - t_ref) < 1e-5
        assert abs(row["df"] - df_ref) / df_ref < 1e-6
    # the shifted group is the significant one
    assert abs(got.loc["y", "t_stat"]) > abs(got.loc["x", "t_stat"])


def test_welch_ttest_skips_singleton_groups():
    t = pa.table({"g": ["a"] * 50 + ["solo"],
                  "v": list(np.linspace(0, 1, 50)) + [9.9]})
    got = stats.welch_ttest_by(rd.from_arrow(t), "g", "v").to_pandas()
    # 'solo' has n=1 → skipped; 'a' vs rest needs rest ≥ 2 → also skipped
    assert set(got["g"]) == set()


# ---------------------------------------------------------------------------
# chi_square_independence
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nblocks", [1, 6])
def test_chi_square_matches_dense_reference(nblocks):
    rng = np.random.default_rng(9)
    a = rng.choice(["p", "q", "r"], 5000)
    # mild dependence: 'p' rows lean to category 0
    b = np.where((a == "p") & (rng.random(5000) < 0.5), 0,
                 rng.integers(0, 4, 5000))
    t = pa.table({"a": a, "b": pa.array(b, pa.int64())})
    got = stats.chi_square_independence(
        rd.from_arrow(t).repartition(nblocks), "a", "b").to_pandas()
    # dense numpy reference including zero cells
    import pandas as pd
    ct = pd.crosstab(a, b).reindex(
        index=sorted(set(a)), columns=sorted(set(b)), fill_value=0).to_numpy()
    e = np.outer(ct.sum(1), ct.sum(0)) / ct.sum()
    chi2_ref = ((ct - e) ** 2 / e).sum()
    assert abs(got.chi2[0] - chi2_ref) < 1e-4
    assert got.dof[0] == (3 - 1) * (4 - 1)
    assert got.n[0] == 5000
    assert got.chi2[0] > 100  # planted dependence is detected


def test_chi_square_independent_columns_small_stat():
    rng = np.random.default_rng(2)
    t = pa.table({"a": rng.choice(["x", "y"], 8000),
                  "b": pa.array(rng.integers(0, 3, 8000), pa.int64())})
    got = stats.chi_square_independence(rd.from_arrow(t), "a", "b") \
        .to_pandas()
    # under independence E[chi2] = dof = 2; anything near that passes
    assert got.chi2[0] < 15


# ---------------------------------------------------------------------------
# bootstrap_mean_ci (Poisson bootstrap)
# ---------------------------------------------------------------------------

def test_bootstrap_ci_brackets_mean_and_shrinks():
    rng = np.random.default_rng(21)
    big = pa.table({"id": pa.array(np.arange(20_000), pa.int64()),
                    "v": rng.normal(50.0, 5.0, 20_000)})
    small = big.slice(0, 500)
    got_b = stats.bootstrap_mean_ci(rd.from_arrow(big), "id", "v",
                                    n_boot=60).to_pandas().iloc[0]
    got_s = stats.bootstrap_mean_ci(rd.from_arrow(small), "id", "v",
                                    n_boot=60).to_pandas().iloc[0]
    for g in (got_b, got_s):
        assert g.ci_lo <= g["mean"] <= g.ci_hi
    # CI width shrinks roughly like 1/sqrt(n): 40x rows → much tighter
    assert (got_b.ci_hi - got_b.ci_lo) < 0.5 * (got_s.ci_hi - got_s.ci_lo)
    # the CI is centered near the true mean at this n
    assert abs(got_b["mean"] - 50.0) < 0.5
    assert got_b.n == 20_000


@pytest.mark.parametrize("nblocks", [1, 9])
def test_bootstrap_ci_partition_invariant_and_grouped(nblocks):
    rng = np.random.default_rng(4)
    t = pa.table({"id": pa.array(np.arange(3000), pa.int64()),
                  "g": rng.choice(["a", "b"], 3000),
                  "v": rng.normal(10.0, 2.0, 3000)})
    got = stats.bootstrap_mean_ci(
        rd.from_arrow(t).repartition(nblocks), "id", "v",
        by=["g"], n_boot=40).to_pandas().set_index("g")
    # counter-based weights ⇒ identical result in ANY layout
    ref = stats.bootstrap_mean_ci(rd.from_arrow(t), "id", "v",
                                  by=["g"], n_boot=40) \
        .to_pandas().set_index("g")
    pd.testing.assert_frame_equal(got, ref)
    for g in ["a", "b"]:
        assert got.loc[g, "ci_lo"] <= got.loc[g, "mean"] <= got.loc[g, "ci_hi"]


def _cusum_bruteforce(vals, target, h):
    """Direct recursion S_i = max(0, S_{i-1} + x_i - target) in cents."""
    s, out = 0, []
    for v in vals:
        s = max(0, s + int(np.floor(v * 100)) - target)
        out.append(s)
    return [s for s in out if s > h]


@pytest.mark.parametrize("nblocks", [1, 7])
def test_cusum_flags_matches_recursion(nblocks):
    rng = np.random.default_rng(11)
    n = 4000
    users = rng.integers(0, 25, n)
    ts = pd.to_datetime(rng.integers(0, 10**6, n) * 10**6, utc=False)
    vals = rng.uniform(0, 100, n)
    # plant a burst for user 3 so the threshold genuinely trips
    burst = users == 3
    vals[burst] = rng.uniform(150, 200, burst.sum())
    df = pd.DataFrame({"user_id": users, "event_id": np.arange(n),
                       "ts": ts.values, "value": vals})
    ds = rd.from_pandas(df).repartition(nblocks)
    out = stats.cusum_flags(ds, "user_id", "ts", "value",
                            target_cents=6000, h_cents=20000,
                            tie_cols=["event_id"]).to_pandas()
    ref_rows = []
    for u, sub in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        flagged = _cusum_bruteforce(sub["value"].to_numpy(), 6000, 20000)
        ref_rows.extend((u, s) for s in flagged)
    got = sorted(zip(out["user_id"], out["cusum"]))
    assert got == sorted(ref_rows)
    assert len(got) > 0  # the planted burst must actually flag


def test_cusum_resets_at_key_boundaries():
    # user 1 accumulates; user 2 (interleaved ids) must start from zero
    df = pd.DataFrame({
        "user_id": [1, 2, 1, 2, 1, 2],
        "event_id": [0, 1, 2, 3, 4, 5],
        "ts": pd.to_datetime([1, 1, 2, 2, 3, 3], unit="s"),
        "value": [100.0, 10.0, 100.0, 10.0, 100.0, 10.0],
    })
    ds = rd.from_pandas(df)
    out = stats.cusum_flags(ds, "user_id", "ts", "value",
                            target_cents=5000, h_cents=9000,
                            tie_cols=["event_id"]).to_pandas()
    # user 1: +5000 per event -> S = 5000, 10000, 15000 (two flags > 9000)
    # user 2: deltas are negative -> never flags
    assert set(out["user_id"]) == {1}
    assert sorted(out["cusum"]) == [10000, 15000]


def test_mutual_information_independent_and_dependent():
    rng = np.random.default_rng(5)
    n = 20000
    a = rng.choice(["x", "y", "z"], n)
    b_ind = rng.choice([0, 1, 2, 3], n)
    t = pa.table({"a": a, "b": b_ind})
    out = stats.mutual_information(rd.from_arrow(t), "a", "b").to_pandas()
    assert out["mi"][0] < 0.005  # independent -> MI near zero
    assert out["nmi"][0] < 0.01
    # fully dependent: b = f(a) -> MI equals H(a) (and nmi is capped by
    # the sqrt normalization: H(a)/sqrt(H(a)H(b)) with H(b)=H(a) -> 1)
    b_dep = np.where(a == "x", 0, np.where(a == "y", 1, 2))
    t2 = pa.table({"a": a, "b": b_dep})
    out2 = stats.mutual_information(rd.from_arrow(t2), "a", "b").to_pandas()
    assert abs(out2["mi"][0] - out2["h_a"][0]) < 1e-6
    assert abs(out2["nmi"][0] - 1.0) < 1e-6


@pytest.mark.parametrize("nblocks", [1, 6])
def test_mutual_information_partition_invariant_with_nulls(nblocks):
    rng = np.random.default_rng(9)
    n = 5000
    a = rng.choice(["p", "q", None], n, p=[0.45, 0.45, 0.1])
    b = rng.choice(["u", "v"], n)
    t = pa.table({"a": a, "b": b})
    ref = stats.mutual_information(rd.from_arrow(t), "a", "b").to_pandas()
    got = stats.mutual_information(
        rd.from_arrow(t).repartition(nblocks), "a", "b").to_pandas()
    pd.testing.assert_frame_equal(got, ref)


def test_psi_identical_near_zero_and_shift_large():
    rng = np.random.default_rng(7)
    a = rng.normal(100, 10, 20000)
    b = rng.normal(100, 10, 20000)   # same distribution, fresh draw
    c = rng.normal(130, 10, 20000)   # strong location shift
    ra = rd.from_arrow(pa.table({"v": a}))
    psi_same = stats.psi_numeric(ra, rd.from_arrow(pa.table({"v": b})),
                                 "v")["psi_part"].to_numpy().sum()
    psi_shift = stats.psi_numeric(ra, rd.from_arrow(pa.table({"v": c})),
                                  "v")["psi_part"].to_numpy().sum()
    assert psi_same < 0.02          # stable (rule of thumb < 0.1)
    assert psi_shift > 0.5          # drifted far beyond the 0.25 action bar
    # empty current-side bins must stay finite (Laplace smoothing)
    assert np.isfinite(psi_shift)


def test_psi_partition_invariant():
    rng = np.random.default_rng(13)
    a = pa.table({"v": rng.uniform(0, 1, 4000)})
    b = pa.table({"v": rng.uniform(0.2, 1.2, 4000)})
    one = stats.psi_numeric(rd.from_arrow(a), rd.from_arrow(b), "v"
                            ).to_pandas()
    many = stats.psi_numeric(rd.from_arrow(a).repartition(7),
                             rd.from_arrow(b).repartition(5), "v"
                             ).to_pandas()
    pd.testing.assert_frame_equal(one, many)


@pytest.mark.parametrize("nblocks", [1, 6])
def test_autocorr_by_matches_numpy(nblocks):
    rng = np.random.default_rng(3)
    rows = []
    for k in range(12):
        n = rng.integers(5, 40)
        x = np.cumsum(rng.normal(0, 1, n)) if k % 2 else rng.normal(0, 1, n)
        rows.extend((k, t, float(v)) for t, v in enumerate(x))
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    out = stats.autocorr_by(rd.from_pandas(df).repartition(nblocks),
                            "k", "t", "v", lag=1).to_pandas()
    got = dict(zip(out["k"], out["ac"]))
    for k, sub in df.sort_values(["k", "t"]).groupby("k"):
        x = sub["v"].to_numpy()
        ref = np.corrcoef(x[1:], x[:-1])[0, 1]
        assert abs(got[k] - round(ref, 6)) < 2e-6
    # random-walk keys (odd) should be far more autocorrelated on average
    walk = np.mean([got[k] for k in got if k % 2])
    iid = np.mean([got[k] for k in got if not k % 2])
    assert walk > iid


def test_autocorr_constant_series_is_null():
    df = pd.DataFrame({"k": [1] * 6, "t": range(6), "v": [5.0] * 6})
    out = stats.autocorr_by(rd.from_pandas(df), "k", "t", "v").to_pandas()
    assert len(out) == 1 and pd.isna(out["ac"][0])
    assert out["n_pairs"][0] == 5


def test_interarrival_by_exact_gaps():
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([0, 10, 40, 5, 6, 9], unit="s"),
    })
    out = stats.interarrival_by(rd.from_pandas(df), "k", "ts").to_pandas()
    got = out.set_index("k")
    assert got.loc[1, "min_gap_us"] == 10_000_000
    assert got.loc[1, "max_gap_us"] == 30_000_000
    assert got.loc[1, "mean_gap_us"] == 20_000_000.0
    assert got.loc[1, "n_gaps"] == 2
    assert got.loc[2, "n_gaps"] == 1
    assert 3 not in got.index  # single-event keys have no gaps


def test_decayed_counts_half_life_semantics():
    anchor = int(np.datetime64("2024-01-08T00:00:00", "us").astype(np.int64))
    hl = 7 * 86400.0
    df = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-08",   # at anchor -> weight 1
                              "2024-01-01",   # one half-life back -> 0.5
                              "2024-01-08"]),
    })
    out = stats.decayed_counts(rd.from_pandas(df), "k", "ts",
                               half_life_s=hl, anchor_us=anchor
                               ).to_pandas().set_index("k")
    assert out.loc["a", "decayed"] == 1.5
    assert out.loc["b", "decayed"] == 1.0
    assert out.loc["a", "n"] == 2


def test_psi_persisted_baseline_matches_direct(tmp_path):
    rng = np.random.default_rng(29)
    a = pa.table({"v": rng.uniform(0, 1, 3000)})
    b = pa.table({"v": rng.uniform(0.1, 1.1, 3000)})
    ra, rb = rd.from_arrow(a), rd.from_arrow(b)
    direct = stats.psi_numeric(ra, rb, "v").to_pandas()

    path = tmp_path / "base.json"
    meta = stats.psi_save_baseline(ra, "v", str(path))
    assert meta["scheme"] == stats._PSI_SCHEME
    via = stats.psi_check_against_baseline(rb, str(path)).to_pandas()
    pd.testing.assert_frame_equal(via, direct)

    # a scheme mismatch must refuse, not silently mix binnings
    import json
    bad = json.loads(path.read_text())
    bad["scheme"] = "psi-v0:other"
    path.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="scheme"):
        stats.psi_check_against_baseline(rb, str(path))


def test_psi_trajectory_flags_the_shifted_bucket(tmp_path):
    rng = np.random.default_rng(37)
    # 3 days: day 1 and 2 match the baseline, day 3 shifts location
    rows = []
    for day, (mu, n) in enumerate([(50, 2000), (50, 2000), (90, 2000)]):
        ts = pd.Timestamp("2024-03-01") + pd.Timedelta(days=day)
        rows.append(pd.DataFrame({
            "ts": ts + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "v": rng.normal(mu, 10, n)}))
    df = pd.concat(rows, ignore_index=True)
    base_src = rd.from_pandas(rows[0])
    path = tmp_path / "w1.json"
    stats.psi_save_baseline(base_src, "v", str(path))
    out = stats.psi_trajectory(rd.from_pandas(df), "ts", "v",
                               str(path)).to_pandas()
    assert len(out) == 3
    assert out["psi"].iloc[0] < 0.05       # baseline day vs itself
    assert out["psi"].iloc[1] < 0.1        # same distribution
    assert out["psi"].iloc[2] > 1.0        # hard shift screams
    assert list(out["n"]) == [2000, 2000, 2000]
