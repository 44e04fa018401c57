"""Bounded-state numeric statistics: bivariate moments (correlation,
covariance, OLS regression) and equi-width histograms.

Both operators are the textbook 100 TB shape: every pass is one
``map_batches`` emitting O(groups)- or O(bins)-sized partials that the
driver (or any reducer) combines by plain summation — no shuffle, no
sort, driver memory independent of row count. They complement the
reference's aggregate counters (app/log_processor.py:360-420 keeps
bounded per-type dicts the same way) with the second-moment statistics
a corpus-profiling pipeline needs.

Numerical design: bivariate_stats is TWO-pass centered. Pass 1 gets the
exact per-group means (first moments — no cancellation); pass 2 sums
the centered products Σ(x−x̄)(y−ȳ) etc. Summing raw Σx², Σxy and
subtracting n·x̄² at the end (one-pass textbook formula) cancels
catastrophically at TPC-H price magnitudes (~1e4 values, ~1e8 squares);
the centered two-pass form keeps ~1e-14 relative error, which is what
lets the oracle queries round corr to 6 digits and match DuckDB's
streaming implementation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.rounding import round_scalar

__all__ = ["bivariate_stats", "histogram_equi_width",
           "seasonal_hod_anomalies", "welch_ttest_by",
           "chi_square_independence", "bootstrap_mean_ci",
           "cusum_flags"]


def _stream_sum_partials(partials: rd.Dataset, keys: list[str]) -> pa.Table:
    """Driver-combine: stream partial batches, group_by(keys).sum every
    64 batches so driver memory stays O(groups) (same incremental fold
    as relational.grouped_agg's driver mode)."""
    acc: pa.Table | None = None
    buf: list[pa.Table] = []
    val_cols: list[str] | None = None

    def fold(pieces: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(pieces, promote_options="permissive")
        g = t.group_by(keys).aggregate([(c, "sum") for c in val_cols])
        return g.rename_columns(keys + val_cols)

    for b in partials.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if not t.num_rows:
            continue
        if val_cols is None:
            val_cols = [c for c in t.column_names if c not in keys]
        buf.append(t)
        if len(buf) >= 64:
            acc = fold(buf + ([acc] if acc is not None else []))
            buf = []
    if buf or acc is not None:
        acc = fold(buf + ([acc] if acc is not None else []))
    return acc  # None ⇔ zero usable rows anywhere


def bivariate_stats(ds: rd.Dataset, x_col: str, y_col: str,
                    by: list[str] | None = None) -> pa.Table:
    """Per-group bivariate moments of (x, y): returns one row per group
    with ``n, mean_x, mean_y, var_x, var_y, covar_pop, covar_samp,
    corr, slope, intercept, r2`` (slope/intercept/r2 regress y ON x,
    matching SQL ``regr_slope(y, x)``).

    SQL null semantics: a row participates only when BOTH x and y are
    non-null (and non-NaN). Degenerate groups follow SQL: n == 1 →
    covar_samp NULL; var_x == 0 or var_y == 0 → corr NULL; var_x == 0 →
    slope/intercept/r2 NULL.

    ``by`` keys must be BOUNDED (flags, types, languages): both passes
    emit O(groups) rows per block and the result is a driver-side table.
    Unbounded keys belong in grouped_agg's bucket mode, not here.
    """
    keys = list(by) if by else ["__g"]

    def pass1(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        cols = ({k: t[k] for k in by} if by
                else {"__g": pa.array(np.zeros(t.num_rows, np.int8))})
        p = pa.table({**cols,
                      "__n": pa.array(ok.astype(np.int64)),
                      "__sx": pa.array(np.where(ok, x, 0.0)),
                      "__sy": pa.array(np.where(ok, y, 0.0))})
        g = p.group_by(keys).aggregate(
            [("__n", "sum"), ("__sx", "sum"), ("__sy", "sum")])
        return g.rename_columns(keys + ["__n", "__sx", "__sy"])

    firsts = _stream_sum_partials(
        ds.map_batches(pass1, batch_format="pyarrow", zero_copy_batch=True),
        keys)
    out_fields = ["n", "mean_x", "mean_y", "var_x", "var_y", "covar_pop",
                  "covar_samp", "corr", "slope", "intercept", "r2"]

    def _empty() -> pa.Table:  # zero usable (x, y) pairs anywhere
        sch = ds.schema()  # ray.data Schema: parallel names/types lists
        types = dict(zip(sch.names, sch.types))
        cols = {k: pa.array([], types[k]) for k in (by or [])}
        for f in out_fields:
            cols[f] = pa.array([], pa.int64() if f == "n" else pa.float64())
        return pa.table(cols)

    if firsts is None:
        return _empty()
    # keep only groups with ≥1 usable pair (all-null groups vanish, as in
    # SQL where corr over zero pairs is simply absent from GROUP BY HAVING
    # count filters; callers wanting NULL rows can outer-join back)
    firsts = firsts.filter(pc.greater(firsts["__n"], 0))
    if not firsts.num_rows:
        return _empty()
    n_arr = firsts["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
    mx_arr = firsts["__sx"].to_numpy(zero_copy_only=False) / n_arr
    my_arr = firsts["__sy"].to_numpy(zero_copy_only=False) / n_arr

    # broadcast the per-group means; pc.index_in maps each row's key to
    # its group slot (bounded groups → tiny lookup arrays in the closure)
    if by:
        key_struct = pc.binary_join_element_wise(
            *[pc.cast(firsts[k], pa.string()) for k in by], "\x1f") \
            if len(by) > 1 else pc.cast(firsts[by[0]], pa.string())
        key_lookup = key_struct.combine_chunks()
    else:
        key_lookup = None

    def pass2(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        if by:
            rk = pc.binary_join_element_wise(
                *[pc.cast(t[k], pa.string()) for k in by], "\x1f") \
                if len(by) > 1 else pc.cast(t[by[0]], pa.string())
            # a key missing from the lookup means its whole group had zero
            # usable pairs (every row masked by `ok`) — index_in yields
            # NULL there; park those rows on slot 0, `ok` zeroes them out
            idx = pc.fill_null(pc.index_in(rk, key_lookup), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            idx = np.zeros(len(x), np.int64)
        dx = np.where(ok, x - mx_arr[idx], 0.0)
        dy = np.where(ok, y - my_arr[idx], 0.0)
        cols = ({k: t[k] for k in by} if by
                else {"__g": pa.array(np.zeros(t.num_rows, np.int8))})
        p = pa.table({**cols,
                      "__m2x": pa.array(dx * dx),
                      "__m2y": pa.array(dy * dy),
                      "__cxy": pa.array(dx * dy)})
        g = p.group_by(keys).aggregate(
            [("__m2x", "sum"), ("__m2y", "sum"), ("__cxy", "sum")])
        return g.rename_columns(keys + ["__m2x", "__m2y", "__cxy"])

    seconds = _stream_sum_partials(
        ds.map_batches(pass2, batch_format="pyarrow", zero_copy_batch=True),
        keys)
    joined = firsts.join(seconds, keys=keys, join_type="inner")
    joined = joined.sort_by([(k, "ascending") for k in keys])

    n = joined["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = joined["__sx"].to_numpy(zero_copy_only=False)
    sy = joined["__sy"].to_numpy(zero_copy_only=False)
    m2x = joined["__m2x"].to_numpy(zero_copy_only=False)
    m2y = joined["__m2y"].to_numpy(zero_copy_only=False)
    cxy = joined["__cxy"].to_numpy(zero_copy_only=False)
    mean_x, mean_y = sx / n, sy / n
    var_x, var_y = m2x / n, m2y / n          # population, like regr_*/corr
    covar_pop = cxy / n
    with np.errstate(divide="ignore", invalid="ignore"):
        covar_samp = np.where(n > 1, cxy / (n - 1), np.nan)
        denom = np.sqrt(m2x * m2y)
        corr = np.where(denom > 0, cxy / denom, np.nan)
        slope = np.where(m2x > 0, cxy / m2x, np.nan)
        intercept = np.where(m2x > 0, mean_y - slope * mean_x, np.nan)
        r2 = np.where((m2x > 0) & (m2y > 0), corr * corr,
                      np.where(m2x > 0, 1.0, np.nan))

    def fcol(v: np.ndarray) -> pa.Array:
        return pa.array(np.where(np.isnan(v), None, v), pa.float64(),
                        from_pandas=True)

    cols = {k: joined[k] for k in (by or [])}
    cols.update({
        "n": pc.cast(joined["__n"], pa.int64()),
        "mean_x": fcol(mean_x), "mean_y": fcol(mean_y),
        "var_x": fcol(var_x), "var_y": fcol(var_y),
        "covar_pop": fcol(covar_pop), "covar_samp": fcol(covar_samp),
        "corr": fcol(corr), "slope": fcol(slope),
        "intercept": fcol(intercept), "r2": fcol(r2)})
    return pa.table(cols)


def histogram_equi_width(ds: rd.Dataset, col: str, num_bins: int,
                         lo: float | None = None,
                         hi: float | None = None) -> pa.Table:
    """Equi-width histogram of a numeric column: returns non-empty
    buckets as ``(bucket, bin_lo, bin_hi, n)``, bucket i covering
    [lo + i·w, lo + (i+1)·w) with w = (hi − lo)/num_bins and the top
    edge (x == hi) clamped into the last bucket (width_bucket LEAST
    semantics). When lo/hi are omitted a first pass computes the exact
    global min/max (nulls/NaN ignored); pass 2 is a fixed-length
    np.bincount partial per block, summed on the driver — O(num_bins)
    state end to end. Bin-edge arithmetic is the literal expression
    ``floor((x − lo) / w)`` in float64 so an oracle using the same SQL
    expression bit-matches the bucket assignment."""
    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")

    if lo is None or hi is None:
        def nmm(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            if not len(v):
                return pa.table({"lo": pa.array([], pa.float64()),
                                 "hi": pa.array([], pa.float64())})
            return pa.table({"lo": [float(v.min())], "hi": [float(v.max())]})

        parts = [pa.table(b) for b in ds.map_batches(
            nmm, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")]
        nonempty = [p for p in parts if p.num_rows]
        if not nonempty:  # all-null column → empty histogram
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "bin_lo": pa.array([], pa.float64()),
                             "bin_hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        allp = pa.concat_tables(nonempty)
        if lo is None:
            lo = float(pc.min(allp["lo"]).as_py())
        if hi is None:
            hi = float(pc.max(allp["hi"]).as_py())
    lo, hi = float(lo), float(hi)
    if hi < lo:
        raise ValueError(f"histogram range inverted: hi {hi} < lo {lo}")
    w = (hi - lo) / num_bins  # SAME expression as the SQL oracle

    def counts(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v <= hi)]  # out-of-range (explicit lo/hi) dropped
        if not len(v):
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        if w > 0:
            b = np.floor((v - lo) / w).astype(np.int64)
            b = np.minimum(b, num_bins - 1)   # clamp x == hi
        else:  # degenerate single-value range: everything in bucket 0
            b = np.zeros(len(v), np.int64)
        cnt = np.bincount(b, minlength=num_bins)
        nz = np.flatnonzero(cnt)  # sparse (bucket, count) partial rows —
        # safe under iter_batches re-slicing blocks at any row boundary
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    total = np.zeros(num_bins, np.int64)
    for b in ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows:
            np.add.at(total, t["b"].to_numpy(zero_copy_only=False),
                      t["c"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(total)
    return pa.table({
        "bucket": pa.array(nz, pa.int64()),
        "bin_lo": pa.array(lo + nz.astype(np.float64) * w),
        "bin_hi": pa.array(lo + (nz.astype(np.float64) + 1.0) * w),
        "n": pa.array(total[nz], pa.int64())})


def seasonal_hod_anomalies(ds: rd.Dataset, ts_col: str, key_col: str,
                           k: int = 2) -> pa.Table:
    """Seasonal rate-anomaly detection over an event stream (≙ the
    reference's HealthReporter rate tracking, app/health_reporter.py,
    upgraded from a global rate to a per-(key, hour-of-day) seasonal
    baseline): count events per (key, day, hour-of-day), build the
    per-(key, hod) mean/σ across days, and flag the cells whose count
    deviates more than ``k``·σ from their seasonal baseline.

    Scale shape: the only pass over the data emits per-batch
    (key, day, hod) count partials — bounded keys (#keys × #days × 24),
    so the combine is grouped_agg's driver mode and driver state is
    independent of row count. The flag predicate is evaluated in INTEGER
    arithmetic — (n·D − S)² > k²·(SS·D − S²) with S=Σn, SS=Σn², D=#days
    observed for that (key, hod) — which is algebraically identical to
    |n − μ| > k·σ_pop but has no float rounding, so the DuckDB oracle
    (same integer predicate via HUGEINT) agrees exactly on borderline
    cells. μ/σ are attached rounded, derivation-ordered identically to
    the SQL. Cells with zero events are absent on both sides (observed
    cells only — the baseline is over days where the cell appears)."""
    from .relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        day = pc.floor_temporal(ts, unit="day")
        hod = pc.cast(pc.hour(ts), pa.int64())
        g = pa.table({key_col: t[key_col], "day": day, "hod": hod}) \
            .group_by([key_col, "day", "hod"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "day", "hod", "n_p"])

    cells = grouped_agg(ds.map_batches(partial, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        [key_col, "day", "hod"],
                        [("n_p", "sum", "n")], mode="driver")
    t = pa.concat_tables(
        [pa.table(b) for b in cells.iter_batches(batch_format="pyarrow")])
    df = t.to_pandas()
    out_rows = []
    # bounded table (#keys × #days × 24): exact Python-int statistics per
    # (key, hod) slice — no overflow at any scale, no float predicate
    for (key, hod), grp in df.groupby([key_col, "hod"], sort=True):
        ns = [int(v) for v in grp["n"]]
        d = len(ns)
        s = sum(ns)
        ss = sum(v * v for v in ns)
        var_num = ss * d - s * s          # D²·σ²_pop, exact
        for day, n in sorted(zip(grp["day"], ns)):
            if (n * d - s) ** 2 > k * k * var_num:
                mu = s / d                     # same expression as SQL
                sigma = float(np.sqrt(float(var_num))) / d
                out_rows.append((key, day, int(hod), n,
                                 round_scalar(mu, 6),
                                 round_scalar(sigma, 6)))
    if not out_rows:
        return pa.table({key_col: pa.array([], pa.string()),
                         "day": pa.array([], pa.timestamp("us")),
                         "hod": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "mu": pa.array([], pa.float64()),
                         "sigma": pa.array([], pa.float64())})
    keys, days, hods, nss, mus, sigmas = zip(*out_rows)
    return pa.table({key_col: pa.array(list(keys)),
                     "day": pa.array(list(days), pa.timestamp("us")),
                     "hod": pa.array(list(hods), pa.int64()),
                     "n": pa.array(list(nss), pa.int64()),
                     "mu": pa.array(list(mus), pa.float64()),
                     "sigma": pa.array(list(sigmas), pa.float64())})


def welch_ttest_by(ds: rd.Dataset, key_col: str, val_col: str) -> pa.Table:
    """Per-group two-sample Welch t-test of ``val_col`` for each key's
    rows vs ALL OTHER rows (the group-vs-rest significance scan a corpus
    A/B report runs per segment): t = (m₁−m₀)/√(v₁/n₁+v₀/n₀) with the
    Welch–Satterthwaite df. Returns one row per key with n, t_stat, df.

    Numerics: complement moments must NOT come from raw Σx/Σx² differences
    (catastrophic cancellation). Pass 1 gets the exact global mean C; pass
    2 sums SHIFTED moments Σ(x−C), Σ(x−C)² per key — then any subset's
    sample variance is ((dd − d²/n)/(n−1)) and the complement's shifted
    sums are exact differences of per-key partials, all deviations
    O(σ)-sized. Both passes are bounded-key driver combines (O(#keys)
    driver state, no shuffle)."""
    from .relational import grouped_agg

    def p1(t: pa.Table) -> pa.Table:
        g = pa.table({key_col: t[key_col], "v": t[val_col]}) \
            .group_by([key_col]).aggregate([("v", "sum"), ([], "count_all")])
        return g.rename_columns([key_col, "s_p", "n_p"])

    t1 = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.map_batches(p1, batch_format="pyarrow", zero_copy_batch=True),
        [key_col], [("s_p", "sum", "s"), ("n_p", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    n_tot = int(pc.sum(t1["n"]).as_py())
    c = float(pc.sum(t1["s"]).as_py()) / n_tot   # global shift center

    def p2(t: pa.Table) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        dv = v - c
        g = pa.table({key_col: t[key_col], "d": dv, "dd": dv * dv}) \
            .group_by([key_col]).aggregate(
                [("d", "sum"), ("dd", "sum"), ([], "count_all")])
        return g.rename_columns([key_col, "d_p", "dd_p", "n_p"])

    t2 = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.map_batches(p2, batch_format="pyarrow", zero_copy_batch=True),
        [key_col], [("d_p", "sum", "d"), ("dd_p", "sum", "dd"),
                    ("n_p", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    t2 = t2.sort_by([(key_col, "ascending")])
    d_tot = float(pc.sum(t2["d"]).as_py())
    dd_tot = float(pc.sum(t2["dd"]).as_py())

    keys_out, ns, tstats, dfs = [], [], [], []
    for key, d1, dd1, n1 in zip(t2[key_col].to_pylist(),
                                t2["d"].to_pylist(), t2["dd"].to_pylist(),
                                t2["n"].to_pylist()):
        n0 = n_tot - n1
        if n1 < 2 or n0 < 2:
            continue  # Welch needs ≥2 on both sides (SQL mirrors via HAVING)
        d0, dd0 = d_tot - d1, dd_tot - dd1
        m1, m0 = c + d1 / n1, c + d0 / n0
        v1 = (dd1 - d1 * d1 / n1) / (n1 - 1)
        v0 = (dd0 - d0 * d0 / n0) / (n0 - 1)
        se1, se0 = v1 / n1, v0 / n0
        tt = (m1 - m0) / np.sqrt(se1 + se0)
        df_w = (se1 + se0) ** 2 / (se1 * se1 / (n1 - 1)
                                   + se0 * se0 / (n0 - 1))
        keys_out.append(key)
        ns.append(int(n1))
        tstats.append(round_scalar(float(tt), 6))
        dfs.append(round_scalar(float(df_w), 4))
    return pa.table({key_col: pa.array(keys_out),
                     "n": pa.array(ns, pa.int64()),
                     "t_stat": pa.array(tstats, pa.float64()),
                     "df": pa.array(dfs, pa.float64())})


def chi_square_independence(ds: rd.Dataset, col_a: str,
                            col_b: str) -> pa.Table:
    """Pearson chi-square test of independence between two BOUNDED
    categorical columns: one pass emits per-batch (a, b) count partials
    (driver-combined, O(#cells) state), then the dense contingency table
    — INCLUDING structurally-zero cells, which still contribute their
    expected mass — yields chi2 = Σ (o−e)²/e with e = rowΣ·colΣ/N and
    dof = (R−1)(C−1). Returns a single row {chi2, dof, n}."""
    from .relational import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({col_a: t[col_a], col_b: t[col_b]}) \
            .group_by([col_a, col_b]).aggregate([([], "count_all")])
        return g.rename_columns([col_a, col_b, "n_p"])

    cells = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        [col_a, col_b], [("n_p", "sum", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    df = cells.to_pandas()
    avals = sorted(df[col_a].unique())
    bvals = sorted(df[col_b].unique())
    ai = {v: i for i, v in enumerate(avals)}
    bi = {v: i for i, v in enumerate(bvals)}
    mat = np.zeros((len(avals), len(bvals)), np.float64)
    mat[df[col_a].map(ai).to_numpy(), df[col_b].map(bi).to_numpy()] = \
        df["n"].to_numpy()
    n = mat.sum()
    e = np.outer(mat.sum(axis=1), mat.sum(axis=0)) / n
    chi2 = float(np.sum((mat - e) ** 2 / e))
    dof = (len(avals) - 1) * (len(bvals) - 1)
    return pa.table({"chi2": pa.array([round_scalar(chi2, 6)], pa.float64()),
                     "dof": pa.array([dof], pa.int64()),
                     "n": pa.array([int(n)], pa.int64())})


def _pois1_cum() -> np.ndarray:
    import math
    p = np.array([math.exp(-1.0) / math.factorial(k) for k in range(13)],
                 np.float64)
    return np.cumsum(p)


# Poisson(1) inverse-CDF table: cumulative P(K <= k) for k = 0..12.
# Truncating at 12 loses < 1e-12 mass; the truncation is part of the
# deterministic contract (same weights in any run / engine build).
_POIS1_CUM = _pois1_cum()


def bootstrap_mean_ci(ds: rd.Dataset, id_col: str, val_col: str,
                      by: list[str] | None = None, n_boot: int = 100,
                      alpha: float = 0.05, seed: int = 7) -> pa.Table:
    """Distributed POISSON bootstrap (Chamandy et al. 2012 — the
    resample-free bootstrap for data too large to resample): replicate r
    weights every row by an independent Poisson(1) count, so each
    replicate's weighted mean is computable from ONE streaming pass of
    per-batch partials. Weights are counter-based — splitmix64 of
    (stable row hash ⊕ mix(seed, r)) through the Poisson(1) inverse CDF
    — so they are deterministic under ANY partitioning/order and
    reproducible across runs. Returns per group: the exact mean, the
    (alpha/2, 1−alpha/2) percentile CI over replicate means, and n.

    Scale shape: one pass, partials bounded at groups × n_boot rows per
    batch; driver state O(groups × n_boot). CPU is ~n_boot vectorized
    passes over each batch — the honest cost of a bootstrap, with no
    data movement beyond the tiny partials."""
    from ..functions.hashing import _splitmix64, stable_hash64
    from .relational import grouped_agg

    keys = list(by) if by else ["__g"]
    rmix = _splitmix64(np.uint64(seed)
                       ^ (np.arange(1, n_boot + 1, dtype=np.uint64)
                          * np.uint64(0x9E3779B97F4A7C15)))

    def partial(t: pa.Table) -> pa.Table:
        x = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = stable_hash64(t[id_col])
        gcols = ({k: t[k] for k in by} if by
                 else {"__g": pa.array(np.zeros(t.num_rows, np.int8))})
        out_parts = []
        for r in range(n_boot):
            u = (_splitmix64(h ^ rmix[r]).astype(np.float64)
                 / np.float64(2 ** 64))
            w = np.searchsorted(_POIS1_CUM, u).astype(np.float64)
            p = pa.table({**gcols,
                          "r": pa.array(np.full(t.num_rows, r, np.int32)),
                          "sw": pa.array(w * x),
                          "sn": pa.array(w)})
            out_parts.append(p.group_by(keys + ["r"]).aggregate(
                [("sw", "sum"), ("sn", "sum")])
                .rename_columns(keys + ["r", "sw", "sn"]))
        # the exact (unweighted) mean rides along as replicate -1
        p = pa.table({**gcols,
                      "r": pa.array(np.full(t.num_rows, -1, np.int32)),
                      "sw": pa.array(x),
                      "sn": pa.array(np.ones(len(x)))})
        out_parts.append(p.group_by(keys + ["r"]).aggregate(
            [("sw", "sum"), ("sn", "sum")])
            .rename_columns(keys + ["r", "sw", "sn"]))
        return pa.concat_tables(out_parts)

    cells = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys + ["r"], [("sw", "sum", "sw"), ("sn", "sum", "sn")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    df = cells.to_pandas()

    out_rows = []
    for gvals, sub in df.groupby(keys, sort=True):
        gvals = gvals if isinstance(gvals, tuple) else (gvals,)
        exact = sub[sub["r"] == -1]
        reps = sub[sub["r"] >= 0]
        reps = reps[reps["sn"] > 0]
        means = (reps["sw"] / reps["sn"]).to_numpy()
        mean = float(exact["sw"].iloc[0] / exact["sn"].iloc[0])
        lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
        out_rows.append((*(gvals if by else ()), round_scalar(mean, 6),
                         round_scalar(float(lo), 6),
                         round_scalar(float(hi), 6),
                         int(exact["sn"].iloc[0])))
    cols = {}
    for i, k in enumerate(by or []):
        cols[k] = pa.array([r[i] for r in out_rows])
    nk = len(by or [])
    cols["mean"] = pa.array([r[nk] for r in out_rows], pa.float64())
    cols["ci_lo"] = pa.array([r[nk + 1] for r in out_rows], pa.float64())
    cols["ci_hi"] = pa.array([r[nk + 2] for r in out_rows], pa.float64())
    cols["n"] = pa.array([r[nk + 3] for r in out_rows], pa.int64())
    return pa.table(cols)


def cusum_flags(ds: rd.Dataset, key_col: str, ts_col: str, val_col: str,
                target_cents: int, h_cents: int,
                tie_cols: list[str] | None = None,
                num_buckets: int | None = None,
                n_rows: int | None = None) -> rd.Dataset:
    """One-sided upper CUSUM drift detection per key (Page 1954): flag the
    rows where the cumulative excess of ``val_col`` over a target level
    exceeds a decision threshold — the classic sequential change-point
    monitor for per-entity rate/level shifts (abuse bursts, sensor drift,
    cost runaways).

    Exactness contract: values quantize to integer cents
    (floor(value·100)), so every engine computes the identical recursion
    S_i = max(0, S_{i-1} + x_i − target) in exact integer arithmetic — no
    float-summation-order drift, and the SQL oracle expresses the
    recursion CLOSED-FORM via the running-min identity
    S_i = C_i − min(0, min_{j≤i} C_j) with two window CTEs (C = running
    sum of deltas). The same identity vectorizes the Ray side:
    np.cumsum + np.minimum.accumulate per key, no per-row Python.

    Scale shape: one keyed_window bucket exchange (whole keys per bucket),
    O(1) state per key, flagged rows only leave the bucket."""
    from ..ops.relational import keyed_window, ts_as_us

    tie = tie_cols or []

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *tie], kind="mergesort")
        cents = np.floor(g[val_col].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        d = cents - np.int64(target_cents)
        keys = g[key_col].to_numpy()
        n = len(g)
        cum = np.cumsum(d)
        # restart the running sum and running min at each key boundary by
        # subtracting the previous key's closing prefix
        start = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1])))
        offset = np.repeat(cum[start] - d[start], np.diff(
            np.append(start, n)))
        cum = cum - offset
        # per-key running min via a segmented minimum.accumulate: reset by
        # substituting +inf-like sentinel at starts is wrong for ints, so
        # accumulate per segment over views (O(#keys) python, O(rows) C)
        run_min = np.empty(n, np.int64)
        bounds = np.append(start, n)
        for s, e in zip(bounds[:-1], bounds[1:]):
            np.minimum.accumulate(cum[s:e], out=run_min[s:e])
        s_stat = cum - np.minimum(run_min, 0)
        keep = s_stat > np.int64(h_cents)
        out = g[keep].drop(columns=["__b"], errors="ignore").copy()
        out["cusum"] = s_stat[keep]
        return out

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def mutual_information(ds: rd.Dataset, col_a: str, col_b: str,
                       ndigits: int = 6) -> pa.Table:
    """Mutual information (nats) between two BOUNDED categorical columns,
    plus both marginal entropies and the normalized MI
    (mi / sqrt(h_a·h_b)) — the dependence measure that complements the
    chi-square test with an effect SIZE on a log scale (feature/leakage
    screening over corpus metadata).

    Same scale shape as chi_square_independence: ONE map_batches pass of
    partial (a, b) counts (bounded by the category product), driver
    combines O(cells) scalars and evaluates the closed form. Null rows in
    either column drop (SQL GROUP BY would keep a NULL class; callers
    wanting that should fill first)."""
    from .relational import grouped_agg

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[col_a]), pc.is_valid(t[col_b]))
        return t.filter(m)

    cells = pa.concat_tables([pa.table(b) for b in grouped_agg(
        ds.select_columns([col_a, col_b]).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True),
        [col_a, col_b], [(col_a, "count", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    n = cells["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = n.sum()
    df = cells.to_pandas()
    na = df.groupby(col_a)["n"].transform("sum").to_numpy(np.float64)
    nb = df.groupby(col_b)["n"].transform("sum").to_numpy(np.float64)
    p = n / total
    mi = float(np.sum(p * np.log(n * total / (na * nb))))
    pa_m = df.groupby(col_a)["n"].sum().to_numpy(np.float64) / total
    pb_m = df.groupby(col_b)["n"].sum().to_numpy(np.float64) / total
    h_a = float(-np.sum(pa_m * np.log(pa_m)))
    h_b = float(-np.sum(pb_m * np.log(pb_m)))
    nmi = mi / np.sqrt(h_a * h_b) if h_a > 0 and h_b > 0 else 0.0
    return pa.table({
        "mi": pa.array([round_scalar(mi, ndigits)], pa.float64()),
        "h_a": pa.array([round_scalar(h_a, ndigits)], pa.float64()),
        "h_b": pa.array([round_scalar(h_b, ndigits)], pa.float64()),
        "nmi": pa.array([round_scalar(float(nmi), ndigits)], pa.float64()),
    })


def psi_numeric(ref: rd.Dataset, cur: rd.Dataset, col: str,
                n_bins: int = 10, smoothing: float = 0.5,
                collect_limit: int = 200_000,
                ndigits: int = 6) -> pa.Table:
    """Population Stability Index between two snapshots of a numeric
    column — the industry-standard distribution-drift monitor (rule of
    thumb: < 0.1 stable, 0.1–0.25 shifting, > 0.25 action). Bins are the
    REFERENCE side's equal-frequency quantile cuts (exact order
    statistics via the no-collect refinement, so both engines compare
    identical doubles); each side then bin-counts in one bounded pass and
    the driver evaluates Σ (p−q)·ln(p/q) over Laplace-smoothed
    proportions ((n_i + s)/(N + s·bins) — empty bins otherwise make the
    index infinite). Returns per-bin rows (n_ref, n_cur, psi_part) plus
    the total as their sum, checkable bin by bin."""
    from .relational import exact_quantile_disc
    from ..functions.rounding import round_np

    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = np.asarray(exact_quantile_disc(
        ref, col, qs, collect_limit=collect_limit), np.float64)

    n_ref = _psi_bin_counts(ref, col, bounds, n_bins)
    n_cur = _psi_bin_counts(cur, col, bounds, n_bins)
    p = (n_ref + smoothing) / (n_ref.sum() + smoothing * n_bins)
    q = (n_cur + smoothing) / (n_cur.sum() + smoothing * n_bins)
    part = (p - q) * np.log(p / q)
    return pa.table({
        "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
        "n_ref": pa.array(n_ref, pa.int64()),
        "n_cur": pa.array(n_cur, pa.int64()),
        "psi_part": pa.array(round_np(part, ndigits)),
    })


def autocorr_by(ds: rd.Dataset, key_col: str, ts_col: str, val_col: str,
                lag: int = 1, tie_cols: list[str] | None = None,
                out_col: str = "ac", ndigits: int = 6,
                num_buckets: int | None = None,
                n_rows: int | None = None) -> rd.Dataset:
    """Lag-k autocorrelation of a per-key time series (corr of x_t with
    x_{t-lag} in event order): the serial-dependence screen for metric
    streams — near zero for i.i.d. noise, positive for trending/bursty
    keys. Returns (key, ac, n_pairs); keys with fewer than lag+2 points
    or a zero-variance side yield NULL (SQL corr semantics).

    One keyed_window bucket exchange; per key the lagged pairs come from
    an array shift and the correlation from the numerically-safe centered
    two-pass form (the same cancellation-free shape as bivariate_stats,
    here exact because each key's pairs are bucket-local)."""
    from .relational import keyed_window

    tie = tie_cols or []

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *tie], kind="mergesort")
        keys_arr = g[key_col].to_numpy()
        x = g[val_col].to_numpy(np.float64)
        n = len(g)
        start = np.flatnonzero(np.concatenate(
            ([True], keys_arr[1:] != keys_arr[:-1])))
        bounds = np.append(start, n)
        out_k, out_ac, out_n = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            xs = x[s:e]
            if len(xs) <= lag:
                continue
            a, b = xs[lag:], xs[:-lag]
            out_k.append(keys_arr[s])
            out_n.append(len(a))
            da, db = a - a.mean(), b - b.mean()
            va, vb = float(da @ da), float(db @ db)
            if va <= 0.0 or vb <= 0.0:
                out_ac.append(None)
            else:
                out_ac.append(
                    round_scalar(float(da @ db) / np.sqrt(va * vb),
                                 ndigits))
        return pd.DataFrame({key_col: out_k,
                             out_col: pd.array(out_ac, dtype="float64"),
                             "n_pairs": np.asarray(out_n, np.int64)})

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def interarrival_by(ds: rd.Dataset, key_col: str, ts_col: str,
                    tie_cols: list[str] | None = None,
                    ndigits: int = 6,
                    num_buckets: int | None = None,
                    n_rows: int | None = None) -> rd.Dataset:
    """Inter-arrival gap statistics per key (min/max/mean microseconds
    between consecutive events): the burstiness/heartbeat profile that
    capacity planning and bot detection read first. Gaps are exact int64
    microsecond differences (lag semantics, deterministic tie order), so
    min/max are exact and the mean is one exact-int division — identical
    on every engine at any partitioning.

    Same keyed_window shape; per-bucket the gaps reduce immediately to
    one row per key, so only O(keys) rows leave the exchange."""
    from .relational import keyed_window, ts_as_us

    tie = tie_cols or []

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, *tie], kind="mergesort")
        keys_arr = g[key_col].to_numpy()
        ts = ts_as_us(pa.Array.from_pandas(g[ts_col])).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(g)
        same = np.concatenate(([False], keys_arr[1:] == keys_arr[:-1]))
        gaps = np.concatenate(([0], ts[1:] - ts[:-1]))
        start = np.flatnonzero(np.concatenate(
            ([True], keys_arr[1:] != keys_arr[:-1])))
        bounds = np.append(start, n)
        out = {k: [] for k in (key_col, "min_gap_us", "max_gap_us",
                               "mean_gap_us", "n_gaps")}
        for s, e in zip(bounds[:-1], bounds[1:]):
            gs = gaps[s:e][same[s:e]]
            if not len(gs):
                continue
            out[key_col].append(keys_arr[s])
            out["min_gap_us"].append(int(gs.min()))
            out["max_gap_us"].append(int(gs.max()))
            out["mean_gap_us"].append(
                round_scalar(float(int(gs.sum()) / len(gs)), ndigits))
            out["n_gaps"].append(len(gs))
        return pd.DataFrame({
            key_col: out[key_col],
            "min_gap_us": np.asarray(out["min_gap_us"], np.int64),
            "max_gap_us": np.asarray(out["max_gap_us"], np.int64),
            "mean_gap_us": np.asarray(out["mean_gap_us"], np.float64),
            "n_gaps": np.asarray(out["n_gaps"], np.int64),
        })

    return keyed_window(ds, key_col, window,
                        num_buckets=num_buckets, n_rows=n_rows)


def decayed_counts(ds: rd.Dataset, key_col: str, ts_col: str,
                   half_life_s: float, anchor_us: int,
                   ndigits: int = 6) -> pa.Table:
    """Time-decayed popularity per key ("trending now"): each event
    contributes 2^((t − anchor)/half_life), so an event one half-life
    before the anchor counts half as much — the exponential-decay counter
    streaming leaderboards use, computed in ONE bounded pass (per-batch
    per-key partial sums of exponentials, driver combine; the anchor
    pins the exponent range so nothing overflows and any two runs/
    engines evaluate identical per-row doubles). Returns
    (key, decayed, n) sorted by key."""
    from .relational import grouped_agg, ts_as_us

    hl_us = float(half_life_s) * 1_000_000.0

    def partial(t: pa.Table) -> pa.Table:
        us = ts_as_us(t[ts_col]).to_numpy(zero_copy_only=False).astype(
            np.float64)
        w = np.power(2.0, (us - float(anchor_us)) / hl_us)
        return pa.table({key_col: t[key_col],
                         "__w": pa.array(w),
                         "__n": pa.array(np.ones(t.num_rows, np.int64))})

    agg = grouped_agg(ds.select_columns([key_col, ts_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col], [("__w", "sum", "decayed"), ("__n", "sum", "n")],
        mode="driver")
    t = pa.concat_tables([pa.table(b) for b in agg.iter_batches(
        batch_format="pyarrow")]).sort_by([(key_col, "ascending")])
    from ..functions.rounding import round_np
    return pa.table({
        key_col: t[key_col],
        "decayed": pa.array(round_np(
            t["decayed"].to_numpy(zero_copy_only=False), ndigits)),
        "n": pa.array(t["n"].to_numpy(zero_copy_only=False)
                      .astype(np.int64)),
    })


_PSI_SCHEME = "psi-v1:floor-decile-left-open:laplace0.5"


def psi_save_baseline(ref: rd.Dataset, col: str, out_path: str,
                      n_bins: int = 10,
                      collect_limit: int = 200_000) -> dict:
    """Persist a PSI drift BASELINE (the production monitor shape:
    compute the reference profile once over the committed corpus, then
    score every new batch against it with one cheap pass — never
    re-reading the reference). Stores the exact quantile cut points and
    the reference bin counts as one JSON artifact, committed via the
    same tmp→rename atomic protocol as every persisted layout here, with
    a ``scheme`` stamp so a binning change can't silently mix with old
    baselines."""
    import json
    import os
    from pathlib import Path

    from .relational import exact_quantile_disc

    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = exact_quantile_disc(ref, col, qs,
                                 collect_limit=collect_limit)
    n_ref = _psi_bin_counts(ref, col, np.asarray(bounds, np.float64),
                            n_bins)
    meta = {"scheme": _PSI_SCHEME, "col": col, "n_bins": n_bins,
            "bounds": [float(b) for b in bounds],
            "n_ref": [int(x) for x in n_ref]}
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_name("." + out.name + ".tmp")
    tmp.write_text(json.dumps(meta, sort_keys=True))
    os.replace(tmp, out)
    return meta


def _psi_bin_counts(ds: rd.Dataset, col: str, bounds: np.ndarray,
                    n_bins: int) -> np.ndarray:
    from .relational import grouped_agg

    def assign(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return pa.table({"bin": pa.array(b, pa.int64())})

    parts = pa.concat_tables([pa.table(x) for x in grouped_agg(
        ds.select_columns([col]).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True),
        ["bin"], [("bin", "count", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    dense = np.zeros(n_bins, np.int64)
    got = parts.to_pandas()
    dense[got["bin"].to_numpy(np.int64)] = got["n"].to_numpy(np.int64)
    return dense


def psi_check_against_baseline(cur: rd.Dataset, baseline_path: str,
                               smoothing: float = 0.5,
                               ndigits: int = 6) -> pa.Table:
    """Score a NEW batch against a persisted PSI baseline: one bounded
    bin-count pass over the batch (the reference is never touched), the
    same Laplace-smoothed per-bin contributions as psi_numeric. Refuses a
    baseline written under a different binning scheme."""
    import json
    from pathlib import Path

    from ..functions.rounding import round_np

    meta = json.loads(Path(baseline_path).read_text())
    if meta.get("scheme") != _PSI_SCHEME:
        raise ValueError(
            f"PSI baseline at {baseline_path} has scheme "
            f"{meta.get('scheme')!r}; this build expects {_PSI_SCHEME!r}")
    n_bins = int(meta["n_bins"])
    bounds = np.asarray(meta["bounds"], np.float64)
    n_ref = np.asarray(meta["n_ref"], np.int64)
    n_cur = _psi_bin_counts(cur, meta["col"], bounds, n_bins)
    p = (n_ref + smoothing) / (n_ref.sum() + smoothing * n_bins)
    q = (n_cur + smoothing) / (n_cur.sum() + smoothing * n_bins)
    part = (p - q) * np.log(p / q)
    return pa.table({
        "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
        "n_ref": pa.array(n_ref, pa.int64()),
        "n_cur": pa.array(n_cur, pa.int64()),
        "psi_part": pa.array(round_np(part, ndigits)),
    })


def psi_trajectory(cur: rd.Dataset, ts_col: str, col: str,
                   baseline_path: str, unit: str = "day",
                   smoothing: float = 0.5,
                   ndigits: int = 6) -> pa.Table:
    """Drift TRAJECTORY: PSI of every time bucket against a persisted
    baseline — the monitoring view that turns the single drift scalar
    into a when-did-it-start curve. ONE bounded pass emits
    (bucket, bin) partial counts (buckets × bins, tiny), the driver
    evaluates each bucket's Laplace-smoothed PSI against the stored
    reference profile. Returns (bucket ts, psi, n) sorted by time."""
    import json
    from pathlib import Path

    from .relational import grouped_agg
    from ..functions.rounding import round_scalar

    meta = json.loads(Path(baseline_path).read_text())
    if meta.get("scheme") != _PSI_SCHEME:
        raise ValueError(
            f"PSI baseline at {baseline_path} has scheme "
            f"{meta.get('scheme')!r}; this build expects {_PSI_SCHEME!r}")
    n_bins = int(meta["n_bins"])
    bounds = np.asarray(meta["bounds"], np.float64)
    n_ref = np.asarray(meta["n_ref"], np.int64)
    p = (n_ref + smoothing) / (n_ref.sum() + smoothing * n_bins)

    vcol = meta["col"] if col is None else col

    def assign(t: pa.Table) -> pa.Table:
        v = t[vcol].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        b = np.searchsorted(bounds, v[ok], side="left").astype(np.int64)
        day = pc.floor_temporal(t[ts_col].filter(pa.array(ok)), unit=unit)
        return pa.table({"bucket": day, "bin": pa.array(b, pa.int64())})

    cells = pa.concat_tables([pa.table(x) for x in grouped_agg(
        cur.select_columns([ts_col, vcol]).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket", "bin"], [("bin", "count", "n")],
        mode="driver").iter_batches(batch_format="pyarrow")])
    df = cells.to_pandas()
    out_b, out_psi, out_n = [], [], []
    for bucket, sub in df.groupby("bucket", sort=True):
        dense = np.zeros(n_bins, np.int64)
        dense[sub["bin"].to_numpy(np.int64)] = sub["n"].to_numpy(np.int64)
        q = (dense + smoothing) / (dense.sum() + smoothing * n_bins)
        out_b.append(bucket)
        out_psi.append(round_scalar(float(np.sum((p - q) * np.log(p / q))),
                                    ndigits))
        out_n.append(int(dense.sum()))
    return pa.table({
        "bucket": pa.array(out_b),
        "psi": pa.array(out_psi, pa.float64()),
        "n": pa.array(out_n, pa.int64()),
    })


def gini(ds: rd.Dataset, col: str, ndigits: int = 6) -> pa.Table:
    """Exact Gini concentration index of a CONTINUOUS column — the
    inequality/concentration diagnostic a corpus health report wants for
    "how much of the traffic/revenue/token mass sits in the head"
    (host-skew and Zipf-head questions in one scalar; 0 = uniform,
    →1 = one row holds everything). G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n
    over 1-based ranks of the ascending sort.

    Scale shape: distinct values ≈ rows here, so the bounded-histogram
    rank tricks (global_percent_rank) don't apply — this is the honest
    sort-based path. ONE all-to-all range sort, then a single partial
    pass per block emitting (min, max, count, Σx, Σ j·x over LOCAL
    0-based j); the driver orders the O(blocks) partials by (min, max)
    and folds Σ i·x = Σ_b [offset_b·Σx_b + Σ j·x + Σx_b] (1-based).
    (min, max) is a total order on contiguous runs of a sorted sequence:
    two runs can collide on both only when each is a constant run of one
    tied value, and Σ i·x is invariant under permuting equal values.
    Nulls drop (SQL rank semantics)."""
    from .relational import filter_batches

    nn = filter_batches(ds.select_columns([col]),
                        lambda t: pc.is_valid(t[col]))
    sorted_ds = nn.sort(col)

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "cnt": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.float64()),
                             "sjx": pa.array([], pa.float64())})
        j = np.arange(len(v), dtype=np.float64)
        return pa.table({"mn": pa.array([float(v[0])]),
                         "mx": pa.array([float(v[-1])]),
                         "cnt": pa.array([len(v)], pa.int64()),
                         "sx": pa.array([float(v.sum())]),
                         "sjx": pa.array([float((j * v).sum())])})

    parts = []
    for b in sorted_ds.map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        parts.append(pa.table(b))
    tbl = pa.concat_tables(parts) if parts else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({"gini": pa.array([], pa.float64()),
                         "n": pa.array([], pa.int64())})
    mn = tbl["mn"].to_numpy()
    mx = tbl["mx"].to_numpy()
    order = np.lexsort((mx, mn))
    cnt = tbl["cnt"].to_numpy()[order].astype(np.int64)
    sx = tbl["sx"].to_numpy()[order]
    sjx = tbl["sjx"].to_numpy()[order]
    offs = np.zeros(len(cnt), np.int64)
    np.cumsum(cnt[:-1], out=offs[1:])
    n = int(cnt.sum())
    total = float(sx.sum())
    # 1-based global ranks: i = offset + j + 1
    s_ix = float((offs * sx).sum() + sjx.sum() + sx.sum())
    g = 2.0 * s_ix / (n * total) - (n + 1.0) / n
    return pa.table({"gini": pa.array([round_scalar(g, ndigits)]),
                     "n": pa.array([n], pa.int64())})


def ks_two_sample(ds: rd.Dataset, group_col: str, val_col: str,
                  group_a, group_b, ndigits: int = 6) -> pa.Table:
    """Exact two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two groups: D = max over v of |F_a(v) − F_b(v)| —
    the distribution-drift test that needs no binning choices (the
    nonparametric companion to psi_numeric/JSD/chi²/t-test in the drift
    family).

    Scale shape: values are continuous (distinct ≈ rows), so per-VALUE
    counts ride a bucket-mode exchange first (never a driver histogram),
    then ONE range sort of the distinct-value table and ONE partial pass
    over it. The per-batch partial is (min value, Σa, Σb, and the
    extremes of the batch's LOCAL inclusive prefix-gap series
    gᵢ = cumsum(a)/tₐ − cumsum(b)/t_b): the global gap inside a batch is
    |C + gᵢ| for the batch-constant offset C = offₐ/tₐ − off_b/t_b, and
    max|C + gᵢ| = max(|C + max g|, |C + min g|) — so batch extremes plus
    an O(batches) driver offset fold reconstruct the exact global max
    under ANY batching (batch boundaries need not be stable or known;
    distinct values make batch minima a strict total order for the
    fold). CDF ratios divide identical integers on every engine, so the
    rounded statistic is drift-free cross-engine."""
    from .relational import filter_batches, grouped_agg

    two = filter_batches(
        ds.select_columns([group_col, val_col]),
        lambda t: pc.and_(pc.is_valid(t[val_col]),
                          pc.is_in(t[group_col],
                                   value_set=pa.array([group_a, group_b]))))

    def tag(t: pa.Table) -> pa.Table:
        isa = pc.equal(t[group_col], group_a)
        return pa.table({
            "v": t[val_col],
            "na": pc.cast(isa, pa.int64()),
            "nb": pc.cast(pc.invert(isa), pa.int64())})

    per_val = grouped_agg(two.map_batches(tag, batch_format="pyarrow",
                                          zero_copy_batch=True),
                          ["v"], [("na", "sum", "na"), ("nb", "sum", "nb")],
                          mode="bucket")
    sorted_ds = per_val.sort("v").materialize()
    ta = int(sorted_ds.sum("na") or 0)
    tb = int(sorted_ds.sum("nb") or 0)
    if ta == 0 and tb == 0:
        return pa.table({"ks": pa.array([], pa.float64()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64())})
    if ta == 0 or tb == 0:
        raise ValueError("ks_two_sample: one group has no rows")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"mn": pa.array([], pa.float64()),
                          "sa": pa.array([], pa.int64()),
                          "sb": pa.array([], pa.int64()),
                          "gmax": pa.array([], pa.float64()),
                          "gmin": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        g = np.cumsum(na) / ta - np.cumsum(nb) / tb
        return pa.table({
            "mn": pa.array([float(v[0])]),
            "sa": pa.array([int(na.sum())], pa.int64()),
            "sb": pa.array([int(nb.sum())], pa.int64()),
            "gmax": pa.array([float(g.max())]),
            "gmin": pa.array([float(g.min())])})

    parts = pa.concat_tables([pa.table(b) for b in sorted_ds.map_batches(
        partial, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow")])
    mn = parts["mn"].to_numpy()
    order = np.argsort(mn, kind="stable")
    sa = parts["sa"].to_numpy()[order].astype(np.int64)
    sb = parts["sb"].to_numpy()[order].astype(np.int64)
    gmax = parts["gmax"].to_numpy()[order]
    gmin = parts["gmin"].to_numpy()[order]
    offa = np.zeros(len(sa), np.int64)
    offb = np.zeros(len(sb), np.int64)
    np.cumsum(sa[:-1], out=offa[1:])
    np.cumsum(sb[:-1], out=offb[1:])
    c = offa / ta - offb / tb
    dmax = float(np.maximum(np.abs(c + gmax), np.abs(c + gmin)).max())
    return pa.table({"ks": pa.array([round_scalar(dmax, ndigits)]),
                     "n_a": pa.array([ta], pa.int64()),
                     "n_b": pa.array([tb], pa.int64())})
