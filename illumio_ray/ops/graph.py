"""Distributed graph algorithms over an edge Dataset.

The iterative family beyond dedup's min-label components: each round is a
hash join (edges ⋈ ranks on src) plus a grouped-sum exchange on dst —
only (node, float) rows ever move, never payload data. Rounds materialize
(the components-loop lesson: re-executing lazy lineage per iteration is
quadratic). ≙ the reference's batch analytics surface generalized to
iterative jobs; no counterpart exists there — this is a brief extension
like the dedup/similarity families.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def pagerank(edges: rd.Dataset, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             num_partitions: int | None = None, mode: str = "auto",
             broadcast_limit: int = 2_000_000,
             normalize: bool = False) -> rd.Dataset:
    """PageRank by fixed-iteration power method → (node, rank).

    Semantics pinned for the test oracle (classic Brin/Page with uniform
    dangling redistribution):
        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)
    where D = Σ r(u) over dangling nodes (no out-edges). Parallel edges
    count once (the edge set is deduplicated first); ranks sum to 1 every
    round. With ``normalize=True`` the returned ranks are multiplied by N
    (uniform graph ≡ 1.0 everywhere) — O(1)-magnitude values at any
    corpus size, which also makes a fixed-decimal cross-engine compare
    drift-safe.

    Modes (rel.grouped_agg convention):
      - "shuffle": ranks stay a Dataset; out-degrees, per-edge weights
        and the dangling flag are computed ONCE, then each round is one
        hash join on src + one bucketed grouped sum on dst, materialized
        per round (re-executing lazy lineage per iteration is quadratic).
        Driver state is O(1) per round (N fixed, D a one-row aggregate).
      - "broadcast": the rank/out-degree vectors live on the driver as
        numpy arrays (O(nodes) driver memory — the node table at web
        scale ≈ hosts, far smaller than edges) and ride the object store
        into a per-batch Arrow join; each round costs one broadcast join
        over the edges + one bucketed grouped sum, with no per-round
        rank shuffle. Same floats as "shuffle" (equivalence-tested).
      - "auto" (default): broadcast at or below ``broadcast_limit``
        nodes, else shuffle — same gate style as the dedup fast paths."""
    from .dedup import _distinct_rows_bucketed
    from .relational import drop_empty_blocks, grouped_agg, hash_join

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t[src], pa.int64()),
                         "dst": pc.cast(t[dst], pa.int64())})

    e = edges.map_batches(as_edges, batch_format="pyarrow",
                          zero_copy_batch=True)
    e = _distinct_rows_bucketed(e, ["src", "dst"]).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(cpus, n_edges // 250_000 + 1))

    # node universe AND out-degrees in ONE bucket exchange: every edge
    # emits (src, 1) + (dst, 0); the grouped sum is the out-degree and
    # its key set is exactly the node universe (outdeg 0 = dangling).
    def endpoints(t: pa.Table) -> pa.Table:
        ns = t.num_rows
        return pa.table({
            "node": pa.array(np.concatenate([
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False)]), pa.int64()),
            "__o": pa.array(np.concatenate([
                np.ones(ns, np.int64), np.zeros(ns, np.int64)]))})

    deg = drop_empty_blocks(grouped_agg(
        e.map_batches(endpoints, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["node"], [("__o", "sum", "outdeg")], mode="bucket"))
    n_nodes = deg.count()

    if mode == "auto":
        mode = "broadcast" if n_nodes <= broadcast_limit else "shuffle"
    if mode == "broadcast":
        return _pagerank_broadcast(e, deg, n_nodes, damping,
                                   iters, normalize)
    if mode != "shuffle":
        raise ValueError(f"unknown pagerank mode: {mode}")

    # per-edge weight 1/outdeg(src), fixed across rounds
    weighted = hash_join(
        e,
        deg.map_batches(lambda t: pa.table(
            {"src": t["node"], "outdeg": t["outdeg"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        on=["src"], num_partitions=num_partitions).map_batches(
        lambda t: pa.table({
            "src": t["src"], "dst": t["dst"],
            "w": pc.divide(pa.array(np.ones(t.num_rows)),
                           pc.cast(t["outdeg"], pa.float64()))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # dangling flag rides the rank table (outdeg 0 ⇒ dangling)
    ranks = deg.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            "dangling": pc.cast(pc.equal(t["outdeg"], pa.scalar(0)),
                                pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # D = Σ rank over dangling nodes (one-row aggregate to the driver)
        d_mass = ranks.map_batches(
            lambda t: pa.table({"d": pa.array(
                [float(np.dot(t["rank"].to_numpy(zero_copy_only=False),
                              t["dangling"].to_numpy(zero_copy_only=False)))
                 ])}),
            batch_format="pyarrow", zero_copy_batch=True).sum("d") or 0.0
        share = damping * d_mass / n_nodes

        contrib = hash_join(
            weighted,
            ranks.map_batches(lambda t: pa.table(
                {"src": t["node"], "r": t["rank"]}),
                batch_format="pyarrow", zero_copy_batch=True),
            on=["src"], num_partitions=num_partitions).map_batches(
            lambda t: pa.table({
                "node": t["dst"],
                "c": pc.multiply(t["w"], t["r"])}),
            batch_format="pyarrow", zero_copy_batch=True)
        sums = drop_empty_blocks(grouped_agg(
            contrib, ["node"], [("c", "sum", "csum")], mode="bucket"))

        # new rank = base + d*(csum + D/N); nodes with no in-edges get 0 csum
        ranks = hash_join(
            ranks.select_columns(["node", "dangling"]), sums,
            on=["node"], join_type="left_outer",
            num_partitions=num_partitions).map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "rank": pc.add(
                    pa.scalar(base + share),
                    pc.multiply(pa.scalar(damping),
                                pc.fill_null(t["csum"], 0.0))),
                "dangling": t["dangling"]}),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    if not normalize:
        return ranks.select_columns(["node", "rank"])
    return ranks.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": pc.multiply(t["rank"],
                                pa.scalar(float(n_nodes)))}),
        batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_broadcast(e: rd.Dataset, deg: rd.Dataset,
                        n_nodes: int, damping: float,
                        iters: int, normalize: bool) -> rd.Dataset:
    """Broadcast-mode body: rank/out-degree vectors as driver numpy
    arrays. Per round, ONE fused map over the (materialized,
    deduplicated) edges — vectorized index_in lookup of rank/outdeg
    against the broadcast node array, then a local Arrow group-by sum on
    dst — whose O(in-degree-distinct) partials stream straight back to
    the driver and accumulate into the dense contribution vector. No
    per-round shuffle at all (the bucket exchange the shuffle path needs
    is pointless when the reduce target already fits the driver)."""
    from .relational import _BROADCAST_CACHE

    deg_t = pa.concat_tables(
        deg.iter_batches(batch_format="pyarrow", batch_size=None))
    # sorted node order: per-batch lookups become O(batch·log n)
    # searchsorted against a once-shipped array (pc.index_in would
    # rebuild its hash index of all n nodes in every batch)
    nodes_np = deg_t["node"].to_numpy(zero_copy_only=False)
    order = np.argsort(nodes_np, kind="stable")
    nodes_np = np.ascontiguousarray(nodes_np[order])
    d = deg_t["outdeg"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)[order]
    has_out = d > 0
    base = (1.0 - damping) / n_nodes
    r = np.full(n_nodes, 1.0 / n_nodes, np.float64)
    node_ref = ray.put(nodes_np)
    for _ in range(iters):
        w = np.zeros(n_nodes, np.float64)
        np.divide(r, d, out=w, where=has_out)
        w_ref = ray.put(w)

        def partial(t: pa.Table, _nr=node_ref, _wr=w_ref) -> pa.Table:
            na = _BROADCAST_CACHE.get(_nr)
            if na is None:
                # one-entry bound, same contract as relational.py's
                # broadcast helpers — without the clear, each pagerank
                # call leaks one node array per worker process
                _BROADCAST_CACHE.clear()
                na = ray.get(_nr)
                _BROADCAST_CACHE[_nr] = na
            wv = ray.get(_wr)  # new per round; tiny (n_nodes floats)
            si = np.searchsorted(
                na, t["src"].to_numpy(zero_copy_only=False))
            loc = pa.table({"dst": t["dst"],
                            "w": pa.array(wv[si])})
            g = loc.group_by(["dst"]).aggregate([("w", "sum")])
            # select by NAME: pyarrow has shifted key/aggregate column
            # order across versions (why grouped_agg does the same)
            return pa.table({"dst": g["dst"], "csum": g["w_sum"]})

        c = np.zeros(n_nodes, np.float64)
        parts = e.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
        for b in parts.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            t = pa.table(b)
            if not t.num_rows:
                continue
            cidx = np.searchsorted(
                nodes_np, t["dst"].to_numpy(zero_copy_only=False))
            np.add.at(c, cidx,
                      t["csum"].to_numpy(zero_copy_only=False))
        d_mass = float(r[~has_out].sum())
        r = base + damping * (c + d_mass / n_nodes)
    if normalize:
        r = r * n_nodes
    return rd.from_arrow(pa.table({"node": pa.array(nodes_np, pa.int64()),
                                   "rank": pa.array(r)}))


def _basket_items_and_pairs(ds: rd.Dataset, group_col: str, item_col: str,
                            n_rows: int | None = None,
                            max_group_items: int = 10_000
                            ) -> tuple[rd.Dataset, rd.Dataset]:
    """Shared market-basket front end: the distinct (group, item) table
    (materialized — both consumers re-scan it) and the raw per-group pair
    rows, ONE row per (group, unordered item pair), a < b. Pair emission
    is fully vectorized (repeat/arange index algebra); a group over
    ``max_group_items`` fails loudly instead of emitting a quadratic
    block."""
    from .dedup import _distinct_rows_bucketed
    from .relational import keyed_window

    pruned = ds.map_batches(
        lambda t: pa.table({"g": pc.cast(t[group_col], pa.int64()),
                            "i": pc.cast(t[item_col], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    gi = _distinct_rows_bucketed(pruned, ["g", "i"])

    def emit_pairs(df) -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(["g", "i"], kind="mergesort")
        g = df["g"].to_numpy(np.int64)
        it = df["i"].to_numpy(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"a": np.array([], np.int64),
                                 "b": np.array([], np.int64)})
        new_g = np.empty(n, bool)
        new_g[0] = True
        new_g[1:] = g[1:] != g[:-1]
        grp = np.cumsum(new_g) - 1
        sizes = np.bincount(grp)
        if sizes.max(initial=0) > max_group_items:
            raise ValueError(
                f"cooccurrence_edges: a group holds {int(sizes.max())} "
                f"items (> max_group_items={max_group_items}); its pair "
                "fan-out is quadratic — filter or cap the basket first")
        first = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        loc = np.arange(n) - first[grp]
        # row k pairs with every LATER row of its group: k appears
        # (size - 1 - loc) times on the left, partners are k+1, k+2, …
        cnt = sizes[grp] - 1 - loc
        ii = np.repeat(np.arange(n), cnt)
        start = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        jj = np.arange(cnt.sum()) - start[ii] + ii + 1
        a, b = it[ii], it[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi  # duplicate items cannot appear (distinct g,i)
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]})

    # pin the distinct table: keyed_window's default bucket sizing calls
    # count(), which would otherwise re-run the whole distinct exchange
    # for the sizing pass and again for the real pass
    gi = gi.materialize()
    pairs = keyed_window(gi, "g", emit_pairs, n_rows=n_rows)
    pairs = pairs.map_batches(
        lambda t: pa.table({"a": pc.cast(t["a"], pa.int64()),
                            "b": pc.cast(t["b"], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return gi, pairs


def cooccurrence_edges(ds: rd.Dataset, group_col: str, item_col: str,
                       num_buckets: int | None = None,
                       n_rows: int | None = None,
                       max_group_items: int = 10_000) -> rd.Dataset:
    """Undirected co-occurrence edge set: one (a, b) a < b edge per pair
    of distinct items sharing a group (parts in the same order, terms in
    the same doc) — the classic market-basket graph builder.

    Shape: distinct (group, item) first (bucket exchange — keys ≈ rows),
    then ONE group-bucket exchange emits each group's pairs fully
    vectorized (_basket_items_and_pairs), then a pair-bucket distinct."""
    from .dedup import _distinct_rows_bucketed

    _, pairs = _basket_items_and_pairs(ds, group_col, item_col,
                                       n_rows=n_rows,
                                       max_group_items=max_group_items)
    return _distinct_rows_bucketed(pairs, ["a", "b"])


def association_rules(ds: rd.Dataset, group_col: str, item_col: str,
                      min_pair_count: int = 2, k: int = 20,
                      n_rows: int | None = None,
                      max_group_items: int = 10_000,
                      ndigits: int = 6) -> rd.Dataset:
    """Market-basket association rules (Agrawal et al. 1993): for every
    unordered item pair co-occurring in ≥ ``min_pair_count`` baskets,
    support / both directed confidences / lift, top-k by lift. The
    recommendation-mining family next to the co-occurrence graph ops.

    Scale shape: pair counts come from the same vectorized basket pair
    emit as cooccurrence_edges, reduced with a bucket-mode grouped count
    (pair keys ≈ rows); the min-support filter prunes BEFORE the joins,
    so only surviving pairs join against the item-support table (two hash
    joins on a/b — item supports are never broadcast: the item space
    grows with the catalog). All ratios are single divisions of exact
    small-int products, so the rounded values are engine-independent."""
    from .dedup import _distinct_rows_bucketed
    from .relational import (drop_empty_blocks, grouped_agg, hash_join,
                             topk)
    from ..functions.rounding import round_np

    gi, pairs = _basket_items_and_pairs(ds, group_col, item_col,
                                        n_rows=n_rows,
                                        max_group_items=max_group_items)
    n_baskets = _distinct_rows_bucketed(gi.select_columns(["g"]),
                                        ["g"]).count()
    pair_counts = grouped_agg(pairs, ["a", "b"],
                              [("a", "count", "n_ab")], mode="bucket")
    lo = int(min_pair_count)
    pair_counts = pair_counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_ab"], lo)),
        batch_format="pyarrow", zero_copy_batch=True)
    item_counts = grouped_agg(gi, ["i"], [("i", "count", "n_i")],
                              mode="bucket")
    # both sides come through bucket-mode (shuffle groupby) exchanges —
    # empty-schema blocks crash Dataset.join (Ray 2.49)
    pair_counts = drop_empty_blocks(pair_counts)
    item_counts = drop_empty_blocks(item_counts).materialize()

    ia = item_counts.map_batches(
        lambda t: pa.table({"a": t["i"], "n_a": t["n_i"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    ib = item_counts.map_batches(
        lambda t: pa.table({"b": t["i"], "n_b": t["n_i"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(pair_counts, ia, on=["a"])
    j = hash_join(drop_empty_blocks(j), ib, on=["b"])

    def metrics(t: pa.Table) -> pa.Table:
        n_ab = t["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = t["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        nn = float(n_baskets)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "n_ab": pc.cast(t["n_ab"], pa.int64()),
            "support": pa.array(round_np(n_ab / nn, ndigits)),
            "conf_a_b": pa.array(round_np(n_ab / n_a, ndigits)),
            "conf_b_a": pa.array(round_np(n_ab / n_b, ndigits)),
            "lift": pa.array(round_np(n_ab * nn / (n_a * n_b), ndigits)),
        })

    scored = j.map_batches(metrics, batch_format="pyarrow",
                           zero_copy_batch=True)
    return topk(scored, ["lift", "a", "b"], k,
                descending=[True, False, False])


def triangle_stats(edges: rd.Dataset, a: str = "a", b: str = "b",
                   num_partitions: int | None = None,
                   ndigits: int = 6) -> pa.Table:
    """Exact triangle census of an undirected simple graph → one row
    (n_triangles, n_wedges, global_clustering = 3T/W).

    Input edges must be canonical (a < b, distinct) — cooccurrence_edges
    emits exactly that. The id-ordered orientation makes each triangle
    {x<y<z} count ONCE: wedge join (x,y)⋈(y,z) on the shared middle
    vertex, then a semi-join against the edge set on (x,z). Two hash
    exchanges total; the join fan-out is Σ deg_lo·deg_hi per vertex — the
    standard oriented-wedge bound (far below Σ deg² on skewed graphs).
    Wedge count Σ C(deg, 2) comes from the SAME degree exchange that
    pagerank uses; only O(1) scalars reach the driver."""
    from .relational import drop_empty_blocks, grouped_agg, hash_join

    e = edges.map_batches(
        lambda t: pa.table({"a": pc.cast(t[a], pa.int64()),
                            "b": pc.cast(t[b], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_edges = e.count()
    empty = pa.table({"n_triangles": pa.array([0], pa.int64()),
                      "n_wedges": pa.array([0], pa.int64()),
                      "global_clustering": pa.array([float("nan")])})
    if n_edges == 0:
        return empty
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(cpus, n_edges // 250_000 + 1))

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False)]), pa.int64()),
            "__c": pa.array(np.ones(2 * t.num_rows, np.int64))})

    deg = drop_empty_blocks(grouped_agg(
        e.map_batches(endpoints, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["node"], [("__c", "sum", "deg")], mode="bucket"))
    n_wedges = int(deg.map_batches(
        lambda t: pa.table({"w": pa.array([int(
            (lambda d: (d * (d - 1) // 2).sum())(
                t["deg"].to_numpy(zero_copy_only=False).astype(np.int64))
        )], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).sum("w") or 0)

    # wedges x<y<z: (x,y) ⋈ (y,z) on the middle vertex y
    left = e.map_batches(lambda t: pa.table({"x": t["a"], "y": t["b"]}),
                         batch_format="pyarrow", zero_copy_batch=True)
    right = e.map_batches(lambda t: pa.table({"y": t["a"], "z": t["b"]}),
                          batch_format="pyarrow", zero_copy_batch=True)
    wedges = hash_join(left, right, on=["y"],
                       num_partitions=num_partitions).map_batches(
        lambda t: pa.table({"a": t["x"], "b": t["z"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    closed = hash_join(wedges, e.map_batches(
        lambda t: t.append_column("__e", pa.array(
            np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow", zero_copy_batch=True),
        on=["a", "b"], num_partitions=num_partitions)
    n_tri = int(closed.count())
    # half-away-from-zero to match DuckDB ROUND (functions/rounding.py)
    from ..functions.rounding import round_np
    gc = (float(round_np(np.array([3.0 * n_tri / n_wedges]), ndigits)[0])
          if n_wedges else float("nan"))
    return pa.table({"n_triangles": pa.array([n_tri], pa.int64()),
                     "n_wedges": pa.array([n_wedges], pa.int64()),
                     "global_clustering": pa.array([gc], pa.float64())})


def bfs_hops(edges: rd.Dataset, seeds: list[int], max_hops: int,
             a: str = "a", b: str = "b", directed: bool = False,
             num_partitions: int | None = None) -> rd.Dataset:
    """Multi-source BFS → (node, hops): the minimum hop count from any
    seed, up to ``max_hops`` (unreached nodes are absent). The reach /
    influence-radius query over the co-occurrence graph.

    Frontier iteration, materialized per round (the components-loop
    lesson): each round is one hash join frontier⋈edges + one bucketed
    distinct of the neighbor set + one left-outer join against the
    settled table to drop already-labeled nodes. Only (node, hop) rows
    ever move; driver state is O(1) counters. Frontiers shrink as the
    graph saturates — the loop exits early when one empties."""
    from .dedup import _distinct_rows_bucketed
    from .relational import drop_empty_blocks, hash_join

    e = edges.map_batches(
        lambda t: pa.table({"src": pc.cast(t[a], pa.int64()),
                            "dst": pc.cast(t[b], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    if not directed:
        e = e.map_batches(
            lambda t: pa.table({
                "src": pa.array(np.concatenate([
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False)]), pa.int64()),
                "dst": pa.array(np.concatenate([
                    t["dst"].to_numpy(zero_copy_only=False),
                    t["src"].to_numpy(zero_copy_only=False)]), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
    e = e.materialize()
    n_edges = e.count()
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(cpus, n_edges // 250_000 + 1))

    settled = rd.from_arrow(pa.table({
        "node": pa.array(sorted(set(int(s) for s in seeds)), pa.int64()),
        "hops": pa.array([0] * len(set(seeds)), pa.int64())})).materialize()
    frontier = settled
    for hop in range(1, max_hops + 1):
        nbrs = hash_join(
            frontier.map_batches(lambda t: pa.table({"src": t["node"]}),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True),
            e, on=["src"], num_partitions=num_partitions).map_batches(
            lambda t: pa.table({"node": t["dst"]}),
            batch_format="pyarrow", zero_copy_batch=True)
        cand = _distinct_rows_bucketed(nbrs, ["node"])
        fresh = hash_join(
            drop_empty_blocks(cand),
            settled.map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "__s": pa.array(np.ones(t.num_rows, np.int8))}),
                batch_format="pyarrow", zero_copy_batch=True),
            on=["node"], join_type="left_outer",
            num_partitions=num_partitions)
        frontier = fresh.map_batches(
            lambda t, h=hop: pa.table({
                "node": pc.cast(t["node"], pa.int64()),
                "hops": pa.array(np.full(t.num_rows, h, np.int64))}
            ).filter(pc.is_null(t["__s"])),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        if frontier.count() == 0:
            break
        settled = settled.union(frontier).materialize()
    return settled


def node_degrees(edges: rd.Dataset, a: str = "a", b: str = "b") -> rd.Dataset:
    """Per-node degree of a canonical undirected edge set (a < b,
    distinct): one bucket-mode grouped count over the unioned endpoints —
    node space grows with the graph, so the exchange is hash-bucketed,
    never a per-node Ray group."""
    from .relational import grouped_agg

    left = edges.map_batches(
        lambda t: pa.table({"v": pc.cast(t[a], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    right = edges.map_batches(
        lambda t: pa.table({"v": pc.cast(t[b], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(left.union(right), ["v"], [("v", "count", "d")],
                       mode="bucket")


def degree_distribution(edges: rd.Dataset, a: str = "a",
                        b: str = "b") -> rd.Dataset:
    """Degree distribution (degree → node count) of an undirected graph:
    the first structural profile of any co-occurrence / link graph, and
    the input to heavy-tail diagnostics. Second reduce is over degree
    VALUES (bounded by max degree ≪ nodes) — driver-combined."""
    from .relational import grouped_agg

    deg = node_degrees(edges, a, b)
    return grouped_agg(deg, ["d"], [("d", "count", "n_nodes")],
                       mode="driver")


def hill_tail_alpha(edges: rd.Dataset, dmin: int, a: str = "a",
                    b: str = "b", ndigits: int = 6) -> pa.Table:
    """Hill estimator of the degree-distribution tail exponent
    (α = 1 + n / Σ ln(d / (dmin − 0.5)), the discrete power-law MLE shape
    of Clauset-Shalizi-Newman 2009) over nodes with degree ≥ dmin: is the
    graph scale-free enough that hot-key salting / hub handling matters?
    One bounded (degree, count) table reaches the driver; the estimator
    folds it in O(distinct degrees)."""
    from ..functions.rounding import round_scalar

    dist = pa.concat_tables([pa.table(x) for x in degree_distribution(
        edges, a, b).iter_batches(batch_format="pyarrow")])
    d = dist["d"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = dist["n_nodes"].to_numpy(zero_copy_only=False).astype(np.float64)
    tail = d >= dmin
    n_tail = float(n[tail].sum())
    if n_tail == 0:
        return pa.table({"n_tail": pa.array([0], pa.int64()),
                         "alpha": pa.array([None], pa.float64())})
    s = float((n[tail] * np.log(d[tail] / (dmin - 0.5))).sum())
    return pa.table({
        "n_tail": pa.array([int(n_tail)], pa.int64()),
        "alpha": pa.array([round_scalar(1.0 + n_tail / s, ndigits)],
                          pa.float64()),
    })
