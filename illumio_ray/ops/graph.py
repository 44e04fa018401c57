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

    # node universe + out-degrees (once)
    nodes = _distinct_rows_bucketed(
        e.map_batches(lambda t: pa.table(
            {"node": pa.array(np.concatenate([
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False)]), pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["node"]).materialize()
    n_nodes = nodes.count()
    outdeg = drop_empty_blocks(grouped_agg(
        e.select_columns(["src"]), ["src"], [("src", "count", "outdeg")],
        mode="bucket"))

    if mode == "auto":
        mode = "broadcast" if n_nodes <= broadcast_limit else "shuffle"
    if mode == "broadcast":
        return _pagerank_broadcast(e, nodes, outdeg, n_nodes, damping,
                                   iters, normalize)
    if mode != "shuffle":
        raise ValueError(f"unknown pagerank mode: {mode}")

    # per-edge weight 1/outdeg(src), fixed across rounds
    weighted = hash_join(e, outdeg, on=["src"],
                         num_partitions=num_partitions).map_batches(
        lambda t: pa.table({
            "src": t["src"], "dst": t["dst"],
            "w": pc.divide(pa.array(np.ones(t.num_rows)),
                           pc.cast(t["outdeg"], pa.float64()))}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    # dangling flag rides the rank table: nodes LEFT JOIN outdeg once
    ranks = hash_join(nodes, outdeg.map_batches(
        lambda t: t.rename_columns(["node", "outdeg"]),
        batch_format="pyarrow"), on=["node"], join_type="left_outer",
        num_partitions=num_partitions).map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            "dangling": pc.cast(pc.is_null(t["outdeg"]), pa.float64())}),
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


def _pagerank_broadcast(e: rd.Dataset, nodes: rd.Dataset,
                        outdeg: rd.Dataset, n_nodes: int, damping: float,
                        iters: int, normalize: bool) -> rd.Dataset:
    """Broadcast-mode body: rank/out-degree vectors as driver numpy
    arrays; per round one broadcast inner join over the (materialized,
    deduplicated) edges + one bucketed grouped sum. Identical floats to
    the shuffle path — contributions reduce through the same Arrow
    group_by sum kernels."""
    from .relational import broadcast_join, grouped_agg

    node_arr = pa.concat_tables(
        nodes.iter_batches(batch_format="pyarrow",
                           batch_size=None))["node"].combine_chunks()
    deg_t = pa.concat_tables(
        outdeg.iter_batches(batch_format="pyarrow", batch_size=None))
    d = np.zeros(n_nodes, np.float64)
    if deg_t.num_rows:
        idx = pc.index_in(deg_t["src"], value_set=node_arr)
        d[idx.to_numpy(zero_copy_only=False)] = \
            deg_t["outdeg"].to_numpy(zero_copy_only=False)
    has_out = d > 0
    base = (1.0 - damping) / n_nodes
    r = np.full(n_nodes, 1.0 / n_nodes, np.float64)
    for _ in range(iters):
        w = np.zeros(n_nodes, np.float64)
        np.divide(r, d, out=w, where=has_out)
        w_tbl = pa.table({"src": node_arr,
                          "w": pa.array(w)}).filter(pa.array(has_out))
        contrib = grouped_agg(
            broadcast_join(e, w_tbl, on=["src"], join_type="inner"),
            ["dst"], [("w", "sum", "csum")], mode="bucket")
        c_t = pa.concat_tables(
            contrib.iter_batches(batch_format="pyarrow", batch_size=None))
        c = np.zeros(n_nodes, np.float64)
        if c_t.num_rows:
            cidx = pc.index_in(c_t["dst"], value_set=node_arr)
            c[cidx.to_numpy(zero_copy_only=False)] = \
                c_t["csum"].to_numpy(zero_copy_only=False)
        d_mass = float(r[~has_out].sum())
        r = base + damping * (c + d_mass / n_nodes)
    if normalize:
        r = r * n_nodes
    return rd.from_arrow(pa.table({"node": node_arr, "rank": pa.array(r)}))
