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
