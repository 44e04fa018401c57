"""Distributed k-means / SemDeDup / PCA (ops/clustering.py)."""

import collections

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from illumio_ray.ops import clustering as cl


@pytest.fixture(scope="module")
def blobs():
    """3 well-separated gaussian blobs + 5 planted near-dups of rows 0-4."""
    rng = np.random.default_rng(3)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], float)
    x = np.concatenate([c + rng.normal(0, .3, (50, 4)) for c in centers])
    x = np.concatenate([x, x[:5] + 1e-4])
    df = pd.DataFrame({"vec_id": np.arange(len(x)),
                       "embedding": list(x.astype(np.float32))})
    return x, rd.from_pandas(df).repartition(4)


def test_kmeans_recovers_blobs_and_sse_monotone(blobs):
    x, ds = blobs
    cents, info = cl.kmeans_fit(ds, 3, iters=10, sample_rows=200)
    # SSE non-increasing across Lloyd's iterations
    assert all(a >= b - 1e-6 for a, b in zip(info["sse"], info["sse"][1:]))
    assert sorted(info["counts"].tolist()) == [50, 50, 55]
    asg = (cl.kmeans_assign(ds, cents).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    lab = asg.cluster.to_numpy()[:150]
    true = np.repeat([0, 1, 2], 50)
    purity = sum(max(collections.Counter(lab[true == t].tolist()).values())
                 for t in [0, 1, 2]) / 150
    assert purity == 1.0


def test_kmeans_deterministic(blobs):
    _, ds = blobs
    c1, _ = cl.kmeans_fit(ds, 3, iters=5, sample_rows=200)
    c2, _ = cl.kmeans_fit(ds, 3, iters=5, sample_rows=200)
    np.testing.assert_array_equal(c1, c2)


def test_kmeans_reseeds_empty_clusters(blobs):
    # k far above the natural cluster count → some clusters can empty out;
    # fit must still return k finite centroids and assign every row
    _, ds = blobs
    cents, info = cl.kmeans_fit(ds, 20, iters=4, sample_rows=200)
    assert cents.shape == (20, 4) and np.isfinite(cents).all()
    assert info["counts"].sum() == 155


def test_semdedup_drops_planted_dups(blobs):
    x, ds = blobs
    kept = cl.semdedup(ds, k=3, threshold=0.999999).to_pandas()
    dropped = sorted(set(range(len(x))) - set(kept.vec_id))
    assert dropped == [150, 151, 152, 153, 154]  # larger id of each pair


def test_pca_matches_numpy_eigh(blobs):
    x, ds = blobs
    mean, comps = cl.pca_fit(ds, 2)
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-8)
    xc = x - x.mean(0)
    _, v = np.linalg.eigh(np.cov(xc.T, bias=True))
    ref = v[:, ::-1][:, :2].T
    for i in range(2):  # sign-invariant compare
        assert min(np.abs(ref[i] - comps[i]).max(),
                   np.abs(ref[i] + comps[i]).max()) < 1e-6
    proj = (cl.pca_project(ds, mean, comps).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    got = np.stack([np.asarray(p) for p in proj["pca"]])
    want = xc @ comps.T
    # float32 ingest: projections match at float32 precision
    assert np.abs(got - want).max() < 1e-4


def test_logreg_hashed_converges_and_is_partition_invariant():
    rng = np.random.default_rng(7)
    pos = [f"good{i}" for i in range(30)]
    neg = [f"bad{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(pos if i % 2 else neg, 12)), i % 2)
            for i in range(300)]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    ds = rd.from_pandas(df).repartition(4)
    w, b, hist = cl.logreg_fit_hashed(ds, "text", "label",
                                      dim=1 << 12, epochs=6, lr=2.0)
    losses = [l for l, _ in hist]
    assert losses == sorted(losses, reverse=True)  # monotone descent
    assert hist[-1][1] == 1.0  # separable vocabularies → perfect train acc
    scored = cl.logreg_score_hashed(ds, w, b).to_pandas()
    assert (((scored["prob"] >= 0.5).astype(int)
             == scored["label"]).mean()) == 1.0
    # full-batch GD: identical weights under any partitioning
    w2, _, _ = cl.logreg_fit_hashed(rd.from_pandas(df).repartition(8),
                                    "text", "label",
                                    dim=1 << 12, epochs=6, lr=2.0)
    assert np.abs(w - w2).max() < 1e-12


def test_label_centroids_match_numpy_groupby():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from illumio_ray.ops import clustering

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 5))
    labs = rng.integers(0, 4, 60)
    df = pd.DataFrame({"label": labs,
                       "embedding": [v.tolist() for v in vecs]})
    got = clustering.label_centroids(rd.from_pandas(df).repartition(4))
    assert got["label"].to_pylist() == sorted(set(labs.tolist()))
    for i, lab in enumerate(got["label"].to_pylist()):
        want = vecs[labs == lab].mean(axis=0)
        np.testing.assert_allclose(
            np.asarray(got["centroid"][i].as_py()), want, atol=1e-12)
        assert got["n"][i].as_py() == int((labs == lab).sum())


def test_class_compactness_tight_vs_noisy():
    import pyarrow as pa

    from illumio_ray.ops import clustering

    rng = np.random.default_rng(19)
    d = 16
    tight = rng.normal(0, 1, d)
    rows = []
    for _ in range(60):  # label 0: tiny perturbations of one direction
        rows.append((0, (tight + rng.normal(0, 0.01, d)).astype(np.float32)))
    for _ in range(60):  # label 1: isotropic noise
        rows.append((1, rng.normal(0, 1, d).astype(np.float32)))
    t = pa.table({
        "label": pa.array([r[0] for r in rows], pa.int32()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32())),
    })
    out = clustering.class_compactness(rd.from_arrow(t)).to_pandas()
    got = out.set_index("label")
    assert got.loc[0, "mean_cos"] > 0.99
    assert got.loc[1, "mean_cos"] < 0.6
    assert got.loc[0, "n"] == 60 and got.loc[1, "n"] == 60
