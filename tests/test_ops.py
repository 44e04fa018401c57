import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from illumio_ray.ops import dedup, multimodal, relational as rel, similarity


def test_exact_dedup_keeps_min_id():
    df = pd.DataFrame({
        "doc_id": [5, 1, 3, 2, 4],
        "text": ["aa", "bb", "aa", "cc", "bb"],
    })
    out = dedup.exact_dedup(rd.from_pandas(df), "text", "doc_id").to_pandas()
    assert sorted(out.doc_id) == [1, 2, 3]  # min id per distinct text


def test_near_dup_finds_exact_duplicate():
    texts = [f"unique words {i} " + " ".join(f"w{i}{j}" for j in range(20))
             for i in range(30)]
    texts.append(texts[0])  # exact dup of doc 0 → jaccard 1.0
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = pa.Table.from_pandas(df)
    pairs = dedup.near_dup_pairs(rd.from_pandas(df), docs, "doc_id", "text",
                                 threshold=0.9).to_pandas()
    assert len(pairs) == 1
    assert (pairs.iloc[0].id_a, pairs.iloc[0].id_b) == (0, 30)
    assert pairs.iloc[0].jaccard == 1.0


def test_simhash_groups_exact_dup():
    texts = ["alpha beta gamma delta", "epsilon zeta eta theta",
             "alpha beta gamma delta"]
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    out = dedup.simhash_dup_groups(rd.from_pandas(df), "doc_id", "text").to_pandas()
    assert sorted(out.doc_id) == [1, 3]


def test_lsh_topk_recall_on_clustered_data():
    rng = np.random.default_rng(3)
    q = rng.standard_normal(32)
    near = q[None, :] + 0.1 * rng.standard_normal((10, 32))   # true neighbors
    far = rng.standard_normal((200, 32)) * 5
    vecs = np.vstack([near, far])
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = rd.from_pandas(df)
    exact = set(similarity.brute_force_topk(ds, q, 10).to_pandas().vec_id)
    approx = set(similarity.lsh_topk(ds, q, 10).to_pandas().vec_id)
    assert exact == set(range(10))  # sanity: brute force finds the cluster
    recall = len(exact & approx) / 10
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_multimodal_decode_stub_deterministic():
    df = pd.DataFrame({"url": ["a", "b"], "payload": [b"\x01\x02\x03", b"\xff" * 10]})
    out1 = multimodal.decode_binary_metadata(rd.from_pandas(df), "payload").to_pandas()
    out2 = multimodal.decode_binary_metadata(rd.from_pandas(df), "payload").to_pandas()
    pd.testing.assert_frame_equal(out1.sort_values("url").reset_index(drop=True),
                                  out2.sort_values("url").reset_index(drop=True))
    assert list(out1.sort_values("url").n_bytes) == [3, 10]
    assert (out1.width > 0).all() and (out1.height > 0).all()
    assert "payload" not in out1.columns


def test_multimodal_real_decode_raises():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeImageStub(real=True)


def test_hamming_dup_pairs_matches_brute_force():
    from illumio_ray.ops import dedup
    rng = np.random.default_rng(11)
    base = rng.integers(0, 2**63, 40, dtype=np.int64)
    sigs = list(base)
    for i in range(10):  # planted near-dups at 1-3 flipped bits
        s = np.uint64(base[i])
        for b in rng.choice(64, 1 + i % 3, replace=False):
            s ^= np.uint64(1) << np.uint64(b)
        sigs.append(np.int64(s.astype(np.int64)))
    df = pd.DataFrame({"vid": range(len(sigs)),
                       "sig": np.array(sigs, np.int64)})
    got = dedup.hamming_dup_pairs(rd.from_pandas(df).repartition(3),
                                  "vid", "sig", max_hamming=3).to_pandas()
    got_set = set(zip(got.id_a, got.id_b, got.hamming))
    s = [int(x) for x in df.sig.to_numpy().astype(np.uint64)]
    want = {(i, j, bin(s[i] ^ s[j]).count("1"))
            for i in range(len(s)) for j in range(i + 1, len(s))
            if bin(s[i] ^ s[j]).count("1") <= 3}
    assert got_set == want


def test_png_codec_roundtrip_and_filters():
    from illumio_ray.ops import codecs
    rng = np.random.default_rng(83)
    for shape in [(17, 23), (11, 9, 2), (9, 13, 3), (5, 7, 4)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        b = codecs.png_decode(codecs.png_encode(a))
        assert b.shape == a.shape and (b == a).all()
    # re-encoded identical content hashes equal (perceptual, not byte)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    assert codecs.ahash64(img) == \
        codecs.ahash64(codecs.png_decode(codecs.png_encode(img)))
    # constant image resizes to itself
    flat = np.full((16, 16), 200, np.uint8)
    assert (codecs.resize_bilinear(flat, 8, 8) == 200).all()


def test_wav_codec_roundtrip():
    from illumio_ray.ops import codecs
    t = (np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
         * 12000).astype(np.int16)
    s, rate, ch = codecs.wav_decode(codecs.wav_encode(t, 8000, 1))
    assert rate == 8000 and ch == 1 and (s == t).all()
    st = np.stack([t, -t], axis=1)
    s2, _, ch2 = codecs.wav_decode(codecs.wav_encode(st, 8000, 2))
    assert ch2 == 2 and (s2 == st).all()


def test_multimodal_real_png_stages_end_to_end():
    from illumio_ray.ops import codecs
    ids = np.array([1, 2, 3, 1])  # duplicate content at ids 0 and 3
    payloads = multimodal.synth_png_payloads(ids)
    df = pd.DataFrame({"doc_id": [10, 11, 12, 13],
                       "payload": payloads})
    meta = (multimodal.decode_png_metadata(rd.from_pandas(df))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # dims match the synth formula and the perceptual hash pairs dups
    for i, docid in enumerate([10, 11, 12, 13]):
        img = codecs.png_decode(payloads[i])
        assert meta.loc[i, "height"] == img.shape[0]
        assert meta.loc[i, "width"] == img.shape[1]
        assert meta.loc[i, "channels"] == 3
    assert meta.loc[0, "ahash"] == meta.loc[3, "ahash"]
    assert meta.loc[0, "ahash"] != meta.loc[1, "ahash"]

    resized = (multimodal.resize_png(rd.from_pandas(df), max_w=16,
                                     max_h=16)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i in range(4):
        out = codecs.png_decode(resized.loc[i, "payload"])  # valid PNG out
        assert out.shape[0] == resized.loc[i, "out_height"]
        assert out.shape[1] == resized.loc[i, "out_width"]
        assert max(out.shape[:2]) <= 16


def test_gif_codec_roundtrip():
    from illumio_ray.ops import codecs
    rng = np.random.default_rng(91)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [rng.integers(0, 16, (13, 21), dtype=np.uint8)
              for _ in range(5)]
    f2, pals, delays = codecs.gif_decode(codecs.gif_encode(frames, pal,
                                                           delay_cs=7))
    assert len(f2) == 5 and delays == [7] * 5
    assert all((p[:16] == pal).all() for p in pals)
    for a, b in zip(frames, f2):
        assert (a == b).all()
    # big frame exercises LZW dict growth + the clear-reset path
    big = rng.integers(0, 16, (80, 120), dtype=np.uint8)
    g2, _, _ = codecs.gif_decode(codecs.gif_encode([big], pal))
    assert (g2[0] == big).all()


def test_gif_decode_partial_frames_composite_on_previous():
    """Delta-encoded GIFs (partial later frames, do-not-dispose)
    composite onto the prior canvas — hand-built, since gif_encode emits
    full frames."""
    import struct

    from illumio_ray.ops import codecs
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    base = np.full((6, 8), 1, np.uint8)
    full = codecs.gif_encode([base], pal, delay_cs=3)
    # splice in a second, 2x2 partial frame at (x=5, y=2) of color 2
    patch_indices = np.full((2, 2), 2, np.uint8)
    lzw = codecs._lzw_encode(patch_indices.reshape(-1), 2)
    block = (b"\x21\xf9\x04\x00" + struct.pack("<H", 9) + b"\x00\x00"
             + b"\x2c" + struct.pack("<HHHHB", 5, 2, 2, 2, 0)
             + bytes([2]) + codecs._sub_blocks(lzw))
    spliced = full[:-1] + block + b"\x3b"
    frames, pals, delays = codecs.gif_decode(spliced)
    assert len(frames) == 2 and delays == [3, 9]
    want = base.copy()
    want[2:4, 5:7] = 2
    assert (frames[0] == base).all()
    assert (frames[1] == want).all()  # patch over the PREVIOUS canvas


def test_multimodal_real_gif_frame_sampling():
    from illumio_ray.ops import codecs
    ids = np.array([2, 7])
    payloads = multimodal.synth_gif_payloads(ids)
    df = pd.DataFrame({"doc_id": [20, 21], "payload": payloads})
    out = (multimodal.gif_frame_sample(rd.from_pandas(df), every_n=2,
                                       max_frames=4)
           .to_pandas().sort_values(["doc_id", "frame_no"])
           .reset_index(drop=True))
    for docid, pid in [(20, 2), (21, 7)]:
        frames, pals, delays = codecs.gif_decode(
            payloads[0] if pid == 2 else payloads[1])
        rows = out[out.doc_id == docid]
        expect_idx = list(range(0, len(frames), 2))[:4]
        assert rows.frame_no.tolist() == expect_idx
        assert (rows.n_frames == len(frames)).all()
        assert (rows.delay_cs == delays[0]).all()
        for _, r in rows.iterrows():
            rgb = pals[int(r.frame_no)][frames[int(r.frame_no)]]
            assert r.frame_ahash == np.uint64(
                codecs.ahash64(rgb)).astype(np.int64)


def test_multimodal_real_wav_stage_energy_and_duration():
    ids = np.array([0, 3])
    payloads = multimodal.synth_wav_payloads(ids, rate=8000)
    silence = multimodal.synth_wav_payloads(np.array([0]), rate=8000)[0]
    import illumio_ray.ops.codecs as codecs
    zero = codecs.wav_encode(np.zeros(4000, np.int16), 8000, 1)
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "payload": [payloads[0], payloads[1], zero]})
    out = (multimodal.wav_features(rd.from_pandas(df), n_windows=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # duration from the REAL header: id 0 → 0.25 s, id 3 → 0.625 s
    assert np.isclose(out.loc[0, "duration_sec"], 0.25)
    assert np.isclose(out.loc[1, "duration_sec"], 0.625)
    assert np.isclose(out.loc[2, "duration_sec"], 0.5)
    # a full-scale-ish tone has RMS ~ amplitude/sqrt(2); silence is 0
    tone_rms = 12000 / 32768.0 / np.sqrt(2)
    assert np.allclose(np.asarray(out.loc[0, "frame_energy"]),
                       tone_rms, rtol=0.05)
    assert np.allclose(np.asarray(out.loc[2, "frame_energy"]), 0.0)


def test_multimodal_real_decode_branch_with_fake_pil(monkeypatch):
    """The real=True branch is wired (not a stub raise): inject a fake PIL
    and check the decoded dimensions flow through the columnar plumbing."""
    class FakeImg:
        def __init__(self, buf):
            self.size = (len(buf), len(buf) * 2)  # "dimensions" from payload

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class FakeImage:
        @staticmethod
        def open(fp):
            return FakeImg(fp.read())

    monkeypatch.setattr(multimodal, "_resolve_pil", lambda: FakeImage)
    stage = multimodal.DecodeImageStub(binary_col="payload", real=True)
    out = stage(pa.table({"url": ["a", "b"],
                          "payload": [b"\x01\x02\x03", b"\xff" * 10]}))
    assert out["width"].to_pylist() == [3, 10]
    assert out["height"].to_pylist() == [6, 20]
    assert out["n_bytes"].to_pylist() == [3, 10]
    assert "payload" not in out.column_names


def _clustered_embeddings(n_clusters=40, per_cluster=3, dim=16, seed=11):
    """Clusters of near-identical vectors (cosine ≥ ~0.99 within a
    cluster) plus noise vectors — every within-cluster pair is a true
    near-dup."""
    rng = np.random.default_rng(seed)
    vecs, ids = [], []
    vid = 0
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + 0.01 * rng.standard_normal(dim)
            vecs.append(v.astype(np.float32))
            ids.append(vid)
            vid += 1
    for _ in range(n_clusters * 2):  # noise
        vecs.append((rng.standard_normal(dim) * 3).astype(np.float32))
        ids.append(vid)
        vid += 1
    return pd.DataFrame({"vec_id": ids, "embedding": vecs})


def _brute_force_pairs(df, threshold):
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sims = m @ m.T
    ids = df["vec_id"].to_numpy()
    ai, bi = np.nonzero(sims >= threshold)
    keep = ids[ai] < ids[bi]
    return set(zip(ids[ai][keep], ids[bi][keep]))


def test_exact_cosine_pairs_matches_brute_force_across_blocks():
    """Distributed block-pair exact path == driver brute force, on a corpus
    split over many blocks (no driver-side matrix materialization — each
    task only pulls its two chunks)."""
    df = _clustered_embeddings()
    ds = rd.from_pandas(df).repartition(7)  # force multi-block grouping
    got = dedup.exact_cosine_pairs(ds, "vec_id", "embedding",
                                   threshold=0.95, max_groups=4).to_pandas()
    want = _brute_force_pairs(df, 0.95)
    assert set(zip(got.id_a, got.id_b)) == want
    assert len(want) >= 40  # sanity: the clusters produced real pairs


def test_lsh_cosine_pairs_matches_exact_at_high_threshold():
    """Scale path (bucketed candidates → in-bucket verify) finds the same
    pairs as the exact path at a true near-dup threshold; no corpus
    broadcast, no all-pairs scan."""
    df = _clustered_embeddings()
    ds = rd.from_pandas(df)
    got = dedup.lsh_cosine_pairs(ds, "vec_id", "embedding", threshold=0.95,
                                 n_bits=8, n_tables=6).to_pandas()
    want = _brute_force_pairs(df, 0.95)
    got_pairs = set(zip(got.id_a, got.id_b))
    assert got_pairs <= want  # verify step: no false positives, ever
    recall = len(got_pairs & want) / len(want)
    assert recall == 1.0, f"LSH near-dup recall {recall} (seeded, deterministic)"


def test_range_join_count_matches_pandas_cross_check():
    """Bucketed band join == brute-force |dt| <= window cross check,
    including matches that straddle bucket boundaries."""
    rng = np.random.default_rng(5)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    l_ts = base + (rng.integers(0, 3600, 80) * 1_000_000).astype("timedelta64[us]")
    r_ts = base + (rng.integers(0, 3600, 200) * 1_000_000).astype("timedelta64[us]")
    left = pd.DataFrame({"eid": np.arange(80), "ts": l_ts})
    right = pd.DataFrame({"ts": r_ts})
    got = rel.range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                               "ts", "ts", window_sec=120,
                               key_col="eid").to_pandas()
    dt = np.abs(l_ts[:, None] - r_ts[None, :]) <= np.timedelta64(120, "s")
    want = {i: int(n) for i, n in enumerate(dt.sum(axis=1)) if n > 0}
    assert dict(zip(got.eid, got.n_nearby)) == want


def test_misra_gries_superset_guarantee_and_exact_recount():
    """A skewed stream through tiny per-block sketches: every value with
    true count >= phi*n must survive, and the recount output is exact."""
    from illumio_ray.functions.sketches import MisraGries, heavy_hitters

    rng = np.random.default_rng(9)
    # zipf-ish: values 0..4 heavy, 5..500 light
    heavy = np.repeat(np.arange(5), 400)
    light = rng.integers(5, 500, 2000)
    arr = np.concatenate([heavy, light])
    rng.shuffle(arr)
    # pure-sketch bound: merge 10 small-k partials
    acc = MisraGries(64)
    for chunk in np.array_split(arr, 10):
        acc.merge(MisraGries(64).add_array(chunk))
    for v in range(5):
        assert v in acc.counts  # freq 400 >> n/(k+1) ≈ 62
    # end-to-end exact recount
    ds = rd.from_pandas(pd.DataFrame({"k": arr})).repartition(8)
    phi = 0.05  # threshold 200 < 400
    got = heavy_hitters(ds, "k", phi=phi, total=len(arr),
                        out_col="n").to_pandas()
    counts = pd.Series(arr).value_counts()
    want = counts[counts >= phi * len(arr)]
    assert dict(zip(got.k, got.n)) == want.to_dict()


def test_tdigest_accuracy_and_merge():
    from illumio_ray.functions.sketches import TDigest

    rng = np.random.default_rng(21)
    data = rng.lognormal(0, 1, 50_000)
    # merged per-block digests == the distributed shape
    acc = TDigest()
    for chunk in np.array_split(data, 16):
        acc.merge(TDigest().add_array(chunk))
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(data, q)
        approx = acc.quantile(q)
        assert abs(approx - exact) / exact < 0.05, (q, approx, exact)


def test_tdigest_distributed_matches_local():
    from illumio_ray.functions.sketches import TDigest, tdigest_quantiles

    rng = np.random.default_rng(4)
    vals = rng.normal(100, 15, 20_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = tdigest_quantiles(ds, "v", [0.5, 0.9])
    for q in (0.5, 0.9):
        exact = np.quantile(vals, q)
        assert abs(got[q] - exact) / exact < 0.02


def test_bloom_filter_no_false_negatives_and_low_fpr():
    from illumio_ray.functions.sketches import BloomFilter

    rng = np.random.default_rng(2)
    members = rng.integers(0, 1 << 40, 5_000)
    others = rng.integers(1 << 41, 1 << 42, 20_000)
    bf = BloomFilter(len(members), fpp=0.01).add_array(members)
    assert bf.contains_array(members).all()  # zero false negatives, always
    fpr = bf.contains_array(others).mean()
    assert fpr < 0.03, fpr


def test_bloom_anti_join_equals_plain_anti_join():
    df = pd.DataFrame({"k": np.arange(2_000)})
    keys = np.arange(0, 2_000, 3)
    ds = rd.from_pandas(df)
    plain = set(rel.semi_anti_join(ds, keys, "k", anti=True)
                .to_pandas()["k"])
    bloom = set(rel.bloom_semi_anti_join(ds, keys, "k", anti=True)
                .to_pandas()["k"])
    assert bloom == plain
    semi = set(rel.bloom_semi_anti_join(ds, keys, "k", anti=False)
               .to_pandas()["k"])
    assert semi == set(keys.tolist())


def test_deterministic_sample_per_group_stable_and_sized():
    import hashlib

    df = pd.DataFrame({"g": np.repeat(["a", "b", "c"], 50),
                       "id": np.arange(150)})
    ds = rd.from_pandas(df)
    s1 = rel.deterministic_sample_per_group(ds, ["g"], "id", 4).to_pandas()
    s2 = rel.deterministic_sample_per_group(ds, ["g"], "id", 4).to_pandas()
    assert sorted(s1["id"]) == sorted(s2["id"])  # reproducible
    assert s1.groupby("g").size().tolist() == [4, 4, 4]
    # matches the md5-rank definition exactly
    want = (df.assign(rk=[hashlib.md5(f"0:{v}".encode()).hexdigest()
                          for v in df["id"]])
              .sort_values("rk").groupby("g").head(4))
    assert sorted(s1["id"]) == sorted(want["id"])


def test_sliding_window_counts_match_brute_force():
    rng = np.random.default_rng(8)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.integers(0, 6 * 3600, 500) * 1_000_000).astype("timedelta64[us]")
    ds = rd.from_pandas(pd.DataFrame({"ts": ts})).repartition(4)
    got = rel.sliding_window_counts(ds, "ts", window_sec=3600,
                                    hop_sec=900).to_pandas()
    # brute force: event in window [w, w+3600) for 4 hop-aligned starts
    us = ts.astype("datetime64[us]").astype(np.int64)
    want: dict[int, int] = {}
    for t in us:
        b = t // 900_000_000
        for i in range(4):
            w = (b - i) * 900_000_000
            want[w] = want.get(w, 0) + 1
    assert dict(zip(got.win_us, got.n_events)) == want


def test_repetition_signals_match_manual():
    from illumio_ray.ops import textops

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a a a", "a b c d", "x x y"]})
    out = textops.add_repetition_signals(rd.from_pandas(df)).to_pandas() \
        .sort_values("doc_id")
    assert out.ttr.tolist() == [0.25, 1.0, round(2 / 3, 6)]
    assert out.top_word_frac.tolist() == [1.0, 0.25, round(2 / 3, 6)]


def test_bucketed_join_matches_pandas_merge(tmp_path):
    """Co-located bucketed join == pandas merge, including keys present on
    only one side and empty buckets."""
    from illumio_ray.ops import bucketing

    rng = np.random.default_rng(13)
    left = pd.DataFrame({"k": rng.integers(0, 50, 300),
                         "a": np.arange(300)})
    right = pd.DataFrame({"k": np.arange(40, 90),  # partial overlap
                          "b": np.arange(50) * 10})
    k = 8
    bucketing.write_bucketed(rd.from_pandas(left), "k", k, tmp_path / "l")
    bucketing.write_bucketed(rd.from_pandas(right), "k", k, tmp_path / "r")
    got = bucketing.bucketed_join(tmp_path / "l", tmp_path / "r",
                                  on=["k"], num_buckets=k).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    assert (got.sort_values(["k", "a"]).reset_index(drop=True)[["k", "a", "b"]]
            .equals(want.sort_values(["k", "a"]).reset_index(drop=True)))


def test_hll_distinct_by_accuracy():
    from illumio_ray.functions.sketches import hll_distinct_by

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 30_000),
        "u": rng.integers(0, 4000, 30_000),
    })
    est = hll_distinct_by(rd.from_pandas(df).repartition(6), "g", "u")
    exact = df.groupby("g")["u"].nunique()
    for g, e in est.items():
        assert abs(e - exact[g]) / exact[g] < 0.05, (g, e, exact[g])


def test_cosine_pair_paths_handle_empty_corpus():
    """Both embedding near-dup paths return an empty, correctly-typed pair
    dataset on an empty corpus (no IndexError from take(1), no np.stack on
    zero rows)."""
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    for fn in (dedup.lsh_cosine_pairs, dedup.exact_cosine_pairs):
        out = fn(empty, "vec_id", "embedding", 0.9)
        assert out.count() == 0
        types = dict(zip(out.schema().names, out.schema().types))
        assert pa.types.is_int64(types["id_a"]), (fn.__name__, types)


def test_minhash_empty_candidates_keep_string_id_dtype():
    """No candidate pairs + string doc ids: the empty frame's id dtype must
    match the input (not hardcoded int64)."""
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(5)],
                       "text": [" ".join(f"w{i}{j}" for j in range(30))
                                for i in range(5)]})
    out = dedup.minhash_lsh_candidates(
        rd.from_pandas(df), "doc_id", "text", n_docs=5)
    assert out.count() == 0
    # schema-level check (Ray's to_pandas drops columns on empty datasets):
    # id columns keep the input's string type, not a hardcoded int64
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert pa.types.is_string(types["id_a"]) or pa.types.is_large_string(types["id_a"])
    assert types["id_a"] == types["id_b"]


def test_topk_matches_pandas():
    df = pd.DataFrame({"k": np.arange(100), "v": np.arange(100)[::-1] % 17})
    got = rel.topk(rd.from_pandas(df), ["v", "k"], 5,
                   descending=[True, False]).to_pandas()
    exp = df.sort_values(["v", "k"], ascending=[False, True]).head(5).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True)[["k", "v"]], exp[["k", "v"]])


def test_grouped_agg_mean_min_max():
    df = pd.DataFrame({"g": ["a", "b", "a", "b", "a"], "x": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = rel.grouped_agg(rd.from_pandas(df), ["g"], [
        ("x", "mean", "avg_x"), ("x", "min", "min_x"),
        ("x", "max", "max_x"), ("x", "count", "n"),
    ]).to_pandas().sort_values("g").reset_index(drop=True)
    assert got.avg_x.tolist() == [3.0, 3.0]
    assert got.min_x.tolist() == [1.0, 2.0]
    assert got.max_x.tolist() == [5.0, 4.0]
    assert got.n.tolist() == [3, 2]


def test_asof_broadcast_join_backward():
    left = pd.DataFrame({"id": [1, 2, 3, 4],
                         "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:10",
                                               "2024-01-01 00:00", "2024-01-01 00:30"])})
    right = pa.Table.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:03", "2024-01-01 00:10",
                              "2024-01-01 00:20"]),
        "v": [10, 20, 30]}))
    out = rel.asof_broadcast_join(rd.from_pandas(left), right, "ts", "ts",
                                  {"prev_v": "v"}).to_pandas().sort_values("id")
    # id=3 at 00:00 precedes all right rows -> null; 00:10 matches equal ts
    assert out.prev_v.tolist()[0] == 10
    assert out.prev_v.tolist()[1] == 20
    assert pd.isna(out.prev_v.tolist()[2])
    assert out.prev_v.tolist()[3] == 30


def test_topk_per_group_matches_pandas():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 5, 200),
                       "x": rng.random(200), "id": np.arange(200)})
    out = rel.topk_per_group(rd.from_pandas(df), ["g"], ["x", "id"], 3,
                             descending=[True, False]).to_pandas()
    expect = (df.sort_values(["x", "id"], ascending=[False, True])
                .groupby("g").head(3))
    assert (out.sort_values(["g", "x"], ascending=[True, False])
               .reset_index(drop=True)[["g", "x", "id"]]
            .equals(expect.sort_values(["g", "x"], ascending=[True, False])
                    .reset_index(drop=True)[["g", "x", "id"]]))


def test_grouped_agg_driver_equals_shuffle():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 7, 500), "v": rng.random(500)})
    specs = [("v", "sum", "s"), ("v", "mean", "m"), ("v", "max", "mx"),
             ("v", "count", "n")]
    a = rel.grouped_agg(rd.from_pandas(df), ["k"], specs, mode="driver").to_pandas()
    b = rel.grouped_agg(rd.from_pandas(df), ["k"], specs, mode="shuffle").to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False,
                                  check_exact=False, rtol=1e-12)


def test_salted_topk_matches_plain():
    rng = np.random.default_rng(9)
    # skewed: 70% of rows in one group
    g = np.where(rng.random(400) < 0.7, 0, rng.integers(1, 6, 400))
    df = pd.DataFrame({"g": g, "x": rng.random(400), "u": [f"u{i}" for i in range(400)]})
    plain = rel.topk_per_group(rd.from_pandas(df), ["g"], ["x", "u"], 3,
                               descending=[True, False]).to_pandas()
    salted = rel.salted_topk_per_group(rd.from_pandas(df), ["g"], ["x", "u"], 3,
                                       descending=[True, False],
                                       salt_col="u").to_pandas()
    key = ["g", "x", "u"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True)[key],
        salted.sort_values(key).reset_index(drop=True)[key])


def test_ivf_topk_recall():
    from illumio_ray.ops import similarity as sim
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 16)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": list(vecs.astype(np.float32))})
    q = centers[0]
    exact = sim.brute_force_topk(rd.from_pandas(df), q, 10).to_pandas()
    approx = sim.ivf_topk(rd.from_pandas(df), q, 10, n_cells=8, nprobe=2).to_pandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.8


def test_keep_best_per_component_picks_highest_score():
    """A~B, B~C chain: one group; the highest-score member wins even when
    it is neither the min id nor pairwise-favored; untouched docs stay."""
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 9],
                         "score": [5.0, 30.0, 10.0, 1.0]})
    pairs = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    kept = dedup.keep_best_per_component(
        rd.from_pandas(docs), rd.from_pandas(pairs),
        "doc_id", "score").to_pandas()
    assert sorted(kept.doc_id) == [2, 9]
    # tie on score → min id wins
    docs2 = pd.DataFrame({"doc_id": [4, 5], "score": [7.0, 7.0]})
    pairs2 = pd.DataFrame({"id_a": [4], "id_b": [5]})
    kept2 = dedup.keep_best_per_component(
        rd.from_pandas(docs2), rd.from_pandas(pairs2),
        "doc_id", "score").to_pandas()
    assert sorted(kept2.doc_id) == [4]


def test_grouped_percent_rank_matches_pandas():
    rng = np.random.default_rng(47)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 600),
                       "v": rng.integers(0, 50, 600)})
    got = rel.grouped_percent_rank(rd.from_pandas(df).repartition(4),
                                   "g", "v").to_pandas()
    expect = df.groupby("g")["v"].rank(method="min").sub(1) / \
        (df.groupby("g")["v"].transform("size") - 1)
    merged = got.sort_values(["g", "v"]).reset_index(drop=True)
    ref = df.assign(pr=np.round(expect, 6)).sort_values(["g", "v"]) \
        .reset_index(drop=True)
    assert np.allclose(merged.pr.to_numpy(), ref.pr.to_numpy())


def test_grouped_dense_rank_and_cume_dist_match_pandas():
    rng = np.random.default_rng(53)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 400),
                       "v": rng.integers(0, 20, 400).astype(float)})
    df.loc[5, "v"] = np.nan  # null value → null rank, row passes through
    ds = rd.from_pandas(df).repartition(4)
    dr = rel.grouped_dense_rank(ds, "g", "v").to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    cd = rel.grouped_cume_dist(ds, "g", "v").to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    ref = df.sort_values(["g", "v"]).reset_index(drop=True)
    want_dr = ref.groupby("g")["v"].rank(method="dense")
    want_cd = ref.groupby("g")["v"].rank(method="max") / \
        ref.groupby("g")["v"].transform(lambda s: s.notna().sum())
    nn = ref["v"].notna()
    assert (dr.loc[nn, "dr"].to_numpy() == want_dr[nn].to_numpy()).all()
    assert np.allclose(cd.loc[nn, "cd"].to_numpy(),
                       np.round(want_cd[nn].to_numpy(), 6))
    assert dr.loc[~nn, "dr"].isna().all()
    assert cd.loc[~nn, "cd"].isna().all()


def test_rollup_agg_matches_pandas_levels():
    rng = np.random.default_rng(59)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 300),
                       "b": rng.choice(["p", "q", "r"], 300),
                       "v": rng.normal(10, 3, 300)})
    out = rel.rollup_agg(rd.from_pandas(df).repartition(3), ["a", "b"],
                         [("v", "count", "n"), ("v", "sum", "s"),
                          ("v", "min", "mn")]).to_pandas()
    finest = out[out.b.notna()]
    lvl_a = out[out.b.isna() & out.a.notna()]
    total = out[out.a.isna()]
    ref = df.groupby(["a", "b"])["v"].agg(["count", "sum", "min"])
    assert len(finest) == len(ref)
    m = finest.set_index(["a", "b"]).sort_index()
    assert (m["n"].to_numpy() == ref["count"].to_numpy()).all()
    assert np.allclose(m["s"].to_numpy(), ref["sum"].to_numpy())
    assert np.allclose(m["mn"].to_numpy(), ref["min"].to_numpy())
    ra = df.groupby("a")["v"].agg(["count", "sum", "min"])
    ma = lvl_a.set_index("a").sort_index()
    assert (ma["n"].to_numpy() == ra["count"].to_numpy()).all()
    assert np.allclose(ma["s"].to_numpy(), ra["sum"].to_numpy())
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == 300
    assert np.isclose(float(total["s"].iloc[0]), df["v"].sum())
    assert np.isclose(float(total["mn"].iloc[0]), df["v"].min())


def test_cube_agg_emits_all_grouping_sets():
    rng = np.random.default_rng(61)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 200),
                       "b": rng.choice(["p", "q"], 200),
                       "v": rng.normal(0, 1, 200)})
    out = rel.cube_agg(rd.from_pandas(df).repartition(3), ["a", "b"],
                       [("v", "count", "n")]).to_pandas()
    assert len(out[out.a.notna() & out.b.notna()]) == \
        df.groupby(["a", "b"]).ngroups
    assert len(out[out.a.notna() & out.b.isna()]) == df["a"].nunique()
    assert len(out[out.a.isna() & out.b.notna()]) == df["b"].nunique()
    total = out[out.a.isna() & out.b.isna()]
    assert len(total) == 1 and int(total["n"].iloc[0]) == 200
    # every level's counts sum to the row count
    for mask in (out.b.notna() & out.a.notna(),
                 out.a.notna() & out.b.isna(),
                 out.a.isna() & out.b.notna()):
        assert int(out.loc[mask, "n"].sum()) == 200


def test_melt_long_form():
    df = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5], "y": [10, 20]})
    out = rel.melt(rd.from_pandas(df), ["id"], ["x", "y"]).to_pandas()
    assert len(out) == 4
    assert set(out.metric) == {"x", "y"}
    got = out.set_index(["id", "metric"])["val"].to_dict()
    assert got[(1, "x")] == 1.5 and got[(2, "y")] == 20.0


def test_pivot_agg_missing_cells():
    df = pd.DataFrame({"g": ["a", "a", "b"],
                       "p": ["x", "y", "x"],
                       "v": [1.0, 2.0, 3.0]})
    out = rel.pivot_agg(rd.from_pandas(df), "g", "p", "v", "sum",
                        values=["x", "y", "z"]).to_pandas() \
        .set_index("g").sort_index()
    assert out.loc["a", "sum_x"] == 1.0 and out.loc["a", "sum_y"] == 2.0
    assert out.loc["b", "sum_x"] == 3.0
    assert pd.isna(out.loc["b", "sum_y"]) and out["sum_z"].isna().all()
    cnt = rel.pivot_agg(rd.from_pandas(df), "g", "p", "v", "count",
                        values=["x", "y"]).to_pandas() \
        .set_index("g").sort_index()
    assert cnt.loc["b", "count_x"] == 1 and cnt.loc["b", "count_y"] == 0
    # null group key: emitted as its own (last) row, not a TypeError
    dfn = pd.DataFrame({"g": ["a", None], "p": ["x", "x"],
                        "v": [1.0, 9.0]})
    outn = rel.pivot_agg(rd.from_pandas(dfn), "g", "p", "v", "sum",
                         values=["x"]).to_pandas()
    assert outn["g"].tolist()[:1] == ["a"] and pd.isna(outn["g"].iloc[1])
    assert outn["sum_x"].tolist() == [1.0, 9.0]


def test_regex_extract_columns_named_groups():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"line": [
        "GET /index.html 200", "POST /api/v1 500", "garbage", None]})
    out = textops.regex_extract_columns(
        rd.from_pandas(df), "line",
        r"(?P<verb>[A-Z]+) (?P<path>\S+) (?P<status>\d+)").to_pandas()
    assert out.verb.tolist()[:2] == ["GET", "POST"]
    assert out.status.tolist()[:2] == ["200", "500"]
    assert out.verb.isna().tolist()[2:] == [True, True]
    dropped = textops.regex_extract_columns(
        rd.from_pandas(df), "line",
        r"(?P<verb>[A-Z]+) (?P<path>\S+) (?P<status>\d+)",
        drop_unmatched=True).to_pandas()
    assert len(dropped) == 2


def test_funnel_counts_ordered_semantics():
    ts = pd.to_datetime  # noqa
    rows = [
        # u1 completes the whole funnel in order
        (1, "2024-01-01 00:00", "view"), (1, "2024-01-01 00:05", "click"),
        (1, "2024-01-01 00:10", "purchase"),
        # u2 clicks BEFORE viewing → click doesn't count; re-click missing
        (2, "2024-01-01 00:05", "click"), (2, "2024-01-01 00:06", "view"),
        # u3 view+click same timestamp → strict 'after' fails
        (3, "2024-01-01 00:00", "view"), (3, "2024-01-01 00:00", "click"),
        # u4 views only
        (4, "2024-01-01 00:00", "view"),
        # u5 purchase with no prefix
        (5, "2024-01-01 00:00", "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = rel.funnel_counts(rd.from_pandas(df).repartition(3), "user_id",
                            "ts", "event_type",
                            ["view", "click", "purchase"]).to_pandas()
    got = dict(zip(out.step, out.n_users))
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_mad_outlier_filter_matches_bruteforce():
    rng = np.random.default_rng(41)
    g = np.repeat(["a", "b"], 500)
    v = np.concatenate([rng.normal(10, 1, 500), rng.normal(-5, 3, 500)])
    v[::97] += 80  # injected spikes
    df = pd.DataFrame({"id": np.arange(1000), "g": g, "v": v})
    got = rel.mad_outlier_filter(rd.from_pandas(df).repartition(4),
                                 "g", "v", thresh=3.5).to_pandas()

    def brute(d):
        def disc_median(x):
            s = np.sort(x.to_numpy())
            return s[max(0, int(np.ceil(len(s) * 0.5)) - 1)]
        med = d.groupby("g")["v"].apply(disc_median)
        dev = (d.v - d.g.map(med)).abs()
        mad = dev.groupby(d.g).apply(disc_median)
        return d[dev <= 3.5 * d.g.map(mad)]

    expect = brute(df)
    assert sorted(got.id) == sorted(expect.id)
    assert len(got) < len(df)  # the spikes actually got dropped


def test_knn_join_matches_multi_query_and_ivf_recall():
    """knn_join (query side = a Dataset, running top-k over right block
    refs) must equal brute_force_topk_multi (broadcast query matrix) on
    the same data; ivf_knn_join must recover most exact neighbors."""
    from illumio_ray.ops import similarity as sim
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((6, 12))
    vecs = np.concatenate(
        [c + 0.1 * rng.standard_normal((40, 12)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)),
                       "embedding": list(vecs.astype(np.float32))})
    right = rd.from_pandas(df).repartition(4)
    left = rd.from_pandas(
        df.rename(columns={"vec_id": "qid"})).repartition(3)

    joined = sim.knn_join(left, right, 5).to_pandas()
    ref = sim.brute_force_topk_multi(
        rd.from_pandas(df).repartition(4),
        df.vec_id.to_numpy(), vecs, 5).to_pandas()
    key = ["qid", "vec_id", "score"]
    a = joined.sort_values(key).reset_index(drop=True)[key]
    b = ref.sort_values(key).reset_index(drop=True)[key]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    approx = sim.ivf_knn_join(left, right, 5, n_cells=6,
                              nprobe=2).to_pandas()
    exact_pairs = set(map(tuple, a[["qid", "vec_id"]].values.tolist()))
    got_pairs = set(map(tuple, approx[["qid", "vec_id"]].values.tolist()))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.8, recall


def test_topk_per_group_keeps_null_partition():
    df = pd.DataFrame({"g": ["a", "a", None, None, "b"],
                       "x": [5.0, 3.0, 9.0, 1.0, 2.0],
                       "id": [1, 2, 3, 4, 5]})
    out = rel.topk_per_group(rd.from_pandas(df), ["g"], ["x", "id"], 1,
                             descending=[True, False]).to_pandas()
    # SQL window semantics: NULL is its own partition
    assert len(out) == 3
    null_rows = out[out.g.isna()]
    assert len(null_rows) == 1 and null_rows.iloc[0].id == 3


def test_asof_partitioned_matches_broadcast_randomized():
    """Randomized equivalence: the range-partitioned as-of (boundary
    seeds, one exchange) must match the broadcast-searchsorted form in
    both directions — including empty partitions (clustered right side)
    and forced narrow partitions."""
    rng = np.random.default_rng(17)
    l_us = np.sort(rng.integers(0, 10_000_000, 400))
    # right side CLUSTERED into two bursts so several partitions hold no
    # right rows at all and matching crosses many boundaries via seeds
    r_us = np.concatenate([rng.integers(0, 1_000_000, 60),
                           rng.integers(6_000_000, 7_000_000, 60)])
    left = pd.DataFrame({"id": np.arange(400),
                         "ts": pd.to_datetime(l_us, unit="us")})
    right_df = pd.DataFrame({"r_ts": pd.to_datetime(r_us, unit="us"),
                             "v": np.arange(len(r_us))})
    right_tbl = pa.Table.from_pandas(right_df, preserve_index=False)
    for direction in ("backward", "forward"):
        bc = rel.asof_broadcast_join(
            rd.from_pandas(left), right_tbl.rename_columns(["ts", "v"]),
            "ts", "ts", {"mv": "v"},
            direction=direction).to_pandas().sort_values("id")
        pt = rel.asof_partitioned_join(
            rd.from_pandas(left), rd.from_pandas(right_df), "ts", "r_ts",
            {"mv": "v"}, direction=direction,
            num_partitions=13).to_pandas().sort_values("id")
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True)[["id", "mv"]],
            pt.reset_index(drop=True)[["id", "mv"]], check_dtype=False)


def test_asof_partitioned_null_and_empty_right():
    left = pd.DataFrame({"id": [1, 2],
                         "ts": pd.to_datetime(["2024-01-01 00:10", None])})
    right = pd.DataFrame({"r_ts": pd.to_datetime(["2024-01-01 00:00"]),
                          "v": [7]})
    out = rel.asof_partitioned_join(
        rd.from_pandas(left), rd.from_pandas(right), "ts", "r_ts",
        {"prev_v": "v"}, num_partitions=4).to_pandas().sort_values("id")
    assert out.prev_v.tolist()[0] == 7
    assert pd.isna(out.prev_v.tolist()[1])
    # right side with zero matchable rows → all-null matches, schema kept
    none = rel.asof_partitioned_join(
        rd.from_pandas(left),
        rd.from_pandas(pd.DataFrame({"r_ts": pd.to_datetime([pd.NaT]),
                                     "v": [1]})),
        "ts", "r_ts", {"prev_v": "v"}, num_partitions=4).to_pandas()
    assert len(none) == 2 and none.prev_v.isna().all()


def test_asof_join_null_left_ts_yields_null():
    left = pd.DataFrame({"id": [1, 2],
                         "ts": pd.to_datetime(["2024-01-01 00:10", None])})
    right = pa.Table.from_pandas(pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00"]), "v": [7]}))
    out = rel.asof_broadcast_join(rd.from_pandas(left), right, "ts", "ts",
                                  {"prev_v": "v"}).to_pandas().sort_values("id")
    assert out.prev_v.tolist()[0] == 7
    assert pd.isna(out.prev_v.tolist()[1])


def test_grouped_agg_empty_input_keeps_key_types():
    df = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                       "v": pd.Series([], dtype="float64")})
    out = rel.grouped_agg(rd.from_pandas(df), ["k"],
                          [("v", "sum", "s")], mode="driver")
    assert out.count() == 0
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert str(types["k"]) == "int64"   # not a hardcoded string guess
    assert str(types["s"]) == "double"


def test_shingle_hashes_match_string_reference():
    """The rolling-token-key shingles must produce the same SETS (sizes,
    pairwise Jaccard) as the definitional string implementation —
    lowercase, whitespace runs, short docs, empties, None."""
    rng = np.random.default_rng(23)
    vocab = [f"Word{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(60)]
    texts += ["", None, "one", "two tokens", "Tab\tand\nnewline  runs",
              "repeat repeat repeat repeat", "MiXeD CaSe MiXeD CaSe x"]

    def ref_shingles(s, n=3):
        toks = s.lower().split() if s else []
        if not toks:
            return set()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    from illumio_ray.ops.dedup import _shingle_hashes, jaccard
    got = _shingle_hashes(texts, 3)
    refs = [ref_shingles(s) for s in texts]
    assert [len(a) for a in got] == [len(r) for r in refs]
    for i in range(0, len(texts), 7):
        for j in range(i + 1, len(texts), 11):
            a, b = refs[i], refs[j]
            ref_j = (1.0 if not a and not b
                     else len(a & b) / len(a | b) if (a | b) else 0.0)
            assert abs(jaccard(got[i], got[j]) - ref_j) < 1e-12, (i, j)


def test_stale_shingle_index_scheme_is_refused():
    import json
    import tempfile
    from pathlib import Path

    from illumio_ray.ops.dedup import (append_to_shingle_index,
                                       build_shingle_index)
    d = tempfile.mkdtemp(prefix="shidx_")
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["alpha beta gamma delta",
                                "alpha beta gamma epsilon"]})
    build_shingle_index(rd.from_pandas(df), "doc_id", "text", d)
    meta = json.loads(Path(d, "_index_meta.json").read_text())
    meta["scheme"] = "string-v1"
    Path(d, "_index_meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="scheme"):
        append_to_shingle_index(rd.from_pandas(df), d, "doc_id", "text")


def test_verify_jaccard_join_matches_broadcast():
    texts = [f"unique words {i} " + " ".join(f"w{i}{j}" for j in range(20))
             for i in range(30)]
    texts.append(texts[0])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs_tbl = pa.Table.from_pandas(df)
    ds = rd.from_pandas(df)
    cand = dedup.minhash_lsh_candidates(ds, "doc_id", "text")
    a = dedup.verify_jaccard_pairs(cand, docs_tbl, "doc_id", "text",
                                   threshold=0.9).to_pandas()
    cand2 = dedup.minhash_lsh_candidates(ds, "doc_id", "text")
    b = dedup.verify_jaccard_pairs_join(cand2, rd.from_pandas(df), "doc_id",
                                        "text", threshold=0.9).to_pandas()
    key = ["id_a", "id_b", "jaccard"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
        check_dtype=False)


def test_verify_jaccard_disk_matches_broadcast(tmp_path):
    """The constrained-store disk-exchange verify must agree exactly with
    the broadcast verify (pairs AND jaccard values), including the
    preserved int64 ids and the empty-candidates early-out."""
    texts = [f"unique words {i} " + " ".join(f"w{i}{j}" for j in range(20))
             for i in range(30)]
    texts.append(texts[0])
    big = 2**60
    ids = list(range(len(texts) - 1)) + [big]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = rd.from_pandas(df)
    cand = dedup.minhash_lsh_candidates(ds, "doc_id", "text")
    a = dedup.verify_jaccard_pairs(cand, pa.Table.from_pandas(df), "doc_id",
                                   "text", threshold=0.9).to_pandas()
    cand2 = dedup.minhash_lsh_candidates(ds, "doc_id", "text")
    b = dedup.verify_jaccard_pairs_disk(
        cand2, rd.from_pandas(df), "doc_id", "text",
        work_dir=tmp_path / "vj", threshold=0.9).to_pandas()
    key = ["id_a", "id_b", "jaccard"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
        check_dtype=False)
    assert b.id_a.dtype == np.int64 and b.id_b.dtype == np.int64
    assert big in set(b.id_a) | set(b.id_b)
    # empty candidate table → empty result, stable schema, no layout
    # error (schema checked on the Dataset: Ray 2.49 to_pandas drops the
    # schema of a 0-row dataset — CLAUDE.md invariant)
    empty = dedup.verify_jaccard_pairs_disk(
        rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                "id_b": pa.array([], pa.int64())})),
        rd.from_pandas(df), "doc_id", "text",
        work_dir=tmp_path / "vj2")
    assert empty.schema().names == ["id_a", "id_b", "jaccard"]
    assert empty.count() == 0


def test_read_pages_jsonl_gz_roundtrip(tmp_path):
    import base64
    import gzip
    import json as _json

    from illumio_ray.sources.jsonl import read_pages_jsonl

    rows = [
        {"url": "https://a/1", "warc_ts": "2024-10-01T00:00:01",
         "html": base64.b64encode("<body>hi</body>".encode()).decode(),
         "text": "hi", "lang": "en"},
        {"url": "https://a/2", "warc_ts": 1727740800000000,
         "html": base64.b64encode("<body>yo</body>".encode()).decode(),
         "text": "yo", "lang": "de"},
    ]
    p = tmp_path / "pages.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write("{not json}\n")          # malformed -> dropped
        f.write('{"url": "https://a/3"}\n')  # missing fields -> dropped
    out = read_pages_jsonl(p).to_pandas().sort_values("url")
    assert list(out.url) == ["https://a/1", "https://a/2"]
    assert out.html.iloc[0] == b"<body>hi</body>"
    assert str(out.warc_ts.iloc[1]) == "2024-10-01 00:00:00"


def test_exact_dedup_survives_hash_collision(monkeypatch):
    """Distinct texts colliding on hash64 must BOTH survive."""
    from illumio_ray.ops import dedup as dd

    def fake_hash(values, seed=0):
        return np.zeros(len(values), dtype=np.uint64)  # everything collides

    monkeypatch.setattr(dd, "hash64", fake_hash)
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "aa"]})
    out = dd.exact_dedup(rd.from_pandas(df), "text", "doc_id").to_pandas()
    assert sorted(out.doc_id) == [1, 2]


def test_verify_join_preserves_int64_ids():
    texts = [f"unique words {i} " + " ".join(f"w{i}{j}" for j in range(20))
             for i in range(10)]
    texts.append(texts[0])
    big = 2**60  # would corrupt if promoted to float64
    ids = list(range(10)) + [big]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    cand = dedup.minhash_lsh_candidates(rd.from_pandas(df), "doc_id", "text")
    out = dedup.verify_jaccard_pairs_join(cand, rd.from_pandas(df), "doc_id",
                                          "text", threshold=0.9).to_pandas()
    assert len(out) == 1
    assert out.id_a.dtype == np.int64 and out.id_b.dtype == np.int64
    assert out.id_b.iloc[0] == big


def test_jsonl_rejects_overflow_bool_and_offset_ts(tmp_path):
    import gzip
    import json as _json

    from illumio_ray.sources.jsonl import read_pages_jsonl

    base = {"html": "", "text": "t", "lang": "en"}
    rows = [
        {"url": "ok", "warc_ts": "2024-10-01T00:00:01Z", **base},
        {"url": "overflow", "warc_ts": 99999999999999999999, **base},
        {"url": "bool", "warc_ts": True, **base},
        {"url": "offset", "warc_ts": "2024-10-01T00:00:01+02:00", **base},
        {"url": "negoffset", "warc_ts": "2024-10-01T00:00:01-05:00", **base},
    ]
    p = tmp_path / "x.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    out = read_pages_jsonl(p).to_pandas()
    assert list(out.url) == ["ok"]
    assert str(out.warc_ts.iloc[0]) == "2024-10-01 00:00:01"


def test_jsonl_utf8_mode_keeps_base64_lookalike(tmp_path):
    import json as _json

    from illumio_ray.sources.jsonl import read_pages_jsonl

    p = tmp_path / "y.jsonl"
    p.write_text(_json.dumps({"url": "u", "warc_ts": 0, "html": "deadbeef",
                              "text": "t", "lang": "en"}) + "\n")
    out = read_pages_jsonl(p, html_encoding="utf8").to_pandas()
    assert out.html.iloc[0] == b"deadbeef"  # NOT base64-decoded garbage


def test_hll_distinct_accuracy_and_merge():
    from illumio_ray.functions.sketches import HyperLogLog, hll_distinct

    vals = [f"key-{i}" for i in range(20_000)] * 3  # 20k distinct, 60k rows
    # merge property: two halves merged == whole
    a = HyperLogLog().add(vals[:30_000])
    b = HyperLogLog().add(vals[30_000:])
    whole = HyperLogLog().add(vals)
    assert a.merge(b).estimate() == whole.estimate()
    est = whole.estimate()
    assert abs(est - 20_000) / 20_000 < 0.05, est

    # distributed path
    df = pd.DataFrame({"k": vals})
    est2 = hll_distinct(rd.from_pandas(df), "k")
    assert abs(est2 - 20_000) / 20_000 < 0.05, est2


def test_null_text_matches_sql_unnest_semantics(tmp_path):
    """string_split(NULL) unnests to zero rows in SQL; the Ray side must
    drop null-text docs, not mint an empty-string token (ADVICE r2)."""
    import duckdb
    import pyarrow.parquet as pq

    from illumio_ray.pipelines.queries import REGISTRY

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b a", None, "b b b", None], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')")

    for name in ("doc_repetition", "corpus_top_words"):
        spec = REGISTRY[name]
        got = spec.fn(str(tmp_path))
        got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
        want = con.execute(spec.sql).df()
        key = [c for c in ("doc_id", "word") if c in want.columns]
        got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
        want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_sliding_window_counts_unit_invariant():
    """timestamp[ns] input must produce the same windows as timestamp[us]
    (ADVICE r2: raw int64 cast would misscale non-µs units 1000×)."""
    ts = pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:31",
                         "2024-01-01 00:01:05", "2024-01-01 00:02:59"])
    out = {}
    for unit in ("us", "ns", "ms"):
        t = pa.table({"ts": pa.array(ts).cast(pa.timestamp(unit))})
        ds = rd.from_arrow(t)
        res = rel.sliding_window_counts(ds, "ts", window_sec=60, hop_sec=30)
        out[unit] = res.to_pandas().sort_values("win_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(out["us"], out["ns"])
    pd.testing.assert_frame_equal(out["us"], out["ms"])


def test_near_dup_query_join_branch_matches_broadcast(monkeypatch):
    """Force the scale path (reduce-side join verify) through the query
    entry point itself and check it yields the same pairs as the
    broadcast-verify branch (VERDICT r2 item 3)."""
    from illumio_ray.pipelines.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    fn = REGISTRY["near_dup_docs"].fn

    def run():
        out = fn(sf_dir)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        return (df[["id_a", "id_b", "jaccard"]]
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    broadcast = run()
    monkeypatch.setattr(dedup, "BROADCAST_VERIFY_MAX_DOCS", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined)


def test_adaptive_bucket_count_rule():
    """Pins the sizing rule: max(floor, 4*CPUs, ceil(rows/target))."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 1))
    assert rel.adaptive_bucket_count(None) == max(64, 4 * cpus)
    assert rel.adaptive_bucket_count(10) == max(64, 4 * cpus)
    big = 10_000_000_000
    assert rel.adaptive_bucket_count(big) == max(64, 4 * cpus, big // 1_000_000)
    assert rel.adaptive_bucket_count(1_000_001) >= 2 or max(64, 4 * cpus) >= 2


def test_keyed_window_bucket_count_invariant():
    """The bucket id is a partitioning artifact: any bucket count must give
    identical window results (pins the keyed_window refactor)."""
    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "event_id": np.arange(n),
    })

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        grp = g.groupby("user_id", sort=False)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "seq": (grp.cumcount() + 1).to_numpy()})

    outs = []
    for p in (1, 5, 64):
        ds = rd.from_pandas(df)
        out = rel.keyed_window(ds, "user_id", counts, num_buckets=p)
        outs.append(out.to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_stable_hash64_pinned_values():
    """stable_hash64 decides PERSISTED bucket layouts, so its values are
    pinned forever: if this test fails, bucketed layouts written by older
    builds would silently join wrong. Never update these constants —
    fix the regression instead (ADVICE r2 on cross-version hashing)."""
    from illumio_ray.functions.hashing import stable_hash64

    got = [int(x) for x in stable_hash64(["", "a", "illumio"])]
    assert got == [0x238275BC38FCBE91, 0xED673BABE737FE57, 0x21ECFB269529550D]
    ints = [int(x) for x in stable_hash64(np.array([0, 1, -1], np.int64))]
    assert len(set(ints)) == 3
    again = [int(x) for x in stable_hash64(np.array([0, 1, -1], np.int64))]
    assert ints == again
    # arrow slice (nonzero offset) must hash like the equivalent copy
    full = pa.array(["aaa", "bbb", "ccc"])
    assert (stable_hash64(full.slice(1, 2)) == stable_hash64(["bbb", "ccc"])).all()


def test_bucketed_layout_written_once_reused_twice():
    """Two different oracle-backed queries read the SAME persisted bucket
    layout; the second run must not rewrite a single parquet file
    (the amortization claim in ops/bucketing.py, VERDICT r2 stretch)."""
    from illumio_ray.pipelines.queries import REGISTRY, _ensure_custkey_layout

    sf_dir = "/root/testdata/sf0.001"
    base = _ensure_custkey_layout(sf_dir)
    files = {str(p): p.stat().st_mtime_ns for p in base.rglob("*.parquet")}
    assert files, "layout produced no parquet files"

    seg = REGISTRY["orders_per_segment_bucketed"].fn(sf_dir)
    per_cust = REGISTRY["customer_order_counts_bucketed"].fn(sf_dir)
    per_cust = (per_cust.to_pandas() if hasattr(per_cust, "to_pandas")
                else per_cust)
    assert len(seg) == 5
    assert per_cust["n_orders"].sum() == seg["n_orders"].sum()

    after = {str(p): p.stat().st_mtime_ns for p in base.rglob("*.parquet")}
    assert after == files  # no re-layout, no rewrite


def test_ngram_jaccard_exact_pairs_and_max_df():
    # 3 docs: 0 and 1 share most 3-gram shingles; 2 is unrelated.
    base = " ".join(f"w{j}" for j in range(12))
    texts = [base, base + " tail", "completely different words here now ok"]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    out = dedup.ngram_jaccard_pairs(rd.from_pandas(df), "doc_id", "text",
                                    threshold=0.5,
                                    num_buckets=8).to_pandas()
    assert list(out.itertuples(index=False, name=None))[0][:2] == (0, 1)
    assert len(out) == 1
    # exact value: doc0 has 10 shingles, doc1 has 11, all 10 shared
    assert out.iloc[0].jaccard == round(10 / 11, 6)

    # max_df=1 drops every shared shingle → candidate pruning removes the pair
    pruned = dedup.ngram_jaccard_pairs(rd.from_pandas(df), "doc_id", "text",
                                       threshold=0.5, max_df=1,
                                       num_buckets=8).to_pandas()
    assert len(pruned) == 0


def test_ngram_jaccard_superset_of_minhash_lsh():
    """Exactness: every pair the approximate MinHash-LSH path reports at a
    threshold must also be found by the inverted-index exact path."""
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    texts += [t + " extra" for t in texts[:5]]  # 5 near-dup pairs
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = pa.Table.from_pandas(df)
    approx = dedup.near_dup_pairs(rd.from_pandas(df), docs, "doc_id", "text",
                                  threshold=0.8).to_pandas()
    exact = dedup.ngram_jaccard_pairs(rd.from_pandas(df), "doc_id", "text",
                                      threshold=0.8,
                                      num_buckets=8).to_pandas()
    approx_pairs = set(zip(approx.id_a, approx.id_b))
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    assert approx_pairs <= exact_pairs
    assert len(exact_pairs) >= 5


def test_tfidf_top_term_picks_distinctive_word():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["x x y", "x x z"]})
    out = (textops.tfidf_top_term(rd.from_pandas(df), n_docs=2)
           .to_pandas().sort_values("doc_id"))
    # 'x' appears in both docs → idf 0; the df=1 word wins in each doc
    assert list(out.word) == ["y", "z"]
    assert (out.tfidf > 0).all()


def test_decontaminate_flags_ngram_overlap():
    from illumio_ray.ops import textops
    bench = ["the quick brown fox jumps over the lazy dog"]
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "prefix the quick brown fox jumps suffix words",   # shares a 5-gram
        "completely unrelated words with no shared grams at all",
        "",                                                # empty → clean
    ]})
    out = (textops.decontaminate_flags(rd.from_pandas(df), bench)
           .to_pandas().sort_values("doc_id"))
    assert list(out.contaminated) == [1, 0, 0]


def test_content_token_counts_filters_stopwords_and_empties():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "the cat and the hat",      # 2 content words (cat, hat)
        "a of to and in is for the",  # all stopwords → 0
        "",                          # empty split → one '' token → 0
    ]})
    out = (textops.add_content_token_counts(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert list(out.n_content) == [2, 0, 0]


def test_gopher_bounds_flags_and_drops_empty():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        " ".join(["word"] * 20),          # 20 words, mean len 4 → keep
        "aa bb",                          # 2 words → below min_words
        "",                               # zero words → dropped
    ]})
    out = (textops.gopher_bounds(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert list(out.doc_id) == [1, 2]
    assert list(out.keep) == [1, 0]
    assert list(out.n_words) == [20, 2]
    assert out.mean_word_len.tolist() == [4.0, 2.0]


def test_ntile_matches_sql_semantics():
    # n=6, ntile(4) → tile sizes 2,2,1,1 (larger tiles first)
    import duckdb
    df = pd.DataFrame({"event_id": range(6),
                       "event_type": ["a"] * 6,
                       "value": [10.0, 20, 30, 40, 50, 60]})
    from illumio_ray.pipelines.queries import REGISTRY
    # reuse the registered window fn through keyed_window directly
    ds = rd.from_pandas(df)

    def window(g):
        g = g.sort_values(["event_type", "value", "event_id"])
        grp = g.groupby("event_type", sort=False)
        r = grp.cumcount().to_numpy(np.int64)
        n = grp["value"].transform("size").to_numpy(np.int64)
        small, rem = n // 4, n % 4
        boundary = rem * (small + 1)
        tile = np.where(r < boundary, r // np.maximum(small + 1, 1),
                        rem + (r - boundary) // np.maximum(small, 1)) + 1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "quartile": tile.astype(np.int64)})

    mine = (rel.keyed_window(ds, "event_type", window, num_buckets=2)
            .to_pandas().sort_values("event_id"))
    want = duckdb.connect().execute(
        "SELECT event_id, ntile(4) OVER (PARTITION BY event_type "
        "ORDER BY value, event_id) q FROM df ORDER BY event_id"
    ).df()
    assert list(mine.quartile) == list(want.q)


def test_redact_patterns_replaces_and_counts_on_original():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "mail me at bob@example.com or alice@test.org now",   # 2 emails
        "server 10.0.0.1 and 192.168.1.255 tel 555-123-4567",  # 2 IP + 1 phone
        "nothing to hide here",                                # 0 matches
    ]})
    out = (textops.redact_patterns(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert list(out.n_redacted) == [2, 3, 0]
    assert out.text_redacted.iloc[0] == "mail me at <EMAIL> or <EMAIL> now"
    assert out.text_redacted.iloc[1] == "server <IP> and <IP> tel <PHONE>"
    assert out.text_redacted.iloc[2] == "nothing to hide here"


def test_bm25_scores_match_hand_computation():
    import math
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [
        "cat cat dog", "dog bird", "fish fish fish fish"]})
    out = (textops.bm25_scores(rd.from_pandas(df), ("cat", "dog"))
           .to_pandas().sort_values("doc_id"))
    # hand BM25: N=3, avgdl=(3+2+4)/3=3; term cat df=1, dog df=2
    k1, b = 1.2, 0.75
    def score(tf, df_, dl):
        idf = math.log((3 - df_ + 0.5) / (df_ + 0.5) + 1.0)
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / 3.0))
    want = [score(2, 1, 3) + score(1, 2, 3),   # doc 1
            score(0, 1, 2) + score(1, 2, 2),   # doc 2
            0.0]                               # doc 3: neither term
    assert np.allclose(out.bm25.to_numpy(), np.round(want, 6), atol=1e-6)


def test_dup_ngram_fraction_counts_repeats_and_drops_short():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "a b a b a",        # bigrams: ab ba ab ba → 4 total, 2 distinct
        "x y z",            # 2 distinct bigrams, no repeats
        "solo",             # <2 words → dropped
        "w w w w",          # ww ww ww → 3 total 1 distinct
    ]})
    out = (textops.add_dup_ngram_fraction(rd.from_pandas(df), n=2)
           .to_pandas().sort_values("doc_id"))
    assert list(out.doc_id) == [1, 2, 4]
    assert list(out.n_ngrams) == [4, 2, 3]
    assert np.allclose(out.dup_frac.to_numpy(), [0.5, 0.0, 2.0 / 3.0],
                       atol=1e-6)


def test_dup_components_path_graph_and_empty():
    from illumio_ray.ops import dedup
    # path 1-2-3-4-5 needs multiple propagation rounds; (10,11) is separate
    pairs = pd.DataFrame({"id_a": [1, 2, 3, 4, 10], "id_b": [2, 3, 4, 5, 11]})
    out = (dedup.dup_components(rd.from_pandas(pairs))
           .to_pandas().sort_values("id"))
    assert list(out.id) == [1, 2, 3, 4, 5, 10, 11]
    assert list(out.component) == [1, 1, 1, 1, 1, 10, 10]
    empty = dedup.dup_components(rd.from_pandas(pd.DataFrame(
        {"id_a": pd.Series([], dtype="int64"),
         "id_b": pd.Series([], dtype="int64")})))
    assert empty.count() == 0


def test_dup_components_driver_path_equals_distributed():
    from illumio_ray.ops import dedup

    rng = np.random.default_rng(11)
    # random graph with chains, cliques and singleton pairs
    a = rng.integers(0, 400, 600)
    b = np.where(rng.random(600) < 0.5, a + 1, rng.integers(0, 400, 600))
    pairs = pd.DataFrame({"id_a": a, "id_b": b})
    pairs = pairs[pairs.id_a != pairs.id_b].reset_index(drop=True)
    drv = (dedup.dup_components(rd.from_pandas(pairs))
           .to_pandas().sort_values("id").reset_index(drop=True))
    dist = (dedup.dup_components(rd.from_pandas(pairs),
                                 driver_edge_limit=0)
            .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist, check_dtype=False)


def test_drop_empty_blocks_enables_join_after_shuffle_agg():
    # shuffle grouped_agg can emit 0-row EMPTY-SCHEMA blocks that crash a
    # downstream Dataset.join; drop_empty_blocks must remove them.
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]}))
    agg_in = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3], "v": [5, 6, 7, 8]}))
    agg = rel.grouped_agg(agg_in, ["k"], [("v", "min", "m")], mode="shuffle")
    clean = rel.drop_empty_blocks(agg)
    for bundle in clean.iter_internal_ref_bundles():
        for _ref, meta in bundle.blocks:
            assert meta.num_rows != 0
    out = rel.hash_join(left, clean, on=["k"]).to_pandas().sort_values("k")
    assert list(out.m) == [5, 7, 8]


def test_hash_mixture_sample_rates_and_determinism():
    df = pd.DataFrame({"id": range(4000),
                       "src": ["a", "b", "c", "d"] * 1000})
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    out1 = rel.hash_mixture_sample(rd.from_pandas(df), rates, "src", "id",
                                   default_rate=0.25).to_pandas()
    out2 = rel.hash_mixture_sample(rd.from_pandas(df), rates, "src", "id",
                                   default_rate=0.25).to_pandas()
    counts = out1.groupby("src")["id"].count()
    assert counts.get("a", 0) == 1000          # rate 1.0 keeps all
    assert "c" not in counts.index             # rate 0.0 drops all
    assert 400 <= counts["b"] <= 600           # ~0.5 Bernoulli
    assert 150 <= counts["d"] <= 350           # default 0.25
    # deterministic + partitioning-independent keep-set
    assert sorted(out1.id) == sorted(out2.id)
    out3 = rel.hash_mixture_sample(
        rd.from_pandas(df).repartition(7), rates, "src", "id",
        default_rate=0.25).to_pandas()
    assert sorted(out3.id) == sorted(out1.id)


def test_pack_sequences_respects_budget_and_covers_all():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": range(30),
                       "n_tokens": [37, 512, 100, 900, 1500] * 6})
    out = (textops.pack_sequences(rd.from_pandas(df), budget=1024,
                                  token_col="n_tokens")
           .to_pandas())
    # every doc assigned exactly once
    assert sorted(out.doc_id) == list(range(30))
    loads = out.groupby("bin_id").agg(total=("n_tokens", "sum"),
                                      n=("n_tokens", "count"))
    # over-budget only allowed for single oversized docs (1500 > 1024)
    over = loads[loads.total > 1024]
    assert (over.n == 1).all()
    # the 1500-token docs are isolated; everything else fits
    assert set(out[out.n_tokens == 1500].groupby("doc_id").size()) == {1}
    # deterministic
    out2 = (textops.pack_sequences(rd.from_pandas(df), budget=1024,
                                   token_col="n_tokens").to_pandas())
    assert out.sort_values("doc_id").bin_id.tolist() == \
        out2.sort_values("doc_id").bin_id.tolist()


def test_global_percent_rank_matches_duckdb():
    import duckdb
    df = pd.DataFrame({"id": range(9),
                       "v": [5, 3, 3, 8, 1, 5, 5, 2, 8]})
    out = (rel.global_percent_rank(rd.from_pandas(df), "v")
           .to_pandas().sort_values("id"))
    want = duckdb.connect().execute(
        "SELECT id, ROUND(percent_rank() OVER (ORDER BY v), 6) AS pr "
        "FROM df ORDER BY id").df()
    assert out.pr.tolist() == want.pr.tolist()


def test_normalize_text_canonical_form():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2], "text": [
        "  Hello\t\tWorld \n new LINE  ",
        "Cafe\u0301 MIXED",   # e + combining acute → NFC é
    ]})
    out = (textops.normalize_text(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert out.text_norm.iloc[0] == "hello world new line"
    assert out.text_norm.iloc[1] == "caf\u00e9 mixed"


def test_count_min_overestimates_within_bound_and_merges():
    from illumio_ray.functions.sketches import CountMinSketch
    rng = np.random.default_rng(5)
    # zipf-ish: heavy keys + long tail
    keys = np.concatenate([np.repeat([f"k{i}" for i in range(10)],
                                     [2000 - 180 * i for i in range(10)]),
                           rng.integers(0, 50000, 30000).astype(str)])
    true = pd.Series(keys).value_counts()
    whole = CountMinSketch().add_array(keys)
    # split-merge equals whole
    a, b = CountMinSketch().add_array(keys[:9000]), \
        CountMinSketch().add_array(keys[9000:])
    assert (a.merge(b).counts == whole.counts).all()
    probe = np.array([f"k{i}" for i in range(10)])
    est = whole.estimate_array(probe)
    for i, e in enumerate(est):
        t = true[f"k{i}"]
        assert e >= t                       # never undercounts
        assert e <= t + 0.01 * len(keys)    # eps*N slack at width 2048


def test_incremental_jaccard_equals_batch_restricted(tmp_path):
    from illumio_ray.ops import dedup
    docs = pd.DataFrame({"doc_id": list(range(8)), "text": [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog today",   # old-old dup: excluded
        "completely different text about ray data pipelines ok",
        "another unrelated document with plain words here now",
        "the quick brown fox jumps over the lazy dog today",   # new vs old 0,1
        "completely different text about ray data pipelines ok",  # new vs old 2
        "fresh new content never seen before in any corpus x",
        "fresh new content never seen before in any corpus x",    # new-new pair
    ]})
    old, new = docs[docs.doc_id < 4], docs[docs.doc_id >= 4]
    idx = str(tmp_path / "jidx")
    dedup.build_shingle_index(rd.from_pandas(old), "doc_id", "text", idx,
                              n_rows=4 * 64)
    inc = (dedup.ngram_jaccard_pairs_incremental(
        rd.from_pandas(new), idx, "doc_id", "text")
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    full = dedup.ngram_jaccard_pairs(rd.from_pandas(docs), "doc_id", "text",
                                     n_rows=8 * 64).to_pandas()
    expect = (full[(full.id_a >= 4) | (full.id_b >= 4)]
              .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert inc.equals(expect)
    assert set(zip(inc.id_a, inc.id_b)) == {(0, 4), (1, 4), (2, 5), (6, 7)}


def test_segment_dedup_keep_first_and_sep_mode():
    from illumio_ray.ops import dedup
    # doc 1 repeats doc 0's first 10-word segment (positions 0-9); doc 2
    # repeats its own segment internally
    seg_a = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    seg_b = "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"
    docs = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
        seg_a + " tail0 only",
        seg_a + " " + seg_b,
        seg_b + " " + seg_b,
    ]})
    out = (dedup.segment_dedup(rd.from_pandas(docs), "doc_id", "text",
                               seg_words=10, n_rows=3 * 64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc0 keeps seg_a (first occurrence) + its tail
    assert out.loc[0, "clean_text"] == seg_a + " tail0 only"
    assert (out.loc[0, "n_kept"], out.loc[0, "n_removed"]) == (2, 0)
    # doc1 loses seg_a (dup of doc0's) but keeps seg_b (first occurrence)
    assert out.loc[1, "clean_text"] == seg_b
    assert (out.loc[1, "n_kept"], out.loc[1, "n_removed"]) == (1, 1)
    # doc2 loses both copies of seg_b (doc1 owns the first occurrence)
    assert out.loc[2, "clean_text"] == ""
    assert (out.loc[2, "n_kept"], out.loc[2, "n_removed"]) == (0, 2)

    # production separator mode: newline paragraphs
    pdocs = pd.DataFrame({"doc_id": [0, 1], "text": [
        "keep me\nshared boilerplate",
        "shared boilerplate\nunique tail",
    ]})
    pout = (dedup.segment_dedup(rd.from_pandas(pdocs), "doc_id", "text",
                                sep="\n", n_rows=2 * 64)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert pout.loc[0, "clean_text"] == "keep me\nshared boilerplate"
    assert pout.loc[1, "clean_text"] == "unique tail"
    assert pout.loc[1, "n_removed"] == 1


def test_bigram_lm_nll_hand_computed():
    import math
    from illumio_ray.ops import textops
    # corpus bigrams: (a,b)×3 (twice in doc0, once in doc1), (b,a), (b,c)
    # c1(a)=3, c1(b)=2; V=4 distinct tokens {a,b,c,x}
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["a b a b", "a b c", "x"]})
    out = (textops.bigram_lm_nll(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id"))
    p_ab = (3 + 1) / (3 + 4)
    p_ba = (1 + 1) / (2 + 4)
    p_bc = (1 + 1) / (2 + 4)
    exp0 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    exp1 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert 2 not in out.index          # single-word doc: no bigrams
    assert abs(out.loc[0, "nll"] - exp0) < 1e-6
    assert abs(out.loc[1, "nll"] - exp1) < 1e-6


def test_dsir_weights_favor_target_like_docs():
    from illumio_ray.ops import textops
    import pyarrow.compute as pc
    # target docs speak "alpha beta"; the off-target doc speaks "x y"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "lang": ["en", "en", "xx", "xx"],
        "text": ["alpha beta alpha beta", "beta alpha beta alpha",
                 "x y x y", "alpha beta x y"]})
    out = (textops.dsir_log_weights(
        rd.from_pandas(docs), lambda t: pc.equal(t["lang"], "en"))
        .to_pandas().set_index("doc_id")["log_w"])
    # target-like docs score above both off-target docs (the mixed doc
    # pays extra for its unseen-in-target cross bigram "beta x")
    assert min(out[0], out[1]) > max(out[2], out[3])
    assert out[0] > 0 and out[1] > 0          # toward-target: positive
    assert out[2] < 0 and out[3] < 0          # away-from-target: negative


def test_profile_table_nulls_and_distinct():
    from illumio_ray.ops.profile import profile_table
    df = pd.DataFrame({
        "a": [1, 2, 2, None],
        "s": ["x", None, None, "y"],
        "f": [1.5, 2.5, 3.5, 4.5],   # float: excluded by default
    })
    df["a"] = df["a"].astype("Int64")
    out = (profile_table(rd.from_pandas(df))
           .to_pandas().set_index("col_name"))
    assert set(out.index) == {"a", "s"}        # float column excluded
    assert out.loc["a"].tolist() == [4, 1, 2, "1", "2"]
    assert out.loc["s"].tolist() == [4, 2, 2, "x", "y"]


def test_audio_feature_stub_shape_and_determinism():
    df = pd.DataFrame({"url": ["a", "b", "c"],
                       "payload": [bytes(range(64)), b"\x00" * 32, b""]})
    out1 = (multimodal.audio_features(rd.from_pandas(df), "payload",
                                      n_windows=8).to_pandas()
            .sort_values("url").reset_index(drop=True))
    out2 = (multimodal.audio_features(rd.from_pandas(df), "payload",
                                      n_windows=8).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert all(len(v) == 8 for v in out1.frame_energy)
    assert out1.loc[0, "duration_sec"] == 64 / 16000
    assert out1.loc[2, "duration_sec"] == 0.0        # empty payload
    assert (np.asarray(out1.loc[2, "frame_energy"]) == 0).all()
    for a, b in zip(out1.frame_energy, out2.frame_energy):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert "payload" not in out1.columns


def test_incremental_index_append_round_trip(tmp_path):
    from illumio_ray.ops import dedup
    base = "the quick brown fox jumps over the lazy dog today"
    other = "completely different text about ray data pipelines ok"
    idx = str(tmp_path / "jidx2")
    old = pd.DataFrame({"doc_id": [0, 1], "text": [base, other]})
    dedup.build_shingle_index(rd.from_pandas(old), "doc_id", "text", idx,
                              n_rows=2 * 64)
    # batch A: doc 2 dups doc 0 → one new-side pair (0, 2)
    a = pd.DataFrame({"doc_id": [2], "text": [base]})
    pa_pairs = (dedup.ngram_jaccard_pairs_incremental(
        rd.from_pandas(a), idx, "doc_id", "text").to_pandas())
    assert set(zip(pa_pairs.id_a, pa_pairs.id_b)) == {(0, 2)}
    # commit batch A, then batch B dups doc 2 (known only via the append)
    dedup.append_to_shingle_index(rd.from_pandas(a), idx, "doc_id", "text")
    b = pd.DataFrame({"doc_id": [3], "text": [base]})
    pb_pairs = (dedup.ngram_jaccard_pairs_incremental(
        rd.from_pandas(b), idx, "doc_id", "text").to_pandas())
    # doc 3 pairs with BOTH indexed copies; indexed-indexed (0,2) excluded
    assert set(zip(pb_pairs.id_a, pb_pairs.id_b)) == {(0, 3), (2, 3)}


def test_exact_dedup_incremental_equals_batch_restricted(tmp_path):
    """exact_dedup_incremental vs a persisted content index == exact_dedup
    over (committed ∪ batch) restricted to batch ids — including
    batch-internal duplicates (min-id representative kept), exact copies
    of committed docs (dropped), ride-along columns preserved with their
    dtypes (int64 ids never float-corrupted by the union), and
    append-then-reingest idempotence."""
    from illumio_ray.ops import dedup

    committed = pa.table({
        "doc_id": pa.array(range(120), pa.int64()),
        "text": pa.array([f"doc text {i % 40}" for i in range(120)]),
        "lang": pa.array(["en"] * 120),
    })
    batch = pa.table({
        "doc_id": pa.array(range(1000, 1055), pa.int64()),
        "text": pa.array([f"doc text {i % 40}" for i in range(30)]
                         + [f"novel {i % 9}" for i in range(25)]),
        "lang": pa.array(["en"] * 55),
    })
    idx = str(tmp_path / "cidx")
    dedup.build_content_index(rd.from_arrow(committed), "doc_id", "text",
                              idx, num_buckets=16)
    kept = (dedup.exact_dedup_incremental(rd.from_arrow(batch), idx)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert kept["doc_id"].dtype == np.int64  # union never pandas-padded

    union = rd.from_arrow(pa.concat_tables([committed, batch]))
    ref = dedup.exact_dedup(union, "text", "doc_id").to_pandas()
    ref = (ref[ref.doc_id >= 1000]
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(kept[["doc_id", "text", "lang"]],
                                  ref[["doc_id", "text", "lang"]])
    assert len(kept) == 9  # the 9 distinct novel texts

    # commit the survivors; the same batch then yields nothing new
    dedup.append_to_content_index(
        rd.from_arrow(pa.Table.from_pandas(kept)), idx)
    again = dedup.exact_dedup_incremental(rd.from_arrow(batch), idx)
    assert again.count() == 0


def test_bloom_dedup_incremental_sharded(tmp_path, monkeypatch):
    """Sharded Bloom incremental dedup (the 10^12-doc path where even the
    distinct-content index is too large): NO false negatives (every
    committed content drops), novel contents survive as min-id
    representatives at tiny fpp, bits shard across multiple ≤cap files
    (forced here via a small shard cap), probing a missing index raises
    on scheme mismatch, and append-then-reingest is idempotent."""
    import json

    from illumio_ray.ops import dedup

    monkeypatch.setattr(dedup, "_BLOOM_SHARD_BITS", 1 << 12)
    committed = pa.table({
        "doc_id": pa.array(range(1500), pa.int64()),
        "text": pa.array([f"committed text number {i}" for i in range(1500)]),
    })
    batch = pa.table({
        "doc_id": pa.array(range(10000, 10700), pa.int64()),
        "text": pa.array([f"committed text number {i}" for i in range(400)]
                         + [f"novel {i % 120}" for i in range(300)]),
    })
    idx = str(tmp_path / "bloom")
    meta = dedup.build_bloom_index(rd.from_arrow(committed), "text", idx,
                                   n_items=4000, fpp=1e-4)
    assert meta["num_shards"] > 1  # the sharded path actually exercised
    assert meta["shards_written"] == meta["num_shards"]

    kept = (dedup.bloom_dedup_incremental(rd.from_arrow(batch), idx,
                                          "text", "doc_id").to_pandas())
    ctexts = set(committed["text"].to_pylist())
    assert not any(t in ctexts for t in kept.text)  # no false negatives
    assert kept.text.is_unique                      # one rep per content
    assert kept.doc_id.dtype == np.int64
    # novel distinct = 120; fp losses at 1e-4 over 120 probes ≈ none, but
    # the CONTRACT is only one-sided — allow a tiny shortfall
    assert 118 <= len(kept) <= 120
    # min-id representative: 'novel 0' appeared first at batch offset 400
    assert int(kept[kept.text == "novel 0"].doc_id.iloc[0]) == 10400

    dedup.append_to_bloom_index(
        rd.from_arrow(pa.Table.from_pandas(kept)), idx, "text")
    again = dedup.bloom_dedup_incremental(rd.from_arrow(batch), idx,
                                          "text", "doc_id")
    assert again.count() == 0

    # scheme guard: a future bit-layout bump must refuse stale indexes
    mp = tmp_path / "bloom" / "_bloom_index_meta.json"
    m = json.loads(mp.read_text())
    m["scheme"] = "ancient-v0"
    mp.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="scheme"):
        dedup.bloom_dedup_incremental(rd.from_arrow(batch), idx,
                                      "text", "doc_id")


def _ref_segment_dedup(docs: pd.DataFrame, k: int):
    """Pure-python keep-first segment dedup reference."""
    segs = []  # (doc_id, seg_idx, seg)
    for _, r in docs.sort_values("doc_id").iterrows():
        toks = r["text"].split(" ")
        for j, i in enumerate(range(0, len(toks), k)):
            segs.append((r["doc_id"], j, " ".join(toks[i:i + k])))
    seen, rows = set(), {}
    for d, j, s in sorted(segs):
        kept = s not in seen
        seen.add(s)
        rows.setdefault(d, []).append((j, s, kept))
    out = []
    for d, lst in rows.items():
        lst.sort()
        kept = [s for _, s, ok in lst if ok]
        out.append((d, " ".join(kept), len(kept), len(lst) - len(kept)))
    return (pd.DataFrame(out, columns=["doc_id", "clean_text", "n_kept",
                                       "n_removed"])
            .sort_values("doc_id").reset_index(drop=True))


def test_segment_dedup_matches_reference_on_random_corpora():
    from illumio_ray.ops import dedup
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → frequent collisions
    for trial in range(3):
        docs = pd.DataFrame({
            "doc_id": range(20),
            "text": [" ".join(rng.choice(vocab, rng.integers(1, 30)))
                     for _ in range(20)]})
        got = (dedup.segment_dedup(rd.from_pandas(docs), "doc_id", "text",
                                   seg_words=4, n_rows=20 * 8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = _ref_segment_dedup(docs, 4)
        pd.testing.assert_frame_equal(
            got.astype({"n_kept": np.int64, "n_removed": np.int64}), want)


def _ref_remove_dup_spans(docs: pd.DataFrame, n: int) -> pd.DataFrame:
    toks = {int(r["doc_id"]): (None if r["text"] is None
                               else r["text"].split(" "))
            for _, r in docs.iterrows()}
    occ: dict[tuple, list] = {}
    for i in sorted(toks):
        ts = toks[i]
        if ts is None:
            continue
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p:p + n]), []).append((i, p))
    cov: dict[int, set] = {}
    for g, os_ in occ.items():
        if len(os_) < 2:
            continue
        for (i, p) in sorted(os_)[1:]:  # keep the globally-first occurrence
            cov.setdefault(i, set()).update(range(p, p + n))
    rows = []
    for i in sorted(toks):
        ts = toks[i]
        if ts is None:
            continue
        c = cov.get(i, set())
        kept = [w for j, w in enumerate(ts) if j not in c]
        rows.append((i, " ".join(kept), len(ts), len(ts) - len(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "clean_text",
                                       "n_tokens", "n_removed"])


def test_remove_dup_spans_matches_reference_on_random_corpora():
    from illumio_ray.ops import dedup
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab → overlapping dups
    for trial in range(3):
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 25)))
                 for _ in range(18)]
        texts += [texts[0], ""]  # a full-doc dup and an empty doc
        docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (dedup.remove_dup_spans(rd.from_pandas(docs), n=3,
                                      n_rows=len(texts) * 8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, _ref_remove_dup_spans(docs, 3))


def test_remove_dup_spans_edges():
    """Null text drops the row; short docs and within-doc overlapping
    repeats follow keep-globally-first with merged spans."""
    from illumio_ray.ops import dedup
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "text": ["m m m m", "p q", None, "a b c m m m"]})
    out = (dedup.remove_dup_spans(rd.from_pandas(docs), n=3, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 4]
    # doc1 "m m m" at pos 0 is the global first; pos 1 dup covers 1..3,
    # doc4's "m m m" at pos 3 covers 3..5
    assert out.loc[0, "clean_text"] == "m"
    assert out.loc[0, "n_removed"] == 3
    assert out.loc[1, "clean_text"] == "p q"
    assert out.loc[2, "clean_text"] == "a b c"
    assert out.loc[2, "n_removed"] == 3


def test_skew_salted_join_equals_plain_join_on_skewed_keys():
    rng = np.random.default_rng(79)
    # one key holds half of all rows — the hot-key case salting exists for
    keys = np.where(rng.random(4000) < 0.5, 7,
                    rng.integers(0, 200, 4000))
    left = pd.DataFrame({"k": keys, "v": rng.normal(size=4000)})
    right = pd.DataFrame({"k": np.arange(200), "lab": [f"r{i}"
                                                       for i in range(200)]})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    salts = rel.suggest_salts(lds, "k", total=len(left), hot_frac=0.01)
    assert 7 in salts and salts[7] >= 2  # the hot key is detected
    assert all(f >= 2 for f in salts.values())
    got = (rel.skew_salted_join(lds, rds, on="k", salt_map=salts)
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = (left.merge(right, on="k").sort_values(["k", "v"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "v", "lab"]], want[["k", "v", "lab"]],
        check_dtype=False)


def test_choose_agg_mode_picks_playbook_modes():
    rng = np.random.default_rng(73)
    n = 60_000
    df = pd.DataFrame({
        "bounded": rng.choice(["a", "b", "c", "d"], n),   # 4 groups
        "mid": rng.integers(0, 10_000, n),  # 10k distinct, ratio ~0.2
        "unique": np.arange(n),             # keys ≈ rows
        "v": rng.normal(size=n)})
    ds = rd.from_pandas(df).repartition(4)
    assert rel.choose_agg_mode(ds, ["bounded"]) == "driver"
    assert rel.choose_agg_mode(ds, ["mid"]) == "shuffle"
    assert rel.choose_agg_mode(ds, ["unique"]) == "bucket"
    # mode="auto" matches the explicit mode's result exactly
    a = rel.grouped_agg(ds, ["bounded"], [("v", "sum", "s")],
                        mode="auto").to_pandas() \
        .sort_values("bounded").reset_index(drop=True)
    b = rel.grouped_agg(ds, ["bounded"], [("v", "sum", "s")],
                        mode="driver").to_pandas() \
        .sort_values("bounded").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_winsorize_by_matches_reference():
    rng = np.random.default_rng(71)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 500),
                       "v": rng.normal(0, 10, 500)})
    df.loc[0, "v"] = 1e6  # extreme outlier gets clipped, not dropped
    out = (rel.winsorize_by(rd.from_pandas(df).repartition(4), "g", "v")
           .to_pandas())
    assert len(out) == len(df)

    def qdisc(s, q):  # quantile_disc: element at 0-indexed rank ceil(nq)-1
        v = np.sort(s.to_numpy())
        return v[max(int(np.ceil(len(v) * q)) - 1, 0)]

    for g, grp in df.groupby("g"):
        lo, hi = qdisc(grp["v"], 0.05), qdisc(grp["v"], 0.95)
        got = out[out.g == g]
        want = grp["v"].clip(lo, hi)
        assert np.allclose(np.sort(got["v_w"].to_numpy()),
                           np.sort(want.to_numpy()))
        assert got["v_w"].max() <= hi and got["v_w"].min() >= lo


def test_canonicalize_urls_messy_inputs():
    from illumio_ray.ops import textops
    cases = {
        "https://Example.COM/a/b/": "https://example.com/a/b",
        "http://www.Site.org:80/x?utm_source=a&q=1#frag":
            "http://site.org/x",
        "https://host.net:443/": "https://host.net",
        "https://host.net:8443/p": "https://host.net:8443/p",
        "HTTPS://WWW.HOST.IO": "https://host.io",
        "http://h.co/p///": "http://h.co/p",
        "ftp://not.http/x": None,  # non-http(s) → null canon
    }
    df = pd.DataFrame({"url": list(cases)})
    out = textops.canonicalize_urls(rd.from_pandas(df)).to_pandas()
    got = dict(zip(out["url"], out["canon_url"]))
    for url, want in cases.items():
        assert got[url] == want or (want is None and pd.isna(got[url])), \
            (url, got[url], want)


def _ref_bpe_train(texts: list[str], n: int):
    alpha = sorted({c for t in texts for c in t if c != " "})
    words = []
    for t in texts:
        words += [list(w) for w in t.split(" ") if w]
    merges: list[tuple[str, str, int]] = []
    ids = {c: i for i, c in enumerate(alpha)}
    for _ in range(n):
        counts: dict = {}
        for w in words:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + 1
        if not counts:
            break
        K = len(alpha) + len(merges) + 1
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1],
                                        ids[kv[0][0]] * K + ids[kv[0][1]]))
        merges.append((a, b, c))
        ids[a + b] = len(alpha) + len(merges) - 1
        words = [_ref_bpe_apply(w, a, b) for w in words]
    return merges, words


def _ref_bpe_apply(w: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return out


def test_bpe_train_and_segment_match_reference():
    from illumio_ray.ops import textops
    rng = np.random.default_rng(67)
    vocab = ["the", "cat", "that", "aaa", "abab", "banana", "thesis"]
    for trial in range(3):
        texts = [" ".join(rng.choice(vocab, rng.integers(1, 8)))
                 for _ in range(12)]
        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts})).repartition(3)
        got = textops.bpe_train(ds, n_merges=6)
        ref_merges, _ = _ref_bpe_train(texts, 6)
        assert [(m["left"], m["right"], m["count"]) for m in got] \
            == ref_merges
        seg = (textops.bpe_segment(ds, got).to_pandas()
               .sort_values("doc_id"))

        def count(t):
            total = 0
            for w in t.split(" "):
                wl = list(w)
                for a, b, _ in ref_merges:
                    wl = _ref_bpe_apply(wl, a, b)
                total += len(wl)
            return total

        assert seg["n_bpe_tokens"].tolist() == [count(t) for t in texts]


def _ref_jaccard_pairs(docs: pd.DataFrame, n: int, threshold: float):
    sets = {}
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].split() if t]
        if len(toks) < n:
            sh = {" ".join(toks)} if toks else set()
        else:
            sh = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        sets[r["doc_id"]] = sh
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            u = len(sets[a] | sets[b])
            if u and len(sets[a] & sets[b]) / u >= threshold:
                out.add((a, b))
    return out


def test_ngram_jaccard_pairs_matches_reference_on_random_corpora():
    from illumio_ray.ops import dedup
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab → shared shingles
    for trial in range(3):
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
                 for _ in range(15)]
        texts += [texts[0], texts[1]]  # guaranteed exact dups
        docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (dedup.ngram_jaccard_pairs(rd.from_pandas(docs), "doc_id",
                                         "text", threshold=0.6,
                                         n_rows=len(texts) * 16)
               .to_pandas())
        assert set(zip(got.id_a, got.id_b)) == _ref_jaccard_pairs(
            docs, 3, 0.6)


def test_corpus_dup_coverage_hand_computed():
    from illumio_ray.ops import textops
    docs = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
        "a b c d e",        # trigram "a b c" repeats in doc1 → covers 0..2
        "a b c x y",        # same → covers 0..2 of 5
        "p q r s t",        # unique trigrams → coverage 0
    ]})
    out = (textops.corpus_dup_ngram_coverage(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id")["dup_cov"])
    assert out[0] == round(3 / 5, 6)
    assert out[1] == round(3 / 5, 6)
    assert out[2] == 0.0


def test_salted_join_equals_plain_join_under_skew():
    rng = np.random.default_rng(31)
    # 90% of left rows share ONE hot key
    keys = np.where(rng.random(400) < 0.9, 7, rng.integers(0, 50, 400))
    left = pd.DataFrame({"k": keys, "x": np.arange(400)})
    right = pd.DataFrame({"k": np.arange(50), "label": [f"L{i}" for i in range(50)]})
    got = (rel.salted_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", num_salts=4)
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    want = (left.merge(right, on="k").sort_values(["k", "x"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "x", "label"]], want[["k", "x", "label"]],
        check_dtype=False)


def test_persisted_ivf_index_recall_and_pruning(tmp_path):
    df = _clustered_embeddings()
    q = np.asarray(df.loc[0, "embedding"], np.float64)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(rd.from_pandas(df), "vec_id", "embedding",
                               idx, n_cells=8)
    exact = similarity.brute_force_topk(
        rd.from_pandas(df), q, 10).to_pandas()
    # exhaustive probe reads every cell → exact
    full = similarity.ivf_index_topk(idx, q, 10, nprobe=8).to_pandas()
    assert list(full.vec_id) == list(exact.vec_id)
    # partial probe: opens fewer cell dirs, still finds the true cluster
    part = similarity.ivf_index_topk(idx, q, 10, nprobe=2).to_pandas()
    recall = len(set(part.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.7, f"IVF index recall too low: {recall}"


def test_grouped_agg_modes_agree_on_random_data():
    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame({
        "k1": rng.integers(0, 900, n),           # ~900 groups ≈ high-card
        "k2": rng.choice(["a", "b", "c"], n),
        "v": rng.standard_normal(n) * 100,
        "w": rng.integers(-50, 50, n).astype(np.int64),
    })
    specs = [("v", "sum", "vsum"), ("v", "min", "vmin"),
             ("w", "max", "wmax"), ("w", "count", "n"),
             ("v", "mean", "vmean")]
    outs = {}
    for mode in ("driver", "shuffle", "bucket"):
        out = (rel.grouped_agg(rd.from_pandas(df), ["k1", "k2"], specs,
                               mode=mode)
               .to_pandas().sort_values(["k1", "k2"])
               .reset_index(drop=True))
        outs[mode] = out[["k1", "k2", "vsum", "vmin", "wmax", "n",
                          "vmean"]]
    for mode in ("shuffle", "bucket"):
        pd.testing.assert_frame_equal(outs[mode], outs["driver"],
                                      check_dtype=False, atol=1e-9)


def test_lev_le1_exhaustive_small_alphabet():
    """_lev_le1 vs a real DP over every string pair of length <= 3 on a
    2-letter alphabet (complete truth table for the fast path)."""
    from itertools import product

    from illumio_ray.ops.dedup import _lev_le1

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, y in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (x != y))
        return dp[-1]

    strs = [""] + ["".join(p) for n in (1, 2, 3)
                   for p in product("ab", repeat=n)]
    for a in strs:
        for b in strs:
            assert _lev_le1(a, b) == (lev(a, b) <= 1), (a, b)


def test_edit_distance_pairs_matches_bruteforce():
    """Deletion-neighborhood banding finds EXACTLY the distance<=1 pairs
    on a random corpus with planted substitutions/indels/dups."""
    from illumio_ray.ops.dedup import _lev_le1, edit_distance_pairs

    rng = np.random.default_rng(7)
    base = ["".join(rng.choice(list("abcdef"), 10)) for _ in range(40)]
    keys = list(base)
    for i, k in enumerate(base[:20]):
        j = int(rng.integers(0, len(k)))
        if i % 3 == 0:
            keys.append(k[:j] + "z" + k[j + 1:])   # substitution
        elif i % 3 == 1:
            keys.append(k[:j] + k[j + 1:])         # deletion
        else:
            keys.append(k)                          # exact dup
    df = pd.DataFrame({"doc_id": np.arange(len(keys), dtype=np.int64),
                       "key": keys})
    got = (edit_distance_pairs(rd.from_pandas(df), "doc_id", "key")
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    want = sorted((i, j) for i in range(len(keys))
                  for j in range(i + 1, len(keys))
                  if _lev_le1(keys[i], keys[j]))
    assert list(map(tuple, got.to_numpy())) == want
    assert len(want) >= 20  # the plant actually produced pairs


def test_brute_force_topk_multi_equals_per_query_single():
    """One multi-query pass returns, for each query, exactly what the
    single-query kernel returns (including the rounded-score, id-asc tie
    order)."""
    rng = np.random.default_rng(11)
    n, d = 300, 16
    mat = rng.standard_normal((n, d)).astype(np.float32)
    mat[50] = mat[10]  # planted exact tie
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(mat)})
    ds = rd.from_pandas(df)
    qids = np.array([3, 10, 77], dtype=np.int64)
    multi = (similarity.brute_force_topk_multi(ds, qids, mat[qids], 7)
             .to_pandas())
    for q in qids:
        got = (multi[multi.qid == q][["vec_id", "score"]]
               .reset_index(drop=True))
        want = (similarity.brute_force_topk(ds, mat[q], 7).to_pandas())
        pd.testing.assert_frame_equal(got, want)


def test_read_events_csv_gz_matches_parquet(tmp_path):
    """CSV.gz ingest with a pinned schema reproduces the parquet table
    exactly (types included) — no inference, decompression inferred from
    the extension, column pruning at parse time."""
    import pyarrow.parquet as pq

    from illumio_ray.sources.csv import read_events_csv

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    df = src.to_pandas()
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    p = tmp_path / "events.csv.gz"
    df.to_csv(p, index=False, compression="gzip")

    got = (read_events_csv(str(p)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = (src.to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    pruned = read_events_csv(str(p), columns=["event_id", "value"])
    assert pruned.schema().names == ["event_id", "value"]


def test_read_orc_matches_parquet(tmp_path):
    """Custom ORC datasource (Ray Data has none): stripe-streamed read
    reproduces the parquet table exactly; column pruning happens at
    decode; multi-stripe files split into multiple yielded tables."""
    import pyarrow.orc as paorc
    import pyarrow.parquet as pq

    from illumio_ray.sources.orc import read_orc

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    d = tmp_path / "orc"
    d.mkdir()
    half = src.num_rows // 2
    paorc.write_table(src.slice(0, half), d / "a.orc")
    paorc.write_table(src.slice(half), d / "b.orc")

    got = (read_orc(str(d)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # ORC's timestamp type is ns-based; values must match after unit cast
    got["ts"] = got["ts"].astype("datetime64[us]")
    want = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns])

    pruned = read_orc(str(d), columns=["event_id", "value"]).to_pandas()
    assert sorted(pruned.columns) == ["event_id", "value"]
    assert len(pruned) == len(want)


def test_read_avro_matches_parquet(tmp_path):
    """Pure-stdlib Avro OCF datasource (no Avro codec anywhere in the
    container): deflate-block roundtrip reproduces the parquet table
    exactly (incl. nulls and timestamp-micros), reads stream block-by-
    block across multiple files, and column pruning happens at decode."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from illumio_ray.sources.avro import read_avro, write_avro

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    # inject nulls to exercise the ["null", T] union branch
    mask = pa.array([i % 7 == 0 for i in range(src.num_rows)])
    src = src.set_column(
        src.column_names.index("value"), "value",
        pc.if_else(mask, pa.nulls(src.num_rows, pa.float64()),
                   src["value"]))
    d = tmp_path / "avro"
    d.mkdir()
    half = src.num_rows // 2
    write_avro(src.slice(0, half), d / "a.avro", block_rows=512)
    write_avro(src.slice(half), d / "b.avro", block_rows=512)

    ds = read_avro(str(d)).materialize()
    # 512-row blocks → each file yields multiple tables (streamed)
    assert ds.num_blocks() >= 2
    got = (ds.to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns])

    pruned = read_avro(str(d), columns=["event_id", "value"]).to_pandas()
    assert sorted(pruned.columns) == ["event_id", "value"]
    assert len(pruned) == len(want)

    # deterministic writer: same table → identical bytes
    write_avro(src.slice(0, half), d / "a2.avro", block_rows=512)
    assert (d / "a.avro").read_bytes() == (d / "a2.avro").read_bytes()


def test_read_avro_array_roundtrip(tmp_path):
    """Avro ARRAY encoding (one item block + 0 terminator) roundtrips
    list<float> embedding vectors — including a null row and an empty
    vector — and decode-time pruning can skip past array fields."""
    import pyarrow.parquet as pq

    from illumio_ray.sources.avro import read_avro, write_avro

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    emb = src["embedding"].combine_chunks().to_pylist()
    emb[3] = None        # row-level null → union branch 0
    emb[7] = []          # empty vector → bare 0 terminator
    src = src.set_column(
        src.column_names.index("embedding"), "embedding",
        pa.array(emb, pa.list_(pa.float32())))
    d = tmp_path / "avro_arr"
    d.mkdir()
    write_avro(src, d / "e.avro", block_rows=128)

    # ragged lists with nulls defeat Ray's tensor-extension pandas cast;
    # compare in Arrow (which is also the hot-path batch format)
    got = pa.concat_tables(
        read_avro(str(d)).iter_batches(batch_size=None,
                                       batch_format="pyarrow")
    ).sort_by("vec_id")
    want = src.sort_by("vec_id")
    assert got["embedding"].to_pylist() == want["embedding"].to_pylist()
    assert got["embedding"].to_pylist()[3] is None
    assert got["vec_id"].to_pylist() == want["vec_id"].to_pylist()
    assert got["label"].to_pylist() == want["label"].to_pylist()

    # pruning a query that skips the array column still walks past it
    pruned = read_avro(str(d), columns=["vec_id", "label"]).to_pandas()
    assert sorted(pruned.columns) == ["label", "vec_id"]
    assert len(pruned) == src.num_rows


def test_read_warc_roundtrip_and_edge_cases(tmp_path):
    """WARC datasource (Common Crawl container, gzip member per record):
    exact (url, warc_ts, html) roundtrip across multiple files including
    empty bodies, payloads containing the CRLFCRLF separator, non-UTF8
    html bytes, and microsecond WARC-Dates; warcinfo records are
    skipped; plain uncompressed .warc and second-granularity dates
    parse; column pruning projects at decode."""
    from illumio_ray.sources.warc import read_warc, write_warc

    t1 = pa.table({
        "url": ["https://a.example.com/x", "http://b.example.org/y?q=1"],
        "warc_ts": pa.array([1727791624878628, 0], pa.int64()).cast(
            pa.timestamp("us")),
        "html": [b"<html><body>hi</body></html>", b""],
    })
    t2 = pa.table({
        "url": ["https://c.io/"],
        "warc_ts": pa.array([1700000000000001], pa.int64()).cast(
            pa.timestamp("us")),
        # body embeds the HTTP header separator AND non-UTF8 bytes:
        # Content-Length framing must carry it through intact
        "html": [b"<html>\xff\xfe\r\n\r\ntrailing</html>"],
    })
    d = tmp_path / "warc"
    d.mkdir()
    assert write_warc(t1, d / "p0.warc.gz") == 2
    assert write_warc(t2, d / "p1.warc.gz") == 1

    got = (read_warc(str(d)).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (pa.concat_tables([t1, t2]).to_pandas()
            .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # deterministic writer: same table → identical bytes (written OUTSIDE
    # the read dir so the pruning read below still sees 3 records)
    write_warc(t1, tmp_path / "p0b.warc.gz")
    assert ((d / "p0.warc.gz").read_bytes()
            == (tmp_path / "p0b.warc.gz").read_bytes())

    # plain .warc (no gzip) + second-granularity WARC-Date both parse
    plain = tmp_path / "plain"
    plain.mkdir()
    raw = gzip_decompress((d / "p1.warc.gz").read_bytes())
    raw = raw.replace(b".000001Z", b"Z")  # WARC 1.0 style, no fraction
    (plain / "p.warc").write_bytes(raw)
    got2 = read_warc(str(plain)).to_pandas()
    assert list(got2["url"]) == ["https://c.io/"]
    assert got2["warc_ts"][0].microsecond == 0

    pruned = read_warc(str(d), columns=["url"]).to_pandas()
    assert list(pruned.columns) == ["url"] and len(pruned) == 3
    with pytest.raises(ValueError, match="unknown WARC columns"):
        read_warc(str(d), columns=["nope"])


def gzip_decompress(b: bytes) -> bytes:
    import gzip as _gz
    import io as _io
    return _gz.GzipFile(fileobj=_io.BytesIO(b)).read()


def test_read_warc_drops_corrupt_members_not_file(tmp_path):
    """Drop-invalid policy at record granularity: a .warc.gz with a
    truncated member, a garbage pseudo-member, and a record with an
    unparseable WARC-Date still yields every healthy record — the reader
    resyncs at the next gzip magic instead of aborting the file."""
    import gzip as _gz

    from illumio_ray.sources.warc import read_warc, write_warc

    good = pa.table({
        "url": [f"https://ok.example/{i}" for i in range(4)],
        "warc_ts": pa.array([1700000000000000 + i for i in range(4)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": [f"<body>doc {i}</body>".encode() for i in range(4)],
    })
    whole = tmp_path / "w.warc.gz"
    write_warc(good, whole)
    blob = whole.read_bytes()
    # split the file into its gzip members (magic-scan is exact here:
    # deterministic payloads contain no 1f 8b 08)
    magic = b"\x1f\x8b\x08"
    starts = []
    i = 0
    while True:
        j = blob.find(magic, i)
        if j < 0:
            break
        starts.append(j)
        i = j + 1
    members = [blob[a:b] for a, b in zip(starts, starts[1:] + [len(blob)])]
    assert len(members) == 5  # warcinfo + 4 responses

    bad_date = _gz.compress(
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/date\r\n"
        b"WARC-Date: not-a-date\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n",
        6, mtime=0)
    corrupted = (members[0] + members[1]
                 + members[2][:len(members[2]) // 2]  # truncated member
                 + members[3]
                 + b"\x1f\x8b\x08garbage-not-gzip"    # fake magic
                 + bad_date
                 + members[4])
    (tmp_path / "c").mkdir()
    (tmp_path / "c" / "mixed.warc.gz").write_bytes(corrupted)

    got = read_warc(str(tmp_path / "c")).to_pandas().sort_values("url")
    # records 0, 2, 3 survive; record 1 (truncated) and the bad-date one drop
    assert list(got.url) == ["https://ok.example/0", "https://ok.example/2",
                             "https://ok.example/3"]
    assert list(got.html) == [b"<body>doc 0</body>", b"<body>doc 2</body>",
                              b"<body>doc 3</body>"]


def test_block_by_domain_suffix_semantics():
    """Suffix blocking: exact domain and subdomains block; a host that
    merely ENDS with the blocked string (notexample.com) does not;
    matching is case/port-insensitive; unparseable urls are kept;
    keep_blocked inverts into the audit view."""
    from illumio_ray.ops import textops

    urls = ["https://example.com/a",          # exact → blocked
            "https://sub.example.com/b",      # subdomain → blocked
            "https://notexample.com/c",       # suffix-string only → kept
            "https://EXAMPLE.com:443/d",      # case+port → blocked
            "not a url",                      # unparseable → kept
            "https://fine.org/e"]
    ds = rd.from_arrow(pa.table({"url": urls}))
    kept = textops.block_by_domain_suffix(ds, ["example.com"]).to_pandas()
    assert sorted(kept.url) == ["https://fine.org/e",
                                "https://notexample.com/c", "not a url"]
    blocked = textops.block_by_domain_suffix(
        ds, ["example.com"], keep_blocked=True).to_pandas()
    assert len(blocked) == 3 and set(blocked.url) | set(kept.url) == set(urls)
    # host_col emits the SAME extraction the filter used (port stripped,
    # lowercase, null when unparseable)
    with_host = textops.block_by_domain_suffix(
        ds, ["example.com"], host_col="h").to_pandas()
    got = dict(zip(with_host.url, with_host.h))
    assert got["https://fine.org/e"] == "fine.org"
    assert got["https://notexample.com/c"] == "notexample.com"
    assert pd.isna(got["not a url"])


def test_warc_codec_property_roundtrip(tmp_path):
    """Hypothesis: ANY binary body (including WARC/HTTP framing bytes,
    CRLFs, gzip magic) and any microsecond timestamp roundtrip the
    write_warc → record-iterator path byte-exactly — Content-Length
    framing, not sentinel scanning, delimits payloads. Codec-level (no
    Ray session needed per example)."""
    import gzip as _gz
    import io as _io

    from hypothesis import HealthCheck, given, settings, strategies as st

    from illumio_ray.sources.warc import (_iter_records, _parse_warc_date,
                                          write_warc)

    body = st.binary(max_size=400)
    ts = st.integers(min_value=0, max_value=4_102_444_800_000_000)  # ≤ 2100

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.tuples(body, ts), min_size=1, max_size=8))
    def check(rows):
        t = pa.table({
            "url": pa.array([f"https://h.example/{i}"
                             for i in range(len(rows))]),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")),
            "html": pa.array([r[0] for r in rows], pa.binary()),
        })
        p = tmp_path / "prop.warc.gz"
        write_warc(t, p)
        stream = _io.BufferedReader(
            _gz.GzipFile(fileobj=_io.BytesIO(p.read_bytes())))
        got = []
        for h, payload in _iter_records(stream):
            if h[b"warc-type"] != b"response":
                continue
            sep = payload.find(b"\r\n\r\n")
            got.append((payload[sep + 4:],
                        _parse_warc_date(h[b"warc-date"])))
        assert got == rows

    check()


def test_upsert_bucketed_replace_by_key_and_vacuum(tmp_path):
    """Keyed upsert rewrites only touched buckets, replaces by key,
    commits via the _HEAD pointer, and vacuum drops dead generations;
    bucketed_join keeps working over the upserted layout."""
    from illumio_ray.ops import bucketing

    layout = tmp_path / "layout"
    nb = 8
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.zeros(100, dtype=np.int64)})
    bucketing.write_bucketed(rd.from_pandas(base), "k", nb, layout)

    upd = pd.DataFrame({"k": np.arange(50, 150, dtype=np.int64),
                        "v": np.ones(100, dtype=np.int64)})
    stats = bucketing.upsert_bucketed(layout, rd.from_pandas(upd), "k", nb)
    assert stats["rows_added"] == 100 and stats["rows_replaced"] == 50

    got = pa.concat_tables(
        [t for b in range(nb)
         if (t := bucketing.read_bucket_live(layout, b)).num_rows]
    ).to_pandas().sort_values("k").reset_index(drop=True)
    got = got[["k", "v"]]
    want = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                         "v": np.concatenate([np.zeros(50, np.int64),
                                              np.ones(100, np.int64)])})
    pd.testing.assert_frame_equal(got, want)

    # co-located join is exact over the upserted layout EVEN BEFORE a
    # vacuum (dead generations are invisible through the _HEAD pointer)
    dim = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                        "name": [f"n{i}" for i in range(150)]})
    dim_dir = tmp_path / "dim"
    bucketing.write_bucketed(rd.from_pandas(dim), "k", nb, dim_dir)
    joined = bucketing.bucketed_join(layout, dim_dir, ["k"], nb).to_pandas()
    assert len(joined) == 150 and set(joined.columns) >= {"k", "v", "name"}

    # dead generations exist until vacuum. With a generous grace period
    # every just-written file is "young" → nothing is removed (the race
    # guard); with no grace the dead generations go and the live view is
    # unchanged.
    assert bucketing.vacuum_bucketed(layout, nb, grace_sec=3600) == 0
    assert bucketing.vacuum_bucketed(layout, nb) > 0
    again = pa.concat_tables(
        [t for b in range(nb)
         if (t := bucketing.read_bucket_live(layout, b)).num_rows])
    assert again.num_rows == 150


def test_tdigest_quantiles_by_accuracy():
    """Grouped t-digest per-key quantiles land within ~2 percentile points
    of exact per-group quantiles on skewed data."""
    from illumio_ray.functions.sketches import tdigest_quantiles_by

    rng = np.random.default_rng(5)
    n = 40_000
    key = rng.choice(["a", "b", "c"], n)
    val = np.where(key == "a", rng.lognormal(0, 1, n),
                   rng.standard_normal(n) * 10)
    df = pd.DataFrame({"k": key, "v": val})
    per = tdigest_quantiles_by(rd.from_pandas(df), "k", "v", [0.5, 0.9])
    for k in ("a", "b", "c"):
        sub = np.sort(df[df.k == k]["v"].to_numpy())
        for q in (0.5, 0.9):
            exact = float(np.quantile(sub, q))
            # rank error tolerance: position of estimate within ±2% ranks
            pos = np.searchsorted(sub, per[k][q]) / len(sub)
            assert abs(pos - q) < 0.02, (k, q, per[k][q], exact, pos)


def test_interval_overlap_join_matches_bruteforce():
    """Grid-cell banding + reporting-cell dedup returns EXACTLY the
    closed-interval overlap pairs, including spans crossing many cells
    (fan-out > 2) and touching endpoints."""
    rng = np.random.default_rng(13)
    n = 200
    cell = 1000

    def mk(seed_off):
        s = rng.integers(0, 20_000, n).astype(np.int64)
        # spans 0..5 cells wide; some zero-length intervals
        e = s + rng.integers(0, 5 * cell, n).astype(np.int64)
        return pd.DataFrame({"id": np.arange(seed_off, seed_off + n,
                                             dtype=np.int64),
                             "s": s, "e": e})

    a, b = mk(0), mk(10_000)
    got = (rel.interval_overlap_join(
        rd.from_pandas(a), rd.from_pandas(b),
        "id", "s", "e", "id", "s", "e", cell_us=cell)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    sa, ea = a["s"].to_numpy()[:, None], a["e"].to_numpy()[:, None]
    sb, eb = b["s"].to_numpy()[None, :], b["e"].to_numpy()[None, :]
    m = (sa <= eb) & (sb <= ea)
    ia, ib = np.nonzero(m)
    want = pd.DataFrame({"id_a": a["id"].to_numpy()[ia],
                         "id_b": b["id"].to_numpy()[ib]}).sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 500  # non-trivial density


def test_pagerank_matches_dense_power_iteration():
    """Distributed PageRank equals a dense numpy power iteration with the
    same damping/iterations/dangling handling, on a random digraph with
    dangling nodes and parallel edges."""
    from illumio_ray.ops.graph import pagerank

    rng = np.random.default_rng(3)
    n = 60
    m = 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # make nodes 55..59 dangling: drop their out-edges
    mask = src < 55
    src, dst = src[mask], dst[mask]
    edges = pd.DataFrame({"src": np.concatenate([src, src[:50]]),
                          "dst": np.concatenate([dst, dst[:50]])})

    eds = rd.from_pandas(edges)
    got = (pagerank(eds, iters=8, mode="broadcast")
           .to_pandas().sort_values("node").reset_index(drop=True))
    # shuffle mode: identical semantics, Dataset-resident ranks
    got_sh = (pagerank(eds, iters=8, mode="shuffle")
              .to_pandas().sort_values("node").reset_index(drop=True))
    np.testing.assert_allclose(got_sh["rank"], got["rank"], atol=1e-13)
    # normalize: rank × N, both modes
    got_nm = (pagerank(eds, iters=8, mode="broadcast", normalize=True)
              .to_pandas().sort_values("node").reset_index(drop=True))
    np.testing.assert_allclose(got_nm["rank"], got["rank"] * len(got),
                               rtol=1e-12)

    # dense reference
    uniq = set(zip(src.tolist(), dst.tolist()))
    A = np.zeros((n, n))
    for s, d in uniq:
        A[s, d] = 1.0
    out = A.sum(axis=1)
    P = np.divide(A, out[:, None], out=np.zeros_like(A),
                  where=out[:, None] > 0)
    nodes_present = sorted({*src.tolist(), *dst.tolist()})
    idx = np.array(nodes_present)
    N = len(nodes_present)
    r = np.full(n, 0.0); r[idx] = 1.0 / N
    d = 0.85
    dangling = (out == 0)
    present = np.zeros(n, bool); present[idx] = True
    for _ in range(8):
        D = r[dangling & present].sum()
        r_new = np.zeros(n)
        r_new[idx] = (1 - d) / N + d * (P.T @ r)[idx] + d * D / N
        r = r_new
    want = pd.DataFrame({"node": idx.astype(np.int64), "rank": r[idx]})
    merged = got.merge(want, on="node", suffixes=("_got", "_want"))
    assert len(merged) == N
    np.testing.assert_allclose(merged["rank_got"], merged["rank_want"],
                               atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_zorder_layout_prunes_on_both_columns(tmp_path):
    """A z-ordered layout skips most row groups for a narrow predicate on
    EITHER interleaved column; a single-column sort only prunes its own
    column. Correctness: the layout holds exactly the input rows."""
    from illumio_ray.ops import zorder

    rng = np.random.default_rng(17)
    n = 200_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 1024, n).astype(np.int64),
        "t": rng.integers(0, 1_000_000, n).astype(np.int64),
        "v": rng.standard_normal(n),
    })

    zdir = tmp_path / "bycurve"
    zorder.write_zordered(rd.from_pandas(df), ["user_id", "t"], zdir,
                          num_files=32)
    tdir = tmp_path / "bytime"
    rd.from_pandas(df).sort("t").repartition(32).write_parquet(str(tdir))

    # same rows either way
    got = rd.read_parquet(str(zdir)).to_pandas()
    assert len(got) == n and int(got["user_id"].sum()) == int(
        df["user_id"].sum())

    # ~1/64 slice of each dimension
    z_user = zorder.fraction_scanned(zdir, "user_id", 512, 527)
    z_time = zorder.fraction_scanned(zdir, "t", 500_000, 515_625)
    t_user = zorder.fraction_scanned(tdir, "user_id", 512, 527)
    t_time = zorder.fraction_scanned(tdir, "t", 500_000, 515_625)

    assert t_time <= 0.10          # time-sorted prunes time...
    assert t_user >= 0.90          # ...but scans everything for user
    assert z_user <= 0.55          # z-order prunes BOTH dimensions
    assert z_time <= 0.55
    assert z_user < t_user / 2 and z_time < 0.9


def test_snapshot_diff_classifies_and_drops_unchanged():
    old = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4],
        "v": pa.array([10, 20, 30, None], pa.int64())}))
    new = rd.from_arrow(pa.table({
        "k": [2, 3, 4, 5],
        "v": pa.array([20, 31, 40, 50], pa.int64())}))
    out = rel.snapshot_diff(old, new, keys=["k"], compare=["v"]).to_pandas()
    by_k = {int(r.k): r for r in out.itertuples()}
    assert set(by_k) == {1, 3, 4, 5}      # k=2 unchanged → dropped
    assert by_k[1].status == "removed"
    assert by_k[3].status == "changed" and by_k[3].new_v == 31
    assert by_k[4].status == "changed"    # null → value is a change
    assert by_k[5].status == "added" and by_k[5].new_v == 50


def test_grouped_linreg_matches_polyfit():
    rng = np.random.default_rng(7)
    n = 5000
    g = rng.integers(0, 3, n)
    x = rng.uniform(0, 50, n)
    y = np.where(g == 0, 3.0 * x + 7.0,
                 np.where(g == 1, -2.0 * x + 100.0, 0.5 * x)) \
        + rng.normal(0, 0.5, n)
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y})
                       ).repartition(8)
    out = rel.grouped_linreg(ds, ["g"], "x", "y", ndigits=4).to_pandas()
    for grp in range(3):
        slope, intercept = np.polyfit(x[g == grp], y[g == grp], 1)
        row = out[out.g == grp].iloc[0]
        assert abs(row.slope - slope) < 1e-3, (grp, row.slope, slope)
        assert abs(row.intercept - intercept) < 1e-3


def test_compression_ratio_orders_repetitive_below_prose():
    from illumio_ray.ops import textops

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": pa.array(["spam " * 400,
                          "A genuinely varied sentence about web-scale "
                          "data pipelines, entropy, and parquet files. "
                          "每个文档 different words avoid repetition "
                          "entirely through unique vocabulary items.",
                          None], pa.string())}))
    out = textops.add_compression_ratio(docs).to_pandas() \
        .set_index("doc_id").compression_ratio
    assert out[1] < 0.1 < out[2]
    assert np.isnan(out[3])


def test_weighted_sample_matches_local_ares_and_prefers_heavy_rows():
    import hashlib

    ids = np.arange(2000)
    w = np.where(ids < 100, 1000.0, 0.001)  # first 100 rows ~always win
    ds = rd.from_arrow(pa.table({"id": ids, "w": w})).repartition(8)
    got = rel.weighted_sample(ds, "id", "w", k=50).to_pandas()
    u = np.array([(int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                   + 0.5) / 2**32 for v in ids])
    expect = set(ids[np.argsort(np.log(u) / w)[::-1][:50]])
    assert set(got.id) == expect
    assert (got.id < 100).all()  # ∝-weight: heavy rows dominate


def test_bucketed_lookup_prunes_to_probed_buckets(tmp_path):
    from illumio_ray.functions.hashing import stable_hash64
    from illumio_ray.ops import bucketing

    k = 8
    t = pa.table({"key": np.arange(500, dtype=np.int64),
                  "val": np.arange(500, dtype=np.int64) * 10})
    bucketing.write_bucketed(rd.from_arrow(t), "key", k,
                             tmp_path / "layout")
    probes = [3, 77, 481]
    out = bucketing.bucketed_lookup(tmp_path / "layout", "key", probes,
                                    num_buckets=k).to_pandas()
    assert sorted(out.key) == probes
    assert (out.val == out.key * 10).all()
    # the lookup opens exactly the buckets the probes hash to
    touched = set((stable_hash64(pa.array(probes)) % np.uint64(k)).tolist())
    assert out["__bucket"].nunique() if "__bucket" in out else True
    assert len(set(out.key)) == 3 and len(touched) <= 3


def test_bucketed_lookup_columns_may_omit_key(tmp_path):
    from illumio_ray.ops import bucketing

    t = pa.table({"key": np.arange(100, dtype=np.int64),
                  "val": np.arange(100, dtype=np.int64) * 10})
    bucketing.write_bucketed(rd.from_arrow(t), "key", 4, tmp_path / "lay")
    out = bucketing.bucketed_lookup(tmp_path / "lay", "key", [5, 42],
                                    num_buckets=4,
                                    columns=["val"]).to_pandas()
    assert sorted(out.columns) == ["val"]
    assert sorted(out.val) == [50, 420]


def test_exact_quantile_all_null_returns_nan():
    ds = rd.from_arrow(pa.table({"value": pa.array([None, None, None],
                                                   pa.float64())}))
    for fn in (rel.exact_quantile_disc, rel.exact_quantile_cont):
        got = fn(ds, "value", [0.5, 0.9])
        assert len(got) == 2 and all(np.isnan(x) for x in got)


def test_interval_overlap_join_rejects_inverted_interval():
    left = pd.DataFrame({"id": [1], "s": [100], "e": [50]})   # e < s
    right = pd.DataFrame({"rid": [2], "s": [0], "e": [200]})
    with pytest.raises(Exception, match="inverted interval"):
        rel.interval_overlap_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "id", "s", "e", "rid", "s", "e",
            cell_us=60).materialize()


def test_edit_distance_pairs_null_keys_match_nothing():
    from illumio_ray.ops.dedup import edit_distance_pairs
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "key": [None, None, "a", "ab"]})
    got = (edit_distance_pairs(rd.from_pandas(df), "doc_id", "key")
           .to_pandas().sort_values(["id_a", "id_b"]))
    # nulls pair with nothing (SQL NULL semantics); "a"~"ab" at distance 1
    assert got[["id_a", "id_b"]].values.tolist() == [[3, 4]]


def test_exact_quantile_disc_matches_rank_rule():
    rng = np.random.default_rng(3)
    # duplicates + skew to stress bucket collapse and rank bookkeeping
    v = np.concatenate([rng.lognormal(0, 2, 6000).round(2),
                        np.full(2000, 7.77)])
    ds = rd.from_arrow(pa.table({"value": v})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = rel.exact_quantile_disc(ds, "value", qs,
                                  collect_limit=100, num_bins=64)
    srt = np.sort(v)
    for q, g in zip(qs, got):
        expect = srt[max(0, int(np.ceil(len(v) * q)) - 1)]
        assert g == expect, (q, g, expect)


def test_exact_quantile_disc_by_matches_rank_rule_per_group():
    rng = np.random.default_rng(5)
    g = np.repeat(["a", "b", "c"], 3000)
    v = np.concatenate([rng.normal(10, 2, 3000).round(3),
                        rng.lognormal(1, 1, 3000).round(3),
                        np.full(3000, 4.5)])  # constant group → collapse
    ds = rd.from_arrow(pa.table({"k": g, "value": v})).repartition(8)
    out = rel.exact_quantile_disc_by(ds, "k", "value", 0.5,
                                     collect_limit=50, num_bins=32)
    df = out.to_pandas().set_index("k").q50
    for grp in ["a", "b", "c"]:
        vals = np.sort(v[g == grp])
        expect = vals[max(0, int(np.ceil(len(vals) * 0.5)) - 1)]
        assert df[grp] == expect, (grp, df[grp], expect)


def test_exact_quantile_cont_matches_numpy_linear():
    rng = np.random.default_rng(9)
    v = rng.lognormal(2, 1, 7000).round(4)
    ds = rd.from_arrow(pa.table({"value": v})).repartition(8)
    qs = [0.25, 0.5, 0.95]
    got = rel.exact_quantile_cont(ds, "value", qs,
                                  collect_limit=100, num_bins=64)
    for q, g in zip(qs, got):
        assert abs(g - np.quantile(v, q, method="linear")) < 1e-9


def test_grouped_string_agg_sorted_lists_across_blocks():
    rng = np.random.default_rng(13)
    k = rng.integers(0, 50, 2000)
    v = rng.permutation(2000)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(8)
    out = rel.grouped_string_agg(ds, "k", "v", out="vs").to_pandas()
    df = pd.DataFrame({"k": k, "v": v})
    expect = df.sort_values("v").groupby("k")["v"].agg(
        lambda s: ",".join(map(str, s)))
    assert len(out) == len(expect)
    got = out.set_index("k")["vs"]
    for grp in expect.index:
        assert got[grp] == expect[grp]


def test_chunk_word_windows_overlap_and_coverage():
    from illumio_ray.ops import textops

    text = " ".join(f"w{i}" for i in range(100))
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                 "text": pa.array([text, "solo", None],
                                                  pa.string())}))
    out = (textops.chunk_word_windows(ds, size=50, stride=40)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_id) == [0, 1, 2]
    assert d1.iloc[0].chunk.split(" ")[0] == "w0"
    assert d1.iloc[1].chunk.split(" ")[0] == "w40"   # overlap of 10
    assert d1.iloc[0].chunk.split(" ")[-1] == "w49"
    assert d1.iloc[2].chunk == " ".join(f"w{i}" for i in range(80, 100))
    assert list(out[out.doc_id == 2].chunk) == ["solo"]
    assert 3 not in set(out.doc_id)  # NULL text dropped


def test_validation_gate_annotate_split_report():
    """Declarative expectations: per-rule vectorized violation masks,
    concat_ws-style reasons, split into valid/quarantine, bounded
    report counts, and the cross-row unique-key check."""
    from illumio_ray.ops import validate as val

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 5], pa.int64()),
        "kind": pa.array(["a", "b", "zz", "a", None, "a"]),
        "v": pa.array([1.0, 150.0, 50.0, None, 5.0, 1.0]),
        "s": pa.array(["{x}", "{y}", "nope", "{z}", "{w}", "{q}"]),
    })
    rules = [
        val.Rule("kind_enum", "kind", "enum", {"values": ["a", "b"]}),
        val.Rule("v_range", "v", "range", {"lo": 0.0, "hi": 100.0}),
        val.Rule("s_obj", "s", "regex", {"pattern": r"^\{"}),
        val.Rule("kind_nn", "kind", "not_null"),
    ]
    ds = rd.from_arrow(t)

    ann = val.annotate(ds, rules).to_pandas().sort_values("id")
    # row 3: enum + regex both violated, reasons in declaration order
    bad3 = ann[ann.id == 3].iloc[0]
    assert not bad3.is_valid and bad3.reasons == "kind_enum,s_obj"
    # null v passes the range check; null kind violates enum? no —
    # nulls only fail not_null (SQL semantics)
    r4 = ann[ann.id == 4].iloc[0]
    assert r4.is_valid and r4.reasons == ""
    r5s = ann[ann.id == 5]
    assert set(r5s.is_valid) == {True, False}
    assert list(r5s[~r5s.is_valid].reasons) == ["kind_nn"]

    valid, quar = val.split(ds, rules)
    vd, qd = valid.to_pandas(), quar.to_pandas()
    assert sorted(vd.id) == [1, 4, 5]  # ids 5,5 -> one valid (kind 'a')
    assert sorted(qd.id) == [2, 3, 5]
    assert "reasons" in qd.columns and "is_valid" not in qd.columns

    rep = val.report(ds, rules).to_pandas().set_index("rule")
    assert rep.loc["kind_enum", "violations"] == 1
    assert rep.loc["v_range", "violations"] == 1
    assert rep.loc["s_obj", "violations"] == 1
    assert rep.loc["kind_nn", "violations"] == 1
    assert rep.loc["__valid_rows", "violations"] == 3
    assert (rep.n_rows == 6).all()

    assert val.unique_violations(ds, ["id"]) == 1
    assert val.unique_violations(ds, ["id", "s"]) == 0


def test_term_index_search_and_or(tmp_path):
    """Inverted-index layout: AND/OR term search matches a brute-force
    tokenization, probes only term buckets, and refuses a stale scheme."""
    import json

    from illumio_ray.ops import search

    docs = {1: "Apple banana cherry", 2: "banana cherry", 3: "apple!",
            4: "cherry apple BANANA banana", 5: "durian"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    layout = tmp_path / "idx"
    search.build_term_index(ds, "doc_id", "text", layout, num_buckets=8)

    def brute(terms, mode):
        import re

        toks = {d: set(t.lower().replace("!", " ").split())
                for d, t in docs.items()}
        canon = {c for t in terms
                 for c in re.split(r"[^a-z0-9]+", t.lower()) if c}
        if mode == "and":
            return sorted(d for d, s in toks.items()
                          if all(x in s for x in canon))
        return sorted(d for d, s in toks.items()
                      if any(x in s for x in canon))

    for terms, mode in [(["apple", "banana"], "and"),
                        (["apple", "banana"], "or"),
                        (["cherry"], "and"),
                        (["durian", "apple"], "and"),
                        (["missing"], "and"),
                        # probes are canonicalized with the index's
                        # tokenization: "Apple!" == "apple"
                        (["Apple!"], "and"),
                        # duplicate probe terms must not break the
                        # count==len(terms) intersection
                        (["apple", "apple", "banana"], "and")]:
        got = sorted(search.search_terms(layout, terms, mode)
                     ["doc_id"].to_pylist())
        assert got == brute(set(terms), mode), (terms, mode)

    meta = json.loads((layout / "_meta.json").read_text())
    meta["scheme"] = "other-v0"
    (layout / "_meta.json").write_text(json.dumps(meta))
    try:
        search.search_terms(layout, ["apple"])
        raise AssertionError("stale scheme accepted")
    except ValueError as e:
        assert "rebuild" in str(e)


def test_watermark_late_rows_and_report():
    """Watermark semantics: unit 0 never late; a row is late iff its
    event ts is older than (prefix-max ts of PRIOR units − lateness);
    the unit's own max never affects its own rows."""
    from illumio_ray.ops import streaming

    def us(sec):
        return np.datetime64("2024-01-01", "us") + np.timedelta64(
            int(sec * 1_000_000), "us")

    rows = [  # (unit, ts_sec)
        (0, 100), (0, 50),          # first unit: no watermark yet
        (1, 101), (1, 94), (1, 89),  # wm before 1 = 100-10=90 → 89 late
        (2, 30), (2, 200),           # wm before 2 = 101-10=91 → 30 late
        (3, 150),                    # wm before 3 = 200-10=190 → late
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([us(r[1]) for r in rows], pa.timestamp("us")),
    })
    ds = rd.from_arrow(t)
    flagged = (streaming.flag_late_rows(ds, "ts", "u", lateness_sec=10.0)
               .to_pandas().sort_values(["u", "ts"]))
    assert list(flagged.is_late) == [
        False, False,        # unit 0: ts 50,100 — no watermark yet
        True, False, False,  # unit 1 (wm 90): ts 89 late; 94,101 fine
        True, False,         # unit 2 (wm 91): ts 30 late; 200 fine
        True,                # unit 3 (wm 190): ts 150 late
    ]

    rep = (streaming.late_report(ds, "ts", "u", lateness_sec=10.0)
           .to_pandas().sort_values("u"))
    assert list(rep.n_late) == [0, 1, 1, 1]
    assert list(rep.n_rows) == [2, 3, 2, 1]


def test_export_training_shards_exactly_once_and_resume(tmp_path):
    """Corpus export: every doc lands in exactly one shard file, every
    bin respects the token budget, the manifest is the commit point,
    and a crash after staging re-runs only the missing shards."""
    import json

    import pyarrow.parquet as pq

    from illumio_ray.pipelines.export import export_training_shards

    n = 200
    rng = np.random.RandomState(7)
    docs = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(n)]),
        "n_tokens": pa.array(rng.randint(1, 90, n).astype(np.int64)),
    })
    out = tmp_path / "export"
    stats = export_training_shards(rd.from_arrow(docs), out,
                                   num_shards=3, pack_budget=128)
    assert [s["shard"] for s in stats] == [0, 1, 2]
    assert sum(s["n_docs"] for s in stats) == n

    seen: list[int] = []
    for s in stats:
        t = pq.read_table(out / f"shard-{s['shard']:05d}.parquet")
        assert t.num_rows == s["n_docs"]
        seen.extend(t["doc_id"].to_pylist())
        df = t.to_pandas()
        bin_sums = df.groupby("bin_id").n_tokens.sum()
        assert (bin_sums <= 128).all()
        assert len(bin_sums) == s["n_bins"]
        assert int(df.n_tokens.sum()) == s["n_tokens"]
    assert sorted(seen) == list(range(n))  # exactly once across shards

    # completed export: second call is a manifest no-op
    again = export_training_shards(rd.from_arrow(docs), out,
                                   num_shards=3, pack_budget=128)
    assert again == stats

    # crash simulation: staging committed, shard 1 not — resume rebuilds
    # ONLY shard 1 (other shard files untouched)
    (out / "_manifest.json").unlink()
    (out / "shard-00001.json").unlink()
    (out / "shard-00001.parquet").unlink()
    mtime0 = (out / "shard-00000.parquet").stat().st_mtime_ns
    resumed = export_training_shards(rd.from_arrow(docs), out,
                                     num_shards=3, pack_budget=128)
    assert resumed == stats
    assert (out / "shard-00001.parquet").exists()
    assert (out / "shard-00000.parquet").stat().st_mtime_ns == mtime0
    assert json.loads((out / "_manifest.json").read_text())[
        "shards"] == stats


def test_pq_topk_recall_and_compression():
    """Product quantization: 32x-compressed codes + ADC scoring recover
    most of the exact top-k on clustered data; codes are m uint8."""
    rng = np.random.default_rng(11)
    q = rng.standard_normal(32)
    near = q[None, :] + 0.05 * rng.standard_normal((10, 32))
    far = rng.standard_normal((300, 32)) * 3
    vecs = np.vstack([near, far])
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = rd.from_pandas(df)

    codec = similarity.PQCodec(vecs, m=8, k=64)
    assert codec.codebooks.shape == (8, 64, 4)
    codes = similarity.add_pq_codes(ds, codec).materialize()
    sch = codes.schema()
    base = getattr(sch, "base_schema", sch)
    assert base.field("pq_code").type == pa.list_(pa.uint8(), 8)  # 8 B/vec

    exact = set(similarity.brute_force_topk(ds, q, 10).to_pandas().vec_id)
    approx = set(similarity.pq_topk_codes(codes, codec, q, 10)
                 .to_pandas().vec_id)
    assert exact == set(range(10))
    recall = len(exact & approx) / 10
    assert recall >= 0.7, f"PQ recall too low: {recall}"

    # ADC score equals the reconstructed-vector inner product
    lut = codec.lut(q)
    c0 = codec.encode(vecs[:1])[0]
    recon = np.concatenate([codec.codebooks[j, c0[j]] for j in range(8)])
    qn = q / np.linalg.norm(q)
    assert abs(lut[np.arange(8), c0].sum() - recon @ qn) < 1e-9


def test_ivfpq_topk_recall():
    """IVF cell pruning + PQ ADC combined still recovers the clustered
    neighbors (approximate twice over)."""
    rng = np.random.default_rng(23)
    q = rng.standard_normal(32)
    near = q[None, :] + 0.05 * rng.standard_normal((10, 32))
    far = rng.standard_normal((400, 32)) * 3
    vecs = np.vstack([near, far])
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = rd.from_pandas(df)
    exact = set(similarity.brute_force_topk(ds, q, 10).to_pandas().vec_id)
    approx = set(similarity.ivfpq_topk(ds, q, 10, n_cells=8, nprobe=3,
                                       m=8, pq_k=32).to_pandas().vec_id)
    assert exact == set(range(10))
    recall = len(exact & approx) / 10
    assert recall >= 0.7, f"IVFPQ recall too low: {recall}"


def test_bm25_search_matches_bruteforce(tmp_path):
    """BM25 from posting rows == the textbook formula computed by hand;
    docs matching no probe term are absent."""
    import math

    from illumio_ray.ops import search

    docs = {1: "apple banana apple", 2: "banana cherry",
            3: "durian", 4: "apple apple apple banana cherry"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    layout = tmp_path / "idx"
    search.build_term_index(ds, "doc_id", "text", layout, num_buckets=4)

    terms = ["apple", "cherry"]
    got = (search.bm25_search(layout, terms).to_pandas()
           .set_index("doc_id").bm25.to_dict())
    assert set(got) == {1, 2, 4}  # doc 3 matches neither term

    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / n
    k1, b = 1.2, 0.75
    for d in (1, 2, 4):
        want = 0.0
        for t in terms:
            tf = toks[d].count(t)
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            dl = len(toks[d])
            want += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl))
        assert abs(got[d] - round(want, 6)) < 2e-6, (d, got[d], want)


def test_export_reshard_restages_and_drops_stale_files(tmp_path):
    """Resume with a DIFFERENT num_shards must restage and remove every
    stale shard artifact — no phantom files beside the new manifest."""
    import pyarrow.parquet as pq

    from illumio_ray.pipelines.export import export_training_shards

    docs = pa.table({
        "doc_id": pa.array(np.arange(90, dtype=np.int64)),
        "text": pa.array([f"d{i}" for i in range(90)]),
        "n_tokens": pa.array((np.arange(90) % 40 + 1).astype(np.int64)),
    })
    out = tmp_path / "export"
    export_training_shards(rd.from_arrow(docs), out,
                           num_shards=3, pack_budget=96)
    # crash before manifest, then re-export with a different split
    (out / "_manifest.json").unlink()
    stats = export_training_shards(rd.from_arrow(docs), out,
                                   num_shards=2, pack_budget=96)
    assert [s["shard"] for s in stats] == [0, 1]
    files = sorted(p.name for p in out.glob("shard-*.parquet"))
    assert files == ["shard-00000.parquet", "shard-00001.parquet"]
    got = pa.concat_tables(
        pq.read_table(out / f) for f in files)
    assert sorted(got["doc_id"].to_pylist()) == list(range(90))


def test_term_index_segment_append_equivalence(tmp_path):
    """Lucene-style segment appends: an index built in two appends gives
    IDENTICAL AND/OR search results and BM25 scores to a single-segment
    build over the same corpus; the listing file is the commit point."""
    import json

    from illumio_ray.ops import search

    docs = {i: f"apple banana w{i} " + ("cherry " * (i % 3))
            for i in range(1, 21)}

    def mk(ids):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(list(ids), pa.int64()),
            "text": pa.array([docs[i] for i in ids]),
        }))

    single = tmp_path / "one"
    search.build_term_index(mk(range(1, 21)), "doc_id", "text", single,
                            num_buckets=4)
    seg = tmp_path / "seg"
    search.append_term_index(seg, mk(range(1, 11)), num_buckets=4)
    search.append_term_index(seg, mk(range(11, 21)), num_buckets=8)
    assert json.loads((seg / "_segments.json").read_text())["segments"] \
        == ["segment-000", "segment-001"]

    for terms, mode in [(["apple", "cherry"], "and"), (["cherry"], "or")]:
        a = sorted(search.search_terms(single, terms, mode)
                   ["doc_id"].to_pylist())
        b = sorted(search.search_terms(seg, terms, mode)
                   ["doc_id"].to_pylist())
        assert a == b and a, (terms, mode)

    one = (search.bm25_search(single, ["apple", "cherry"]).to_pandas()
           .set_index("doc_id").bm25.to_dict())
    two = (search.bm25_search(seg, ["apple", "cherry"]).to_pandas()
           .set_index("doc_id").bm25.to_dict())
    assert one == two  # corpus stats sum across segments exactly


def test_merge_bucketed_additive_and_token_idempotent(tmp_path):
    """Additive aggregate maintenance: counters SUM with live rows per
    key (new keys insert), only touched buckets rewrite, and re-merging
    the SAME token (task retry / crash rerun) folds the delta exactly
    once; a new token folds again."""
    import pyarrow.parquet as pq

    from illumio_ray.ops import bucketing

    base = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "n": pa.array([10, 20, 30], pa.int64()),
                     "v": pa.array([1.0, 2.0, 3.0], pa.float64())})
    lay = tmp_path / "agg"
    bucketing.write_bucketed(rd.from_arrow(base), "k", 8, lay)

    delta = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                      "n": pa.array([5, 5, 5], pa.int64()),
                      "v": pa.array([0.5, 0.5, 0.5], pa.float64())})
    r1 = bucketing.merge_bucketed(lay, rd.from_arrow(delta), "k", 8,
                                  ["n", "v"], token="batch-001")
    assert r1["buckets_skipped"] == 0

    def live() -> dict:
        rows = {}
        for b in range(8):
            t = bucketing.read_bucket_live(lay, b)
            for r in t.to_pylist():
                rows[r["k"]] = (r["n"], round(r["v"], 9))
        return rows

    want = {1: (10, 1.0), 2: (25, 2.5), 3: (35, 3.5), 4: (5, 0.5)}
    assert live() == want

    # same token again → every touched bucket skips, totals unchanged
    r2 = bucketing.merge_bucketed(lay, rd.from_arrow(delta), "k", 8,
                                  ["n", "v"], token="batch-001")
    assert r2["buckets_skipped"] == r2["buckets_touched"] > 0
    assert live() == want

    # a NEW token folds the delta once more
    bucketing.merge_bucketed(lay, rd.from_arrow(delta), "k", 8,
                             ["n", "v"], token="batch-002")
    after_two = {1: (10, 1.0), 2: (30, 3.0), 3: (40, 4.0), 4: (10, 1.0)}
    assert live() == after_two

    # replaying an EARLIER delta after later merges also skips: the
    # applied-token ledger in _HEAD remembers every folded token, not
    # just the latest (daemon crash-recovery replaying its ledger)
    r3 = bucketing.merge_bucketed(lay, rd.from_arrow(delta), "k", 8,
                                  ["n", "v"], token="batch-001")
    assert r3["buckets_skipped"] == r3["buckets_touched"] > 0
    assert live() == after_two


def test_merge_bucketed_gen_rename_crash_window_is_retry_safe(tmp_path):
    """A crash (or Ray task retry) BETWEEN the gen-file rename and the
    _HEAD commit must not double-count: in a bucket with no _HEAD (plain
    write_bucketed base — exactly how q1_incremental_refresh seeds its
    layout), the renamed-but-uncommitted gen file is invisible to
    readers, so the retry recomputes base+delta from base, not from
    base+delta."""
    import pyarrow.parquet as pq

    from illumio_ray.ops import bucketing

    base = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "n": pa.array([10, 20, 30], pa.int64())})
    delta = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "n": pa.array([1, 1, 1], pa.int64())})
    lay = tmp_path / "agg"
    bucketing.write_bucketed(rd.from_arrow(base), "k", 4, lay)

    # simulate the crash window: the crashed task's MERGED output
    # (base+delta) exists under its gen name in every touched bucket,
    # but no _HEAD was ever committed
    from illumio_ray.functions.hashing import stable_hash64

    dbuckets = (stable_hash64(delta["k"]) % np.uint64(4)).astype(int)
    for b in sorted(set(dbuckets)):
        bdir = lay / f"__bucket={b}"
        t = bucketing.read_bucket(lay, b)
        both = pa.concat_tables(
            [t, delta.filter(pa.array(dbuckets == b))]) if t.num_rows \
            else delta.filter(pa.array(dbuckets == b))
        merged = both.group_by(["k"]).aggregate([("n", "sum")])
        bdir.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table({"k": merged["k"], "n": merged["n_sum"]}),
            bdir / "gen-batch-001.parquet")
        # uncommitted gen output is invisible: live view is still base
        assert bucketing.read_bucket_live(lay, b).to_pydict() == \
            t.to_pydict()

    # the retry (same token, same delta) folds the delta exactly once
    bucketing.merge_bucketed(lay, rd.from_arrow(delta), "k", 4,
                             ["n"], token="batch-001")
    rows = {}
    for b in range(4):
        for r in bucketing.read_bucket_live(lay, b).to_pylist():
            rows[r["k"]] = r["n"]
    assert rows == {1: 11, 2: 21, 3: 31}

    # vacuum clears committed-generation leftovers AND any crash debris
    # in no-_HEAD buckets without changing the live view
    bucketing.vacuum_bucketed(lay, 4)
    rows2 = {}
    for b in range(4):
        for r in bucketing.read_bucket_live(lay, b).to_pylist():
            rows2[r["k"]] = r["n"]
    assert rows2 == rows


def test_skyline_matches_bruteforce_with_ties_and_nulls():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "rid": np.arange(n),
        # small int domains force ties AND duplicate (a, b) tuples
        "a": rng.integers(0, 12, n).astype(float),
        "b": rng.integers(0, 12, n).astype(float),
    })
    df.loc[rng.choice(n, 10, replace=False), "a"] = np.nan
    arr = df[["a", "b"]].to_numpy()
    keep = []
    for i in range(n):
        if np.isnan(arr[i]).any():
            continue  # null rows drop (SQL comparison semantics)
        dominated = False
        for j in range(n):
            if j == i or np.isnan(arr[j]).any():
                continue
            if (arr[j] >= arr[i]).all() and (arr[j] > arr[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    ds = rd.from_pandas(df.astype({"rid": "int64"})).repartition(5)
    got = rel.skyline(ds, ["a", "b"]).to_pandas()
    assert sorted(got.rid) == sorted(df.rid[keep])
    # duplicates of a frontier tuple all survive (no strict dominance)
    dup_mask = df.loc[keep].duplicated(subset=["a", "b"], keep=False)
    if dup_mask.any():
        assert set(df.rid[keep][dup_mask]) <= set(got.rid)


def test_skyline_minimize_and_3d():
    rng = np.random.default_rng(11)
    n = 200
    df = pd.DataFrame({
        "rid": np.arange(n),
        "x": rng.integers(0, 8, n).astype(float),
        "y": rng.integers(0, 8, n).astype(float),
        "z": rng.integers(0, 8, n).astype(float),
    })
    arr = df[["x", "y", "z"]].to_numpy()
    sgn = np.array([1.0, -1.0, 1.0])   # maximize x, MINIMIZE y, maximize z
    eff = arr * sgn
    keep = [i for i in range(n)
            if not any((eff[j] >= eff[i]).all() and (eff[j] > eff[i]).any()
                       for j in range(n) if j != i)]
    got = rel.skyline(rd.from_pandas(df).repartition(4), ["x", "y", "z"],
                      maximize=[True, False, True]).to_pandas()
    assert sorted(got.rid) == sorted(df.rid[keep])


def test_triangle_stats_matches_bruteforce():
    from itertools import combinations

    from illumio_ray.ops import graph

    rng = np.random.default_rng(13)
    # random basket data: 40 groups, items drawn from 25
    rows = []
    for g in range(40):
        items = rng.choice(25, size=rng.integers(1, 7), replace=False)
        rows += [(g, int(i)) for i in items]
    df = pd.DataFrame(rows, columns=["g", "i"])
    edges = set()
    for g, sub in df.groupby("g"):
        for x, y in combinations(sorted(set(sub.i)), 2):
            edges.add((x, y))
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    tri = sum(1 for x, y in edges for z in (adj[x] & adj[y]) if z > y)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())

    eds = graph.cooccurrence_edges(rd.from_pandas(df).repartition(4),
                                   "g", "i")
    got_e = {tuple(r) for r in eds.to_pandas()[["a", "b"]].to_numpy()}
    assert got_e == edges
    stats = graph.triangle_stats(eds).to_pydict()
    assert stats["n_triangles"] == [tri]
    assert stats["n_wedges"] == [wedges]
    if wedges:
        assert stats["global_clustering"] == [round(3 * tri / wedges, 6)]


def test_cooccurrence_edges_rejects_quadratic_basket():
    df = pd.DataFrame({"g": [1] * 30, "i": range(30)})
    with pytest.raises((ValueError, Exception)) as ei:
        graph_mod = __import__("illumio_ray.ops.graph",
                               fromlist=["cooccurrence_edges"])
        graph_mod.cooccurrence_edges(rd.from_pandas(df), "g", "i",
                                     max_group_items=10).materialize()
    assert "quadratic" in str(ei.value) or "max_group_items" in str(ei.value)


def test_apply_changes_bucketed_cdc_semantics(tmp_path):
    from illumio_ray.ops import bucketing

    base = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                         "v": np.arange(20, dtype=np.int64) * 10})
    layout = tmp_path / "layout"
    bucketing.write_bucketed(rd.from_pandas(base), "k", 4, layout)

    # delete 3/7, update 5 (v=555), insert 100 — plus a seq conflict on
    # key 9: U(v=900, seq 1) then D(seq 2) → the delete wins
    ch = pd.DataFrame({
        "k":  np.array([3, 7, 5, 100, 9, 9], np.int64),
        "v":  np.array([0, 0, 555, 1000, 900, 0], np.int64),
        "op": ["D", "D", "U", "U", "U", "D"],
        "seq": np.array([1, 1, 1, 1, 1, 2], np.int64),
    })
    stats = bucketing.apply_changes_bucketed(
        layout, rd.from_pandas(ch), "k", "op", 4, seq_col="seq")
    assert stats["rows_deleted"] == 3 and stats["rows_upserted"] == 2

    def state() -> dict:
        t = pa.concat_tables(
            [bucketing.read_bucket_live(layout, b) for b in range(4)],
            promote_options="default")
        return dict(zip(t["k"].to_pylist(), t["v"].to_pylist()))

    want = {k: v * 10 for k, v in zip(range(20), range(20))
            if k not in (3, 7, 9)}
    want[5] = 555
    want[100] = 1000
    got = state()
    assert {k: got[k] for k in want} == want and set(got) == set(want)

    # replaying the SAME change set is a no-op on the final state, and
    # the stats reflect that (deletes of already-gone keys don't count)
    stats2 = bucketing.apply_changes_bucketed(
        layout, rd.from_pandas(ch), "k", "op", 4, seq_col="seq")
    assert state() == want
    assert stats2["rows_deleted"] == 0


def test_unigram_train_em_improves_likelihood_and_is_partition_invariant():
    from illumio_ray.ops import textops

    rng = np.random.default_rng(3)
    words = ["hello", "world", "hell", "low", "word", "held"]
    texts = [" ".join(rng.choice(words, size=8)) for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60), "text": texts})

    v1 = textops.unigram_train(rd.from_pandas(df).repartition(2),
                               vocab_size=40, seed_size=80, em_iters=2)
    v2 = textops.unigram_train(rd.from_pandas(df).repartition(7),
                               vocab_size=40, seed_size=80, em_iters=2)
    assert v1 == v2  # partitioning-independent
    pieces = {r["piece"] for r in v1}
    assert all(len(p) >= 1 for p in pieces)
    # every corpus character survives (words stay segmentable)
    assert set("helowrd") <= pieces

    # EM raises (never lowers) the corpus log-likelihood it optimizes
    words_tbl = textops._word_freq_table(rd.from_pandas(df), "text")
    import math
    lp = {r["piece"]: r["logp"] for r in v1}
    c1, ll1 = textops._em_pass(words_tbl, lp, 4)
    tot = sum(c1.values())
    lp2 = {p: math.log(c / tot) for p, c in c1.items() if c > 0}
    _, ll2 = textops._em_pass(words_tbl, lp2, 4)
    assert ll2 >= ll1 - 1e-9


def test_unigram_segment_viterbi_counts():
    from illumio_ray.ops import textops

    import math
    # vocab where "ab" is cheap: "abab" → 2 pieces, "aba" → ab + a
    vocab = [{"piece": "ab", "logp": math.log(0.6)},
             {"piece": "a", "logp": math.log(0.25)},
             {"piece": "b", "logp": math.log(0.15)}]
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["abab", "aba b", ""]})
    out = textops.unigram_segment(
        rd.from_pandas(df), vocab).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_pieces"] == 2
    assert out.loc[2, "n_pieces"] == 3   # "ab"+"a" then "b"
    assert out.loc[3, "n_pieces"] == 0 and out.loc[3, "nll"] == 0.0
    exp1 = -2 * math.log(0.6)
    assert abs(out.loc[1, "nll"] - exp1) < 1e-9


def test_ewm_rolling_mean_matches_reference():
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 5, n),
        "ts": pd.to_datetime("2024-01-01") +
              pd.to_timedelta(rng.permutation(n), unit="m"),
        "value": rng.uniform(0, 100, n).round(2),
    })
    k, a, b = 4, 0.3, 0.7
    out = rel.ewm_rolling_mean(
        rd.from_pandas(df).repartition(6), "user_id",
        ["ts", "event_id"], "value", alpha=a, k=k,
        ndigits=None).to_pandas().set_index("event_id")
    for uid, sub in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        xs = sub["value"].to_numpy()
        for t in range(len(xs)):
            m = min(k, t + 1)
            ws = b ** np.arange(m)
            want = float((ws * xs[t::-1][:m]).sum() / ws.sum())
            got = out.loc[sub["event_id"].iloc[t], "ewma"]
            assert abs(got - want) < 1e-9, (uid, t, got, want)


def test_gif_keyframes_picks_scene_cuts():
    from illumio_ray.ops import codecs

    # 6-frame clip: frames 0-2 identical, HARD cut at 3, 3-5 identical
    h, w = 8, 8
    flat = np.zeros((h, w), np.uint8)
    # patterned post-cut frame (uniform frames ahash identically — every
    # pixel sits at its own mean)
    bright = (np.indices((h, w)).sum(0) % 2).astype(np.uint8)
    frames = [flat, flat, flat, bright, bright, bright]
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    payload = codecs.gif_encode(frames, pal, delay_cs=4)

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([payload], pa.binary())})
    out = multimodal.gif_keyframes(
        rd.from_arrow(t), k=2).to_pandas().sort_values("frame_no")
    # opening frame + the single true cut at frame 3
    assert out.frame_no.tolist() == [0, 3]
    assert out.change_energy.tolist()[0] == -1.0   # opening sentinel
    assert out.change_energy.tolist()[1] == 127.5  # half the pixels flip
    # decoded-pixel hashes differ across the cut
    assert out.frame_ahash.nunique() == 2


def test_bfs_hops_matches_bruteforce():
    from collections import deque

    from illumio_ray.ops import graph

    rng = np.random.default_rng(23)
    edges = set()
    while len(edges) < 60:
        x, y = rng.integers(0, 30, 2)
        if x != y:
            edges.add((min(int(x), int(y)), max(int(x), int(y))))
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    seeds, max_hops = [0, 17], 4
    want = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if want[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    df = pd.DataFrame(sorted(edges), columns=["a", "b"])
    got = graph.bfs_hops(rd.from_pandas(df).repartition(4),
                         seeds=seeds, max_hops=max_hops).to_pandas()
    assert dict(zip(got.node, got.hops)) == want


def test_kcenter_select_matches_greedy_reference():
    rng = np.random.default_rng(9)
    n, d, k = 120, 8, 10
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    # plant exact duplicates: they must never be selected twice
    vecs[7] = vecs[3]
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})

    # pure-python greedy reference (same tie rules: min-id start/ties)
    v64 = vecs.astype(np.float64)
    centers = [0]
    dmin = np.full(n, np.inf)
    dists = [-1.0]
    for _ in range(1, k):
        dc = np.sqrt(((v64 - v64[centers[-1]][None, :]) ** 2).sum(1))
        dmin = np.minimum(dmin, dc)
        order = np.lexsort((np.arange(n), -dmin))
        best = order[0]
        if dmin[best] <= 0:
            break
        centers.append(int(best))
        dists.append(float(dmin[best]))

    got = similarity.kcenter_select(
        rd.from_pandas(df).repartition(5), k=k).to_pydict()
    assert got["id"] == centers
    assert np.allclose(got["dist"][1:], dists[1:], atol=1e-9)
    assert got["dist"][0] == -1.0
    assert 7 not in got["id"] or 3 not in got["id"]  # dup picked once


def test_knn_join_score_band_is_in_band_topk_not_postfilter():
    rng = np.random.default_rng(31)
    n, d = 40, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    left = rd.from_pandas(
        df.rename(columns={"vec_id": "qid"})).repartition(3)
    right = rd.from_pandas(df).repartition(4)
    lo, hi, k = 0.0, 0.6, 3
    got = similarity.knn_join(left, right, k,
                              score_band=(lo, hi)).to_pandas()

    from illumio_ray.functions.rounding import round_np
    v = vecs.astype(np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = round_np(v @ v.T, 6)
    for q in range(n):
        band = [(s, j) for j, s in enumerate(sims[q]) if lo <= s <= hi]
        want = sorted(band, key=lambda t: (-t[0], t[1]))[:k]
        sub = got[got.qid == q].sort_values(
            ["score", "vec_id"], ascending=[False, True])
        assert [(r.score, r.vec_id) for r in sub.itertuples()] == want
        # in-band guarantee: every emitted score is inside the band
        assert ((sub.score >= lo) & (sub.score <= hi)).all()


def test_bigram_pmi_matches_hand_counts_and_join_fallback():
    from illumio_ray.ops import textops

    # corpus engineered so "new york" is a strong collocation and doc
    # boundaries never form bigrams
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "text": ["new york is big",
                                  "new york new york",
                                  "big city is big",
                                  None]})
    ds = rd.from_pandas(docs).repartition(3)
    got = textops.bigram_pmi(ds, min_count=2).to_pandas() \
        .sort_values(["w1", "w2"]).reset_index(drop=True)

    # hand counts: tokens=12; unigrams new=3,york=3,is=2,big=3,city=1
    # bigrams with n>=2: (new,york)=3, (is,big)=2
    import math
    want = {("new", "york"): (3, round(math.log(3 * 12 / (3 * 3)), 6)),
            ("is", "big"): (2, round(math.log(2 * 12 / (2 * 3)), 6))}
    assert len(got) == len(want)
    for r in got.itertuples():
        n, pmi = want[(r.w1, r.w2)]
        assert r.n_pair == n and abs(r.pmi - pmi) < 1e-9

    # (york,new)=2 crosses doc2's repeats but never doc boundaries:
    # present with n=2, and absent at min_count=3
    got3 = textops.bigram_pmi(ds, min_count=3).to_pandas()
    assert set(zip(got3.w1, got3.w2)) == {("new", "york")}

    # hash-join fallback (vocab gate forced to 0) must agree exactly
    gotj = textops.bigram_pmi(ds, min_count=2, broadcast_vocab_max=0) \
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, gotj[got.columns])


def test_scd2_history_intervals_and_current_flag():
    ts = pd.to_datetime(["2026-01-01 00:00", "2026-01-01 01:00",
                         "2026-01-01 02:00", "2026-01-01 03:00",
                         "2026-01-01 00:30", "2026-01-01 00:30",
                         "2026-01-01 04:00"])
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "event_type": ["a", "a", "b", "a", "x", "y", "y"],
        "ts": ts,
        "event_id": [10, 11, 12, 13, 20, 21, 22],
    })
    ds = rd.from_pandas(df).repartition(3)
    got = rel.scd2_history(ds, "user_id", "event_type", "ts",
                           order_cols=["event_id"]).to_pandas() \
        .sort_values(["user_id", "valid_from"]).reset_index(drop=True)

    # user 1: a[00:00,02:00) b[02:00,03:00) a[03:00,open)
    # user 2: equal-ts tie broken by event_id → x[00:30,00:30) y[00:30,open)
    assert list(got.user_id) == [1, 1, 1, 2, 2]
    assert list(got.state) == ["a", "b", "a", "x", "y"]
    assert list(got.is_current) == [False, False, True, False, True]
    assert got.valid_to.iloc[0] == ts[2]
    assert got.valid_to.iloc[3] == ts[5]
    assert pd.isna(got.valid_to.iloc[2]) and pd.isna(got.valid_to.iloc[4])
    # exactly one current row per user
    assert got[got.is_current].groupby("user_id").size().eq(1).all()


def test_random_projection_distortion_and_topk():
    rng = np.random.default_rng(3)
    n, d = 80, 64
    vecs = rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": range(n),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)

    # projection: right shape, deterministic, and JL-style distance
    # preservation on average (out_dim=32 halves the dim)
    out = similarity.random_project(ds, out_dim=32, seed=7).to_pandas() \
        .sort_values("vec_id")
    proj = np.stack(out["proj"].to_numpy())
    assert proj.shape == (n, 32)
    r = similarity.random_projection_matrix(d, 32, seed=7)
    np.testing.assert_allclose(proj, vecs @ r.T, rtol=1e-12)

    pd_sq = ((vecs[:40, None, :] - vecs[None, 40:, :]) ** 2).sum(-1)
    pp_sq = ((proj[:40, None, :] - proj[None, 40:, :]) ** 2).sum(-1)
    ratio = pp_sq / pd_sq
    assert 0.85 < ratio.mean() < 1.15   # unbiased in expectation
    # JL tail: nearly all pairs inside moderate distortion at out_dim=32
    assert np.quantile(np.abs(ratio - 1), 0.99) < 1.0

    # projected top-k equals the direct numpy computation, ties by id
    from illumio_ray.functions.rounding import round_np
    q = vecs[0]
    got = similarity.random_projection_topk(ds, q, 5, out_dim=8,
                                            seed=7).to_pandas()
    r8 = similarity.random_projection_matrix(d, 8, seed=7)
    sims = round_np((vecs @ r8.T) @ (r8 @ q), 6)
    want = sorted(zip(-sims, range(n)))[:5]
    assert [(s.score, s.vec_id) for s in got.itertuples()] == \
        [(-s, i) for s, i in want]


def test_lang_unigram_jsd_separated_vs_identical():
    from illumio_ray.ops import textops
    # lang A and B share a distribution; lang C is disjoint → JSD(C) ≈ ln 2
    rows = []
    for i in range(60):
        rows.append(("A", "alpha beta gamma alpha"))
        rows.append(("B", "alpha beta gamma beta"))
        rows.append(("C", "delta epsilon zeta delta"))
    df = pd.DataFrame(rows, columns=["lang", "text"])
    out = (textops.lang_unigram_jsd(rd.from_pandas(df).repartition(5),
                                    "lang", "text", vocab_k=10)
           .to_pandas().set_index("lang"))
    assert out.loc["C", "jsd"] > out.loc["A", "jsd"]
    assert out.loc["C", "jsd"] > 0.3          # disjoint support is far out
    # A and B are symmetric around the corpus (alpha/beta swap) → equal JSD,
    # and both sit well under the disjoint language
    assert out.loc["A", "jsd"] == out.loc["B", "jsd"]
    assert out.loc["A", "jsd"] < 0.5 * out.loc["C", "jsd"]
    assert int(out.loc["A", "n_tokens"]) == 240


def test_lang_unigram_jsd_partition_invariant():
    from illumio_ray.ops import textops
    rng = np.random.default_rng(7)
    words = np.array(["w%d" % i for i in range(40)])
    df = pd.DataFrame({
        "lang": rng.choice(["en", "fr"], 300),
        "text": [" ".join(rng.choice(words, 12)) for _ in range(300)]})
    a = textops.lang_unigram_jsd(rd.from_pandas(df), "lang", "text",
                                 vocab_k=25).to_pandas()
    b = textops.lang_unigram_jsd(rd.from_pandas(df).repartition(11),
                                 "lang", "text", vocab_k=25).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_hybrid_rrf_fuses_both_rankings():
    from illumio_ray.ops import textops
    # doc 1 wins bm25 (rare term), doc 2 wins tf-idf density, doc 3 has
    # nothing; fused top must put 1 and 2 ahead of every filler doc
    df = pd.DataFrame({
        "doc_id": np.arange(1, 31),
        "text": (["cat cat dog filler filler filler"]   # balanced
                 + ["cat cat"]                          # short → tfidf king
                 + ["filler junk words here"] * 28)})
    out = textops.hybrid_rrf(rd.from_pandas(df).repartition(4),
                             ("cat", "dog"), list_k=10,
                             top_n=5).to_pandas()
    assert list(out.doc_id[:2]) in ([1, 2], [2, 1])
    # every rrf value is one or two 1/(60+r) terms
    assert (out.rrf <= round(2 / 61, 6) + 1e-9).all()
    assert (out.rrf > 0).all()


def test_hybrid_rrf_rank_ties_break_on_doc_id():
    from illumio_ray.ops import textops
    # all docs identical → every score ties; ranks follow doc_id, so the
    # fused order is exactly doc_id ascending
    df = pd.DataFrame({"doc_id": np.arange(1, 21),
                       "text": ["cat dog"] * 20})
    out = textops.hybrid_rrf(rd.from_pandas(df).repartition(3),
                             ("cat", "dog"), list_k=8, top_n=8).to_pandas()
    assert list(out.doc_id) == list(range(1, 9))
    want0 = round(1 / 61 + 1 / 61, 6)
    assert out.rrf.iloc[0] == want0


def test_time_travel_snapshots_across_upserts(tmp_path):
    """Every upsert/merge/apply allocates a snapshot seq; read_bucketed_asof
    reconstructs the layout exactly as of each snapshot, and vacuum turns
    historic snapshots into fast FileNotFoundError (never silent base
    fallback) while the current one stays readable."""
    from illumio_ray.ops import bucketing

    layout = tmp_path / "layout"
    nb = 4
    base = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                         "v": np.zeros(20, dtype=np.int64)})
    bucketing.write_bucketed(rd.from_pandas(base), "k", nb, layout)
    assert bucketing.current_snapshot_seq(layout) == 0

    s1 = bucketing.upsert_bucketed(
        layout, rd.from_pandas(pd.DataFrame(
            {"k": np.arange(10, dtype=np.int64),
             "v": np.full(10, 1, np.int64)})), "k", nb)["snapshot_seq"]
    s2 = bucketing.upsert_bucketed(
        layout, rd.from_pandas(pd.DataFrame(
            {"k": np.arange(15, 30, dtype=np.int64),
             "v": np.full(15, 2, np.int64)})), "k", nb)["snapshot_seq"]
    assert (s1, s2) == (1, 2)
    assert bucketing.current_snapshot_seq(layout) == 2

    def state(seq):
        df = (bucketing.read_bucketed_asof(layout, nb, seq)
              .to_pandas().sort_values("k").reset_index(drop=True))
        return list(zip(df.k, df.v))

    want0 = [(k, 0) for k in range(20)]
    want1 = [(k, 1) for k in range(10)] + [(k, 0) for k in range(10, 20)]
    want2 = ([(k, 1) for k in range(10)] + [(k, 0) for k in range(10, 15)]
             + [(k, 2) for k in range(15, 30)])
    assert state(0) == want0
    assert state(1) == want1
    assert state(2) == want2
    # asof beyond current = current
    assert state(99) == want2

    # vacuum: history gone (loud), current snapshot still exact
    assert bucketing.vacuum_bucketed(layout, nb) > 0
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        bucketing.snapshot_parquet_files(layout, nb, 1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        bucketing.snapshot_parquet_files(layout, nb, 0)  # base gone too
    assert state(2) == want2


def test_time_travel_merge_and_cdc_snapshots(tmp_path):
    """merge_bucketed and apply_changes_bucketed participate in the same
    snapshot lineage (one seq per operation, shared counter)."""
    from illumio_ray.ops import bucketing

    layout = tmp_path / "agg"
    nb = 4
    bucketing.write_bucketed(
        rd.from_pandas(pd.DataFrame({"k": [1, 2, 3],
                                     "n": [10, 20, 30]})), "k", nb, layout)
    r1 = bucketing.merge_bucketed(
        layout, rd.from_pandas(pd.DataFrame({"k": [2, 4], "n": [5, 7]})),
        "k", nb, ["n"], token="t1")
    r2 = bucketing.apply_changes_bucketed(
        layout, rd.from_pandas(pd.DataFrame(
            {"k": [1], "op": ["D"], "n": [0]})), "k", "op", nb)
    assert r1["snapshot_seq"] == 1 and r2["snapshot_seq"] == 2

    def state(seq):
        df = (bucketing.read_bucketed_asof(layout, nb, seq)
              .to_pandas().sort_values("k").reset_index(drop=True))
        return list(zip(df.k, df.n))

    assert state(0) == [(1, 10), (2, 20), (3, 30)]
    assert state(1) == [(1, 10), (2, 25), (3, 30), (4, 7)]
    assert state(2) == [(2, 25), (3, 30), (4, 7)]


def test_token_budget_sample_matches_sorted_cumsum():
    """Histogram-refined selection == brute-force per-group hash-ordered
    cumulative prefix, across block layouts and budget shapes."""
    import hashlib
    from illumio_ray.ops import textops

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "fr", "de"], n),
        "text": [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]})

    def brute(budgets):
        out = []
        d = df.assign(
            h=[hashlib.md5(str(v).encode()).hexdigest() for v in df.doc_id],
            tok=df.text.str.split().str.len())
        for g, sub in d.groupby("lang"):
            b = budgets.get(g, budgets.get("__all__"))
            if b is None:
                continue
            sub = sub.sort_values(["h", "doc_id"])
            cum = sub.tok.cumsum()
            out += list(sub.doc_id[cum <= b])
        return sorted(out)

    for budgets in [{"__all__": 500}, {"en": 300, "fr": 10_000},
                    {"en": 0, "fr": 1, "de": 700}]:
        got = (textops.token_budget_sample(
            rd.from_pandas(df).repartition(7), budgets)
            .to_pandas())
        assert sorted(got.doc_id) == brute(budgets), budgets
        # reported n_tokens are the doc token counts
        want_tok = df.set_index("doc_id").text.str.split().str.len()
        assert all(want_tok[i] == t for i, t in zip(got.doc_id, got.n_tokens))


def test_token_budget_sample_keep_whole_group():
    from illumio_ray.ops import textops
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "lang": ["en"] * 3,
                       "text": ["a b", "c", "d e f"]})
    got = textops.token_budget_sample(rd.from_pandas(df), 100).to_pandas()
    assert sorted(got.doc_id) == [1, 2, 3]   # budget covers everything


def test_kmv_exact_under_k_and_accurate_over_k():
    from illumio_ray.functions.sketches import KMV, kmv_sketch
    from illumio_ray.functions.hashing import stable_hash64
    # under k: exact
    sk = KMV(256)
    sk.update(stable_hash64(pa.array(list(range(100)), pa.int64())))
    assert sk.distinct() == 100.0
    # over k: ±10% at k=256 over 50k distinct
    h = stable_hash64(pa.array(np.arange(50_000), pa.int64()))
    big = KMV(256).update(h)
    assert abs(big.distinct() - 50_000) / 50_000 < 0.10
    # merge == single-shot (partition invariance of the sketch)
    parts = [KMV(256).update(h[i::7]) for i in range(7)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.distinct() == big.distinct()


def test_kmv_jaccard_and_intersection_estimates():
    from illumio_ray.functions.sketches import KMV
    from illumio_ray.functions.hashing import stable_hash64
    a_keys = np.arange(0, 30_000)
    b_keys = np.arange(15_000, 45_000)       # true J = 15k/45k = 1/3
    a = KMV(512).update(stable_hash64(pa.array(a_keys, pa.int64())))
    b = KMV(512).update(stable_hash64(pa.array(b_keys, pa.int64())))
    assert abs(a.jaccard(b) - 1 / 3) < 0.07
    assert abs(a.intersection(b) - 15_000) / 15_000 < 0.2
    # disjoint sets → zero-ish
    c = KMV(512).update(stable_hash64(pa.array(
        np.arange(100_000, 130_000), pa.int64())))
    assert a.jaccard(c) < 0.02


def test_kmv_sketch_over_dataset_matches_local():
    from illumio_ray.functions.sketches import KMV, kmv_sketch
    from illumio_ray.functions.hashing import stable_hash64
    vals = np.concatenate([np.arange(5000), np.arange(2500)])  # dups
    t = pa.table({"k": pa.array(vals, pa.int64())})
    got = kmv_sketch(rd.from_arrow(t).repartition(6), "k", k=512)
    ref = KMV(512).update(stable_hash64(t["k"]))
    assert np.array_equal(got.mins, ref.mins)
    assert abs(got.distinct() - 5000) / 5000 < 0.08


@pytest.mark.parametrize("limit", [0, 1 << 30])
def test_auto_join_paths_equivalent(limit):
    """broadcast path (huge limit) == hash path (limit 0), inner and
    left_outer, including null-fill on the outer side."""
    from illumio_ray.ops import relational as rel
    left = pd.DataFrame({"k": [1, 2, 3, 4, 4], "x": [10, 20, 30, 40, 41]})
    right = pd.DataFrame({"k": [2, 3, 5], "y": ["b", "c", "e"]})
    for jt in ["inner", "left_outer"]:
        got = (rel.auto_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], join_type=jt,
                             broadcast_limit_bytes=limit)
               .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
        want = left.merge(right, on="k",
                          how="inner" if jt == "inner" else "left") \
            .sort_values(["k", "x"]).reset_index(drop=True)
        assert list(got.k) == list(want.k)
        assert list(got.x) == list(want.x)
        assert list(got.y.fillna("∅")) == list(want.y.fillna("∅"))


def test_grouped_mode_deterministic_ties():
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        # group a: 7 and 9 tie at 2 each -> smallest value (7) wins
        "v": [9, 7, 9, 7, 5, 5, 8],
    })
    out = rel.grouped_mode(rd.from_pandas(df), ["g"], "v",
                           out_col="mode_v", count_col="n",
                           mode="driver").to_pandas()
    got = dict(zip(out["g"], zip(out["mode_v"], out["n"])))
    assert got == {"a": (7, 2), "b": (5, 2)}


def test_table_checksum_order_and_partition_invariant():
    df = pd.DataFrame({"k": [3, 1, 2], "s": ["x", "y", None]})
    a = rel.table_checksum(rd.from_pandas(df), ["k", "s"])
    shuffled = df.sample(frac=1, random_state=7).reset_index(drop=True)
    b = rel.table_checksum(rd.from_pandas(shuffled).repartition(3),
                           ["k", "s"])
    assert a["checksum"][0].as_py() == b["checksum"][0].as_py()
    assert a["n"][0].as_py() == b["n"][0].as_py() == 3
    # any value change must move the digest
    df2 = df.assign(k=[3, 1, 99])
    c = rel.table_checksum(rd.from_pandas(df2), ["k", "s"])
    assert c["checksum"][0].as_py() != a["checksum"][0].as_py()
    # pinned reference value: md5 lower-64 of "3|x", "1|y", "2|" summed
    import hashlib
    ref = sum(int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                             "little")
              for s in ["3|x", "1|y", "2|"]) % (1 << 64)
    assert a["checksum"][0].as_py() == str(ref)


def test_debounce_lag_gap_semantics():
    # lag semantics: each row's gap is measured to its IMMEDIATE
    # predecessor, kept or dropped — t=110 compares against the DROPPED
    # t=50 row (gap exactly 60 -> keep), not against the kept t=0 row.
    df = pd.DataFrame({
        "user": [1, 1, 1, 1, 2],
        "ts": pd.to_datetime([0, 50, 110, 171, 10], unit="s"),
        "event_id": [0, 1, 2, 3, 4],
    })
    out = rel.debounce(rd.from_pandas(df), "user", "ts", min_gap_s=60,
                       tie_cols=["event_id"]).to_pandas()
    # lag semantics: row 2 keeps (110-50=60 >= 60), row 1 drops (50),
    # row 3 keeps (171-110=61); user 2's first row always keeps.
    assert sorted(out["event_id"]) == [0, 2, 3, 4]


@pytest.mark.parametrize("nblocks", [1, 5])
def test_merge_intervals_matches_bruteforce(nblocks):
    rng = np.random.default_rng(23)
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "s": rng.integers(0, 10_000, n).astype(np.int64),
    })
    df["e"] = df["s"] + rng.integers(1, 500, n)
    out = rel.merge_intervals(rd.from_pandas(df).repartition(nblocks),
                              "k", "s", "e").to_pandas()

    def brute(sub):
        ivs = sorted(zip(sub["s"], sub["e"]))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        return merged

    ref = sorted((k, s, e) for k, sub in df.groupby("k")
                 for s, e in brute(sub))
    got = sorted(zip(out["k"], out["s"], out["e"]))
    assert got == ref


def test_merge_intervals_touching_merge_and_gap_split():
    df = pd.DataFrame({"k": [1, 1, 1], "s": [0, 10, 21], "e": [10, 20, 30]})
    out = rel.merge_intervals(rd.from_pandas(df), "k", "s", "e").to_pandas()
    got = sorted(zip(out["s"], out["e"]))
    # [0,10] and [10,20] touch (closed intervals) -> merge; 21 > 20 splits
    assert got == [(0, 20), (21, 30)]


def test_ffill_by_carries_forward_per_key():
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 1],
        "t": [0, 1, 2, 0, 1, 3],
        "v": [np.nan, 5.0, np.nan, np.nan, 7.0, np.nan],
    })
    out = rel.ffill_by(rd.from_pandas(df), "k", ["t"], "v").to_pandas()
    out = out.sort_values(["k", "t"])
    vals = list(out["v"])
    # k=1: NaN (leading), 5, 5, 5 ; k=2: NaN (leading), 7
    assert np.isnan(vals[0]) and vals[1:4] == [5.0, 5.0, 5.0]
    assert np.isnan(vals[4]) and vals[5] == 7.0


@pytest.mark.parametrize("nblocks", [1, 6])
def test_weighted_quantile_matches_bruteforce(nblocks):
    rng = np.random.default_rng(31)
    n = 3000
    v = np.round(rng.normal(100, 25, n), 2)
    v[::11] = v[0]  # plant heavy ties
    w = rng.integers(1, 20, n).astype(np.int64)
    df = pd.DataFrame({"v": v, "w": w})
    qs = [0.1, 0.5, 0.9]
    got = rel.weighted_quantile(rd.from_pandas(df).repartition(nblocks),
                                "v", "w", qs, num_bins=16,
                                collect_limit=50, max_passes=8)

    order = np.argsort(v, kind="mergesort")
    sv, sw = v[order], w[order]
    uniq, inv = np.unique(sv, return_inverse=True)
    cum = np.cumsum(np.bincount(inv, weights=sw).astype(np.int64))
    W = cum[-1]
    ref = [float(uniq[np.searchsorted(cum, q * W, side="left")])
           for q in qs]
    assert got == ref


def test_weighted_quantile_null_pairs_and_all_null():
    df = pd.DataFrame({"v": [1.0, np.nan, 3.0, 5.0],
                       "w": [1.0, 5.0, np.nan, 3.0]})
    # usable pairs: (1,1), (5,3) -> W=4; q=0.5 target 2 -> v=5
    got = rel.weighted_quantile(rd.from_pandas(df), "v", "w", [0.5])
    assert got == [5.0]
    allnull = pd.DataFrame({"v": [np.nan, np.nan], "w": [1.0, 1.0]})
    got2 = rel.weighted_quantile(rd.from_pandas(allnull), "v", "w", [0.5])
    assert np.isnan(got2[0])


@pytest.mark.parametrize("nblocks", [1, 5])
def test_transition_counts_matches_pandas(nblocks):
    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "t": rng.permutation(n),
        "s": rng.choice(["a", "b", "c"], n),
    })
    out = rel.transition_counts(
        rd.from_pandas(df).repartition(nblocks), "k", ["t"], "s"
    ).to_pandas()

    d = df.sort_values(["k", "t"])
    d["prev"] = d.groupby("k")["s"].shift()
    ref = (d.dropna(subset=["prev"]).value_counts(["prev", "s"])
           .rename("n").reset_index().rename(columns={"s": "cur"}))
    ref["p"] = (ref["n"] / ref.groupby("prev")["n"].transform("sum")
                ).round(6)
    ref = ref.sort_values(["prev", "cur"]).reset_index(drop=True)
    got = out.sort_values(["prev", "cur"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["prev", "cur", "n", "p"]],
        ref[["prev", "cur", "n", "p"]].astype({"n": "int64"}))


def test_association_rules_matches_bruteforce():
    from illumio_ray.ops import graph
    from itertools import combinations
    from collections import Counter

    rng = np.random.default_rng(41)
    rows = []
    for g in range(60):
        items = rng.choice(30, size=rng.integers(2, 6), replace=False)
        rows.extend((g, int(i)) for i in items)
    # plant a strongly-associated pair in 8 baskets
    for g in range(100, 108):
        rows.extend([(g, 900), (g, 901)])
    df = pd.DataFrame(rows, columns=["g", "i"])
    out = graph.association_rules(rd.from_pandas(df), "g", "i",
                                  min_pair_count=2, k=10).to_pandas()

    baskets = df.groupby("g")["i"].apply(set)
    nn = len(baskets)
    pair_n = Counter()
    item_n = Counter()
    for s in baskets:
        for i in s:
            item_n[i] += 1
        for a, b in combinations(sorted(s), 2):
            pair_n[(a, b)] += 1
    ref = []
    for (a, b), n_ab in pair_n.items():
        if n_ab < 2:
            continue
        ref.append((round(n_ab * nn / (item_n[a] * item_n[b]), 6),
                    a, b, n_ab,
                    round(n_ab / nn, 6),
                    round(n_ab / item_n[a], 6),
                    round(n_ab / item_n[b], 6)))
    ref.sort(key=lambda r: (-r[0], r[1], r[2]))
    ref = ref[:10]
    got = list(zip(out["lift"], out["a"], out["b"], out["n_ab"],
                   out["support"], out["conf_a_b"], out["conf_b_a"]))
    assert got == ref
    # the planted pair must be the top rule (perfect confidence, max lift)
    assert (got[0][1], got[0][2]) == (900, 901)
    assert got[0][5] == 1.0 and got[0][6] == 1.0


def test_benford_digit_test_known_distribution():
    from illumio_ray.ops import profile as prof

    # exact Benford sample: digit d appears round(10000 * log10(1+1/d))
    exp_p = np.log10(1 + 1.0 / np.arange(1, 10))
    counts = np.round(exp_p * 10000).astype(int)
    vals = np.concatenate([np.full(c, d, np.float64) * 10
                           for d, c in zip(range(1, 10), counts)])
    # sub-1 values must drop, not crash or skew
    vals = np.concatenate([vals, [0.5, 0.01]])
    out = prof.benford_digit_test(
        rd.from_arrow(pa.table({"v": vals})), "v").to_pandas()
    assert list(out["digit"]) == [str(d) for d in range(1, 10)]
    assert out["n"].sum() == counts.sum()
    # near-perfect conformity -> tiny chi-square contributions
    assert out["chi2_part"].sum() < 0.01
    # powers of ten keep their true leading digit (string extraction)
    out2 = prof.benford_digit_test(
        rd.from_arrow(pa.table({"v": [1000.0, 100.0, 10.0, 1.0]})),
        "v").to_pandas()
    assert int(out2.loc[out2["digit"] == "1", "n"].iloc[0]) == 4


def test_asof_nearest_composition_matches_bruteforce():
    # compose backward+forward partitioned as-of and pick min |dt|,
    # exactly as the events_asof_nearest_error query does
    rng = np.random.default_rng(57)
    lts = np.sort(rng.choice(100_000, 200, replace=False))
    rts = np.sort(rng.choice(100_000, 40, replace=False))
    left = pd.DataFrame({"id": np.arange(200),
                         "ts": pd.to_datetime(lts, unit="s")})
    right = pd.DataFrame({"r_ts": pd.to_datetime(rts, unit="s")})

    both = rel.asof_partitioned_join(
        rd.from_pandas(left), rd.from_pandas(right), "ts", "r_ts",
        {"bts": "r_ts"}, direction="backward", num_partitions=4)
    both = rel.asof_partitioned_join(
        both, rd.from_pandas(right), "ts", "r_ts",
        {"fts": "r_ts"}, direction="forward", num_partitions=4)
    df = both.to_pandas()
    dt_b = (df["ts"] - df["bts"]).dt.total_seconds()
    dt_f = (df["fts"] - df["ts"]).dt.total_seconds()
    use_b = df["bts"].notna() & (df["fts"].isna() | (dt_b <= dt_f))
    got = dict(zip(df["id"], np.where(use_b, df["bts"], df["fts"])))

    for i, t in zip(left["id"], lts):
        diffs = np.abs(rts.astype(np.int64) - t)
        best = diffs.min()
        cands = rts[diffs == best]
        want = cands.min()  # tie -> earlier (backward) side
        assert pd.Timestamp(got[i]).timestamp() == want


def test_union_by_name_typed_null_padding():
    a = pd.DataFrame({"k": np.array([1, 2], np.int64), "x": ["p", "q"]})
    b = pd.DataFrame({"y": [1.5, 2.5, 3.5],
                      "k": np.array([3, 4, 5], np.int64)})
    out = rel.union_by_name(rd.from_pandas(a),
                            rd.from_pandas(b))
    t = pa.concat_tables([pa.table(x) for x in
                          out.iter_batches(batch_format="pyarrow")])
    assert t.column_names == ["k", "x", "y"]
    # int64 keys survive padding on BOTH sides (no float64+NaN coercion)
    assert t["k"].type == pa.int64()
    assert sorted(t["k"].to_pylist()) == [1, 2, 3, 4, 5]
    assert t["x"].to_pylist().count(None) == 3
    assert t["y"].to_pylist().count(None) == 2


def test_union_by_name_conflicting_type_fails_loudly():
    a = pd.DataFrame({"k": np.array([1], np.int64)})
    b = pd.DataFrame({"k": ["not-an-int"]})
    ds = rel.union_by_name(rd.from_pandas(a), rd.from_pandas(b))
    with pytest.raises(Exception):
        ds.materialize()


@pytest.mark.parametrize("nblocks", [1, 4])
def test_systematic_weighted_sample_matches_bruteforce(nblocks):
    rng = np.random.default_rng(61)
    ids = np.arange(500, dtype=np.int64)
    w = rng.integers(1, 100, 500).astype(np.int64)
    # one heavy row that must be drawn several times (with replacement)
    w[123] = 20_000
    df = pd.DataFrame({"id": ids, "w": w})
    k = 10
    out = rel.systematic_weighted_sample(
        rd.from_pandas(df).repartition(nblocks), "id", "w", k)

    cw = np.cumsum(w)  # ids are already ascending
    W = cw[-1]
    ref = [int(ids[np.searchsorted(cw, ((j + 0.5) / k) * W,
                                   side="left")])
           for j in range(k)]
    assert out["id"].to_pylist() == ref
    assert ref.count(123) >= 2  # heavy row drawn multiple times


def test_degree_distribution_and_hill_alpha():
    from illumio_ray.ops import graph

    # star graph: hub 0 connected to 1..8 -> hub degree 8, leaves 1
    edges = pd.DataFrame({"a": [0] * 8, "b": list(range(1, 9))})
    dist = graph.degree_distribution(rd.from_pandas(edges)).to_pandas()
    got = dict(zip(dist["d"], dist["n_nodes"]))
    assert got == {1: 8, 8: 1}

    # Hill estimator end-to-end on the same star graph, dmin=1: every
    # node is in the tail, alpha = 1 + 9 / (8*ln(1/0.5) + ln(8/0.5))
    out = graph.hill_tail_alpha(rd.from_pandas(edges), dmin=1).to_pandas()
    ref = 1.0 + 9.0 / (8 * np.log(1 / 0.5) + np.log(8 / 0.5))
    assert out["n_tail"][0] == 9
    assert abs(out["alpha"][0] - round(ref, 6)) < 1e-9
    # empty tail -> NULL alpha, not a crash
    out2 = graph.hill_tail_alpha(rd.from_pandas(edges), dmin=99).to_pandas()
    assert out2["n_tail"][0] == 0 and pd.isna(out2["alpha"][0])


def test_funnel_windowed_drops_late_conversions():
    # user 1 converts within the window; user 2's click is too late;
    # user 3's purchase is too late after the click
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
        "ts": pd.to_datetime([0, 10, 20, 0, 200, 0, 30, 500], unit="s"),
        "event_type": ["view", "click", "purchase",
                       "view", "click",
                       "view", "click", "purchase"],
    })
    full = rel.funnel_counts(rd.from_pandas(df), "user_id", "ts",
                             "event_type", ["view", "click", "purchase"])
    win = rel.funnel_counts(rd.from_pandas(df), "user_id", "ts",
                            "event_type", ["view", "click", "purchase"],
                            max_span_s=100)
    assert full["n_users"].to_pylist() == [3, 3, 2]
    # windowed: view 3 (never bounded), click 2 (user 2 late),
    # purchase 1 (user 3's purchase 470s after click)
    assert win["n_users"].to_pylist() == [3, 2, 1]


def test_bloom_filtered_hash_join_matches_plain_join():
    rng = np.random.default_rng(83)
    left = pd.DataFrame({"k": rng.integers(0, 5000, 20000),
                         "x": rng.normal(0, 1, 20000)})
    right = pd.DataFrame({"k": rng.choice(5000, 400, replace=False)})
    right["y"] = np.arange(400)
    got = rel.bloom_filtered_hash_join(
        rd.from_pandas(left).repartition(6),
        rd.from_pandas(right).repartition(3), on="k").to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    assert sorted(zip(got["k"], got["y"])) == sorted(zip(want["k"], want["y"]))
    assert got["x"].sum() == pytest.approx(want["x"].sum())


@pytest.mark.parametrize("nblocks", [1, 5])
def test_path_ngram_counts_matches_pandas(nblocks):
    rng = np.random.default_rng(91)
    nrows = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 30, nrows),
        "t": rng.permutation(nrows),
        "s": rng.choice(["a", "b", "c"], nrows),
    })
    out = rel.path_ngram_counts(
        rd.from_pandas(df).repartition(nblocks), "k", ["t"], "s", n=3
    ).to_pandas()

    d = df.sort_values(["k", "t"])
    d["s1"] = d.groupby("k")["s"].shift(2)
    d["s2"] = d.groupby("k")["s"].shift(1)
    ref = (d.dropna(subset=["s1"]).value_counts(["s1", "s2", "s"])
           .rename("n").reset_index().rename(columns={"s": "s3"}))
    got = sorted(zip(out["s1"], out["s2"], out["s3"], out["n"]))
    want = sorted(zip(ref["s1"], ref["s2"], ref["s3"],
                      ref["n"].astype(np.int64)))
    assert got == want


def test_bpe_fertility_invariants():
    from illumio_ray.ops import textops
    from illumio_ray.pipelines.queries import REGISTRY

    out = REGISTRY["doc_bpe_fertility"].fn(
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    ok = out[out["n_words"] > 0]
    # every word is at least one piece, never fewer
    assert (ok["fertility"] >= 1.0).all()
    assert (ok["n_pieces"] >= ok["n_words"]).all()

    # more merges -> never more pieces (monotone compression)
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    few = textops.bpe_train(docs, n_merges=5)
    many = textops.bpe_train(docs, n_merges=30)
    assert few == many[:5]  # greedy prefix property
    a = textops.bpe_segment(docs, few, "doc_id", "text").to_pandas()
    b = textops.bpe_segment(docs, many, "doc_id", "text").to_pandas()
    m = a.merge(b, on="doc_id", suffixes=("_few", "_many"))
    assert (m["n_bpe_tokens_many"] <= m["n_bpe_tokens_few"]).all()


def test_write_pages_jsonl_roundtrip(tmp_path):
    from illumio_ray.sources.jsonl import read_pages_jsonl, write_pages_jsonl

    df = pd.DataFrame({
        "url": ["http://a/1", "http://b/2", "http://c/3"],
        "warc_ts": pd.to_datetime([1_700_000_000_123456,
                                   1_700_000_001_000000,
                                   1_700_000_002_654321], unit="us"),
        "html": [b"<html>\xff</html>", b"", b"<body>x</body>"],
        "text": ["hello", "", "unicode é中"],
        "lang": ["en", "de", "fr"],
    })
    paths = write_pages_jsonl(rd.from_pandas(df), tmp_path / "out")
    assert paths and all(p.endswith(".jsonl.gz") for p in paths)
    back = read_pages_jsonl(str(tmp_path / "out")).to_pandas()
    back = back.sort_values("url").reset_index(drop=True)
    want = df.sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(want["url"])
    assert list(back["warc_ts"]) == list(want["warc_ts"])
    assert list(back["html"]) == list(want["html"])
    assert list(back["text"]) == list(want["text"])
    assert list(back["lang"]) == list(want["lang"])
    # deterministic payloads: rerunning writes the same file names
    again = write_pages_jsonl(rd.from_pandas(df), tmp_path / "out")
    assert sorted(again) == sorted(paths)


def test_expect_schema_gate():
    from illumio_ray.ops import validate as V

    t = pa.table({"a": pa.array([1], pa.int64()),
                  "b": pa.array(["x"], pa.string())})
    ds = rd.from_arrow(t)
    # exact match passes and chains
    out = V.expect_schema(ds, {"a": pa.int64(), "b": pa.string()})
    assert out.count() == 1
    # extra column tolerated only with allow_extra
    V.expect_schema(ds, {"a": pa.int64()}, allow_extra=True)
    with pytest.raises(ValueError, match="unexpected column 'b'"):
        V.expect_schema(ds, {"a": pa.int64()})
    with pytest.raises(ValueError, match="missing column 'z'"):
        V.expect_schema(ds, {"a": pa.int64(), "b": pa.string(),
                             "z": pa.float64()})
    with pytest.raises(ValueError, match="expected double"):
        V.expect_schema(ds, {"a": pa.float64(), "b": pa.string()})


def test_ngram_containment_catches_embedded_doc():
    base = " ".join(f"w{i}" for i in range(40))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            base + " " + " ".join(f"x{i}" for i in range(200)),  # long
            base,                                   # embedded verbatim
            " ".join(f"z{i}" for i in range(40)),   # unrelated
        ],
    })
    ds = rd.from_pandas(docs)
    cont = dedup.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.9,
                                     measure="containment").to_pandas()
    jac = dedup.ngram_jaccard_pairs(ds, "doc_id", "text",
                                    threshold=0.9).to_pandas()
    # the embedded pair scores containment 1.0 but tiny Jaccard
    assert list(zip(cont["id_a"], cont["id_b"])) == [(1, 2)]
    assert cont["containment"].iloc[0] == 1.0
    assert len(jac) == 0


@pytest.mark.parametrize("nblocks", [1, 5])
def test_weighted_quantile_by_matches_bruteforce(nblocks):
    rng = np.random.default_rng(47)
    n = 2500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": np.round(rng.lognormal(3, 1, n), 1),
        "w": rng.integers(1, 50, n).astype(np.int64),
    })
    out = rel.weighted_quantile_by(
        rd.from_pandas(df).repartition(nblocks), "g", "v", "w",
        [0.25, 0.5, 0.9], num_bins=16, collect_limit=40).to_pandas()
    got = out.set_index("g")

    for g, sub in df.groupby("g"):
        sub = sub.sort_values("v", kind="mergesort")
        uniq, inv = np.unique(sub["v"].to_numpy(), return_inverse=True)
        cum = np.cumsum(np.bincount(
            inv, weights=sub["w"].to_numpy(np.float64)).astype(np.int64))
        W = cum[-1]
        for qq, cname in [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]:
            ref = float(uniq[np.searchsorted(cum, qq * W, side="left")])
            assert got.loc[g, cname] == ref


def test_doc_char_entropy_matches_counter_bruteforce():
    from collections import Counter
    from illumio_ray.pipelines.queries import REGISTRY

    texts = ["aabbc", "zzzz", "ab", "", None, "héllo wörld", "a" * 100 + "b"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["doc_char_entropy"].fn(d).to_pandas().set_index("doc_id")
    # empty and null docs are excluded
    assert sorted(out.index) == [0, 1, 2, 5, 6]
    for i, t in enumerate(texts):
        if not t:
            continue
        c = np.array(list(Counter(t).values()), np.float64)
        p = c / c.sum()
        ref = round(float(-(p * np.log(p)).sum()), 6)
        assert abs(out.loc[i, "entropy"] - ref) <= 1e-9, (i, t)
    assert out.loc[1, "entropy"] == 0.0  # single-symbol doc


def test_corpus_trigram_df_counts_distinct_docs_not_tokens():
    from illumio_ray.pipelines.queries import REGISTRY

    texts = [
        "the cookie banner appears the cookie banner appears",  # gram twice, df 1
        "the cookie banner is here",
        "short doc",            # <3 tokens → whole-text gram
        "the  cookie   banner",  # multi-space split, exactly one gram
        "THE COOKIE BANNER x",   # lowercased
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["corpus_trigram_df_top"].fn(d).to_pandas()
    got = dict(zip(out.gram, out.df))
    # document frequency, not token frequency: doc 0 counts once
    assert got["the cookie banner"] == 4
    assert got["short doc"] == 1


def test_leakage_safe_split_keeps_clusters_together():
    from illumio_ray.pipelines.queries import REGISTRY

    base = " ".join(f"tok{j}" for j in range(30))
    texts = [base, base + " extra", base + " other",      # near-dup cluster 0,1,2
             "completely different words entirely here again " * 3,
             "another standalone document with its own vocabulary"]
    df = pd.DataFrame({"doc_id": [10, 11, 12, 20, 30], "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["doc_split_leakage_safe"].fn(d).to_pandas()
    out = out.set_index("doc_id")
    assert len(out) == 5
    # the near-dup cluster shares one group id (min member) and ONE split
    cluster = out.loc[[10, 11, 12]]
    assert set(cluster.group_id) == {10}
    assert cluster.split.nunique() == 1
    # singletons are their own group
    assert out.loc[20, "group_id"] == 20 and out.loc[30, "group_id"] == 30
    # split labels are the md5-prefix convention shared with doc_split_assign
    import hashlib
    for did, row in out.iterrows():
        exp = ("train" if hashlib.md5(str(row.group_id).encode())
               .hexdigest()[:8] < "cccccccd" else "val")
        assert row.split == exp


def test_doc_ttr_counts_types_and_tokens():
    from illumio_ray.pipelines.queries import REGISTRY

    texts = ["a b a b c", "x x x x", "  ", None, "Mixed MIXED mixed"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["doc_ttr"].fn(d).to_pandas().set_index("doc_id")
    # whitespace-only and null docs drop out (no tokens)
    assert sorted(out.index) == [0, 1, 4]
    assert (out.loc[0, "n_tokens"], out.loc[0, "n_types"]) == (5, 3)
    assert out.loc[0, "ttr"] == 0.6
    assert (out.loc[1, "n_tokens"], out.loc[1, "n_types"]) == (4, 1)
    # lowercased before typing: one type
    assert (out.loc[4, "n_tokens"], out.loc[4, "n_types"]) == (3, 1)


def test_corpus_zipf_alpha_matches_bruteforce_ranks():
    from illumio_ray.pipelines.queries import REGISTRY
    from collections import Counter

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    p = (1.0 / np.arange(1, 41)) ** 1.2
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=60, p=p)) for _ in range(50)]
    df = pd.DataFrame({"doc_id": range(50), "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["corpus_zipf_alpha"].fn(d).to_pandas()
    # brute-force reference: rank all words by freq desc, fit lnn ~ lnr
    c = Counter(w for t in texts for w in t.split())
    n = np.array(sorted(c.values(), reverse=True), np.float64)
    r = np.arange(1, len(n) + 1, dtype=np.float64)
    x, y = np.log(r), np.log(n)
    slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    assert out.n_types[0] == len(c)
    assert abs(out.zipf_slope[0] - round(slope, 6)) <= 1e-6
    assert out.zipf_slope[0] < -0.5  # a Zipfian corpus slopes down


@pytest.mark.parametrize("nblocks", [1, 7])
def test_gini_matches_bruteforce_and_is_partition_invariant(nblocks):
    from illumio_ray.ops import stats as stat_ops

    rng = np.random.default_rng(23)
    # heavy ties + a pathological boundary: many equal values
    v = np.concatenate([rng.lognormal(1, 1, 900).round(1),
                        np.full(300, 5.0), [0.0] * 10])
    rng.shuffle(v)
    df = pd.DataFrame({"value": v})
    out = stat_ops.gini(rd.from_pandas(df).repartition(nblocks), "value").to_pandas()
    s = np.sort(v)
    i = np.arange(1, len(s) + 1)
    ref = 2.0 * (i * s).sum() / (len(s) * s.sum()) - (len(s) + 1.0) / len(s)
    assert out.n[0] == len(v)
    assert abs(out.gini[0] - round(ref, 6)) <= 1e-9


def test_gini_extremes():
    from illumio_ray.ops import stats as stat_ops

    # uniform mass → 0; single holder → (n-1)/n
    eq = stat_ops.gini(rd.from_pandas(pd.DataFrame({"v": [3.0] * 50})), "v").to_pandas()
    assert eq.gini[0] == 0.0
    one = stat_ops.gini(rd.from_pandas(
        pd.DataFrame({"v": [0.0] * 9 + [10.0]})), "v").to_pandas()
    assert abs(one.gini[0] - 0.9) <= 1e-9


def test_jpeg_codec_roundtrip_444_420_gray_and_edges():
    from illumio_ray.ops.codecs import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(3)
    base = np.clip(np.add.outer(np.linspace(0, 255, 52),
                                np.linspace(0, 255, 60)) / 2
                   + rng.normal(0, 3, (52, 60)), 0, 255).astype(np.uint8)
    rgb = np.stack([base, base[::-1], (base // 2 + 60)], axis=-1)
    for sub in ("444", "420"):
        b = jpeg_encode(rgb, 75, subsampling=sub)
        assert b == jpeg_encode(rgb, 75, subsampling=sub)  # deterministic
        d = jpeg_decode(b)
        assert d.shape == rgb.shape
        assert np.abs(d.astype(float) - rgb).mean() < 5.0
    # gray, non-multiple-of-8 dims
    g = base[:33, :41]
    dg = jpeg_decode(jpeg_encode(g, 85))
    assert dg.shape == g.shape and np.abs(dg.astype(float) - g).mean() < 4.0
    # flat image reconstructs exactly; 1x1 survives
    flat = np.full((16, 16), 200, np.uint8)
    assert (jpeg_decode(jpeg_encode(flat, 50)) == flat).all()
    assert jpeg_decode(jpeg_encode(np.array([[137]], np.uint8))).tolist() == [[137]]
    # higher quality → closer reconstruction and more bytes
    lo, hi = jpeg_encode(rgb, 10), jpeg_encode(rgb, 95)
    assert len(hi) > len(lo)
    assert (np.abs(jpeg_decode(hi).astype(float) - rgb).mean()
            < np.abs(jpeg_decode(lo).astype(float) - rgb).mean())
    # honest fail-fast on non-baseline input
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")


def test_multimodal_real_jpeg_stage_dims_and_dup_ahash():
    from illumio_ray.ops import multimodal
    from illumio_ray.ops.codecs import jpeg_decode

    ids = np.array([0, 1, 2, 3, 2])  # duplicate id 2 → identical payloads
    payloads = multimodal.synth_jpeg_payloads(ids)
    df = pd.DataFrame({"doc_id": ids, "payload": payloads})
    out = multimodal.decode_jpeg_metadata(
        rd.from_arrow(pa.Table.from_pandas(df))).to_pandas()
    assert len(out) == 5
    for _, row in out.iterrows():
        img = jpeg_decode(payloads[list(ids).index(row.doc_id)])
        assert (row.width, row.height) == (img.shape[1], img.shape[0])
        assert row.channels == 3
    dups = out[out.doc_id == 2]
    assert dups.ahash.nunique() == 1  # identical payloads → equal ahash


def test_multimodal_jpeg_resize_outputs_valid_jpegs():
    from illumio_ray.ops import multimodal
    from illumio_ray.ops.codecs import jpeg_decode

    ids = np.array([0, 1, 5, 8])
    df = pd.DataFrame({"doc_id": ids,
                       "payload": multimodal.synth_jpeg_payloads(ids)})
    out = multimodal.resize_jpeg(
        rd.from_arrow(pa.Table.from_pandas(df)), max_w=24,
        max_h=24).to_pandas()
    for _, row in out.iterrows():
        img = jpeg_decode(row.payload)
        assert (img.shape[1], img.shape[0]) == (row.out_width, row.out_height)
        assert max(row.out_width, row.out_height) <= 24


@pytest.mark.parametrize("nblocks", [1, 9])
def test_ks_two_sample_matches_scipy_style_bruteforce(nblocks):
    from illumio_ray.ops import stats as stat_ops

    rng = np.random.default_rng(31)
    va = rng.normal(0, 1, 700).round(3)
    vb = rng.normal(0.4, 1.3, 500).round(3)  # shifted+scaled → real gap
    df = pd.DataFrame({
        "g": ["a"] * len(va) + ["b"] * len(vb) + ["other"] * 50,
        "v": np.concatenate([va, vb, rng.normal(9, 1, 50)]),
    })
    out = stat_ops.ks_two_sample(
        rd.from_pandas(df).repartition(nblocks), "g", "v", "a", "b")
    allv = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(np.sort(va), allv, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), allv, side="right") / len(vb)
    ref = np.abs(fa - fb).max()
    assert out["n_a"][0].as_py() == len(va)
    assert out["n_b"][0].as_py() == len(vb)
    assert abs(out["ks"][0].as_py() - round(ref, 6)) <= 1e-6
    assert out["ks"][0].as_py() > 0.1  # the shift is detectable


def test_ks_two_sample_identical_distributions_near_zero():
    from illumio_ray.ops import stats as stat_ops

    v = np.arange(500, dtype=np.float64)
    df = pd.DataFrame({"g": ["a", "b"] * 500,
                       "v": np.concatenate([v, v])[np.argsort(
                           np.tile(np.arange(500), 2), kind="stable")]})
    # identical samples in both groups → ks == 0 exactly
    df = pd.DataFrame({"g": ["a"] * 500 + ["b"] * 500,
                       "v": np.concatenate([v, v])})
    out = stat_ops.ks_two_sample(rd.from_pandas(df), "g", "v", "a", "b")
    assert out["ks"][0].as_py() == 0.0


def test_vocab_coverage_curve_monotone_and_exact():
    from illumio_ray.pipelines.queries import REGISTRY
    from collections import Counter

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    p = (1.0 / np.arange(1, 501)) ** 1.1
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=80, p=p)) for _ in range(60)]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        out = REGISTRY["corpus_vocab_coverage_topk"].fn(d).to_pandas()
    c = Counter(w for t in texts for w in t.split())
    n = np.array(sorted(c.values(), reverse=True), np.float64)
    tot = n.sum()
    for _, row in out.iterrows():
        ref = round(n[:int(row.k)].sum() / tot, 6)
        assert abs(row.coverage - ref) <= 1e-9, row.k
    cov = out.sort_values("k").coverage.to_numpy()
    assert (np.diff(cov) >= 0).all() and cov[-1] <= 1.0


def test_jpeg_codec_property_roundtrip_random_images():
    from hypothesis import given, settings, strategies as st
    from illumio_ray.ops.codecs import jpeg_decode, jpeg_encode

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 25), st.integers(1, 25), st.integers(0, 2 ** 32 - 1),
           st.sampled_from(["444", "420"]), st.booleans())
    def prop(w, h, seed, sub, gray):
        rng = np.random.default_rng(seed)
        # smooth base + bounded noise: JPEG is built for this; pure noise
        # would only bound error loosely. Structural bugs (huffman, MCU
        # layout, upsampling) blow far past the tolerance or raise.
        base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
        img = np.clip(base + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
        if not gray:
            # chroma varies smoothly with luma: 4:2:0 box-averages chroma
            # 2x2, so adversarial per-pixel chroma flips would measure the
            # subsampling's designed loss, not codec correctness
            img = np.stack([img,
                            np.clip(img * 0.7 + 30, 0, 255).astype(np.uint8),
                            np.clip(img * 0.5 + 80, 0, 255).astype(np.uint8)],
                           axis=-1)
        data = jpeg_encode(img, 85, subsampling=sub)
        assert data == jpeg_encode(img, 85, subsampling=sub)
        dec = jpeg_decode(data)
        assert dec.shape == img.shape
        assert np.abs(dec.astype(float) - img).mean() < 16.0

    prop()


def test_zipf_chunk_descriptors_cover_ranks_exactly():
    from illumio_ray.pipelines.queries import _zipf_chunk_descriptors

    # tie groups incl. one far larger than the chunk (the f=1 tail)
    f = np.array([7, 1, 3], np.int64)
    m = np.array([2, 25, 4], np.int64)
    cf, cs, cl, n_types = _zipf_chunk_descriptors(f, m, chunk=10)
    assert n_types == 31
    # ranks 1..31 covered exactly once, in freq-desc order
    covered = np.concatenate([np.arange(s, s + l) for s, l in zip(cs, cl)])
    assert sorted(covered.tolist()) == list(range(1, 32))
    # freq of each rank matches the histogram sorted by f desc
    by_rank = {}
    for fi, s, l in zip(cf, cs, cl):
        for r in range(s, s + l):
            by_rank[r] = fi
    assert [by_rank[r] for r in (1, 2, 3, 6, 7, 31)] == [7, 7, 3, 3, 1, 1]
    # the 25-wide group split into <=10-rank chunks
    assert max(cl) <= 10
    assert _zipf_chunk_descriptors(np.array([], np.int64),
                                   np.array([], np.int64)) == ([], [], [], 0)
