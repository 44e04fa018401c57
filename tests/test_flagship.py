"""Routed-equality suite (SURVEY.md §5 test 1): the Ray pipeline vs a
pure-Python per-row oracle, including the byte-identity invariant on
extracted_text and the SIEM wire string."""

import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from illumio_ray.pipelines.flagship import aggregate_routed, build_routed
from illumio_ray.stages.enrich import broadcast_lookups
from illumio_ray.synth import synth_pages

from .oracle import BODY, run_oracle


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("flag")
    info = synth_pages(base, rows=1500, num_files=8)
    pages_ds = rd.read_parquet(info["pages_dir"])
    lookups = broadcast_lookups(info["lookup_lang"], info["lookup_host"])
    routed = build_routed(pages_ds, lookups, enrich_concurrency=2).to_pandas()

    pages_df = pads.dataset(info["pages_dir"]).to_table().to_pandas()
    oracle_rows = pd.DataFrame(
        run_oracle(
            pages_df,
            pq.read_table(info["lookup_lang"]).to_pandas(),
            pq.read_table(info["lookup_host"]).to_pandas(),
        )
    )
    return routed, oracle_rows


def test_routed_equality(small_run):
    routed, oracle = small_run
    assert len(routed) == len(oracle)
    r = routed.sort_values("url").reset_index(drop=True)
    o = oracle.sort_values("url").reset_index(drop=True)
    assert list(r.url) == list(o.url)
    for col in ["url_host", "url_path", "title", "page_event", "event_class",
                "lang_name", "lang_family", "host_category", "n_tokens"]:
        pd.testing.assert_series_equal(
            r[col], o[col], check_names=False, check_dtype=False, obj=col
        )


def test_byte_identity_extracted_text(small_run):
    """BASELINE.json input_hint invariant: byte-identical extracted text
    per url (extraction out of html must reproduce the text column)."""
    routed, oracle = small_run
    r = routed.sort_values("url").reset_index(drop=True)
    o = oracle.sort_values("url").reset_index(drop=True)
    assert all(
        a.encode() == b.encode() for a, b in zip(r.extracted_text, o.extracted_text)
    )


def test_wire_byte_identity(small_run):
    routed, oracle = small_run
    r = routed.sort_values("url").reset_index(drop=True)
    o = oracle.sort_values("url").reset_index(drop=True)
    mism = [(a, b) for a, b in zip(r.wire, o.wire) if a != b]
    assert not mism, mism[:2]
    assert all(len(w) <= 2048 + 18 for w in r.wire)


def test_dropped_rows_are_truncated_only(small_run, tmp_path):
    routed, oracle = small_run
    assert len(routed) == len(oracle)  # oracle drops exactly the truncated rows


def test_dead_letter_counts_in_manifest_and_metrics(tmp_path):
    """Dead-letter accounting (≙ reference drop-invalid logging): the
    manifest and run metrics report exactly the parse-dropped row count."""
    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.state import lineage

    info = synth_pages(tmp_path / "in", rows=900, num_files=4)
    out = tmp_path / "out"
    m = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                     info["lookup_host"], num_shards=3)
    pages = pads.dataset(info["pages_dir"]).to_table(columns=["html"])
    n_bad = sum(1 for h in pages["html"].to_pylist()
                if not BODY.search(h.decode()))
    assert m["rows_dropped"] == n_bad
    manifests = lineage.load_manifests(out)
    assert sum(x["rows_dropped"] for x in manifests.values()) == n_bad
    assert sum(x["rows_in"] for x in manifests.values()) == 900


def test_aggregate_counts(small_run):
    routed, oracle = small_run
    exp = (
        oracle.groupby(["event_class", "lang", "hour"], as_index=False)
        .agg(n_docs=("url", "count"), sum_tokens=("n_tokens", "sum"))
        .rename(columns={"event_class": "sink"})
        .sort_values(["sink", "lang", "hour"])
        .reset_index(drop=True)
    )
    got = (
        aggregate_routed(rd.from_pandas(routed[["event_class", "lang", "hour", "n_tokens"]]))
        .to_pandas()
        .sort_values(["sink", "lang", "hour"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["sink", "lang", "hour", "n_docs", "sum_tokens"]], exp, check_dtype=False
    )


def test_enrich_actor_mode_matches_task_mode(tmp_path):
    """The actor-pool Enricher (stateful-stage pattern) and the fused task
    mode must produce identical routed rows."""
    import ray.data as rd

    from illumio_ray.pipelines.flagship import build_routed
    from illumio_ray.stages.enrich import broadcast_lookups
    from illumio_ray.synth import synth_pages

    info = synth_pages(tmp_path, rows=1200, num_files=4)
    lk = broadcast_lookups(info["lookup_lang"], info["lookup_host"])
    pages = rd.read_parquet(info["pages_dir"])
    a = build_routed(pages, lk, enrich_mode="task").to_pandas()
    b = build_routed(pages, lk, enrich_mode="actor",
                     enrich_concurrency=2).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values("url").reset_index(drop=True)
    b = b[cols].sort_values("url").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_enrich_actor_death_mid_batch_exactly_once(tmp_path, monkeypatch):
    """Actor-pool fault tolerance: an Enricher ACTOR process dies
    mid-batch (os._exit — OOM-kill shape); Ray must replace the actor and
    re-run the batch, producing the same routed rows as the task-mode
    pipeline with no duplicates. One crash per test via an O_EXCL
    sentinel (the companion worker-death test covers the fused task
    mode)."""
    import os

    import ray.data as rd

    import illumio_ray.pipelines.flagship as fl
    from illumio_ray.stages.enrich import Enricher, broadcast_lookups
    from illumio_ray.synth import synth_pages

    sentinel = str(tmp_path / "crashed-once")

    class CrashOnceEnricher(Enricher):
        _sentinel = sentinel

        def __call__(self, batch):
            try:
                fd = os.open(self._sentinel, os.O_CREAT | os.O_EXCL)
            except FileExistsError:
                pass
            else:
                os.close(fd)
                os._exit(1)  # kill THIS actor process mid-batch
            return super().__call__(batch)

    info = synth_pages(tmp_path / "in", rows=1200, num_files=4)
    lk = broadcast_lookups(info["lookup_lang"], info["lookup_host"])
    pages = rd.read_parquet(info["pages_dir"])
    expected = fl.build_routed(pages, lk, enrich_mode="task").to_pandas()

    monkeypatch.setattr(fl, "Enricher", CrashOnceEnricher)
    got = fl.build_routed(pages, lk, enrich_mode="actor",
                          enrich_concurrency=2).to_pandas()
    assert os.path.exists(sentinel), "fault was never injected"
    cols = sorted(expected.columns)
    a = expected[cols].sort_values("url").reset_index(drop=True)
    b = got[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sweep_stale_removes_unmanifested_dirs(tmp_path):
    from illumio_ray.state import lineage

    routed = tmp_path / "routed"
    (routed / "shard=00000.tmp").mkdir(parents=True)
    (routed / "shard=00007").mkdir()
    lineage.write_manifest(tmp_path, 1, {"input_fragments": [], "row_count": 0,
                                         "content_hash": 0})
    (routed / "shard=00001").mkdir()
    lineage.sweep_stale(tmp_path)
    assert not (routed / "shard=00000.tmp").exists()
    assert not (routed / "shard=00007").exists()   # no manifest -> removed
    assert (routed / "shard=00001").exists()       # committed -> kept


def test_run_flagship_actor_mode_end_to_end(tmp_path):
    import pyarrow.dataset as pads

    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import synth_pages

    info = synth_pages(tmp_path / "in", rows=1000, num_files=2)
    # serial shards + autoscaling (1,2) pool: an actor pool that reserves
    # every test-session CPU would starve the read/write tasks and deadlock
    m = run_flagship(info["pages_dir"], tmp_path / "out", info["lookup_lang"],
                     info["lookup_host"], num_shards=2, enrich_mode="actor",
                     enrich_concurrency=(1, 2), max_concurrent_shards=1)
    routed = pads.dataset(str(tmp_path / "out" / "routed"),
                          partitioning="hive").to_table(columns=["url"])
    assert routed.num_rows == m["rows_routed"] > 0
    assert len(set(routed["url"].to_pylist())) == routed.num_rows


def test_heartbeat_live_and_final_beats(tmp_path):
    """In-run heartbeat (≙ reference health_reporter thread): periodic
    beats during the run, a final beat on clean exit, and — after a
    mid-run failure — a final beat that reports exactly the committed
    shards with ok=false."""
    import json

    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import synth_pages

    info = synth_pages(tmp_path / "in", rows=800, num_files=4)
    out = tmp_path / "out"
    m = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                     info["lookup_host"], num_shards=2,
                     heartbeat_interval=0.05)
    hb = json.loads((out / "_heartbeat.json").read_text())
    assert hb["in_progress"] is False and hb["ok"] is True
    assert hb["shards_committed"] == hb["shards_planned"] == 2
    assert hb["rows_routed_committed"] == m["rows_routed"] > 0
    assert hb["rows_per_sec"] > 0

    out2 = tmp_path / "out2"
    with pytest.raises(RuntimeError, match="simulated failure"):
        run_flagship(info["pages_dir"], out2, info["lookup_lang"],
                     info["lookup_host"], num_shards=4,
                     fail_after_shards=2, heartbeat_interval=0.05)
    hb2 = json.loads((out2 / "_heartbeat.json").read_text())
    assert hb2["in_progress"] is False and hb2["ok"] is False
    assert hb2["shards_committed"] == 2 and hb2["shards_planned"] == 4


def test_run_shard_fails_fast_on_schema_drift(tmp_path):
    """A drifted upstream schema (warc_ts as string) must surface as one
    clear contract error before any shard work is scheduled."""
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import synth_pages

    info = synth_pages(tmp_path / "in", rows=200, num_files=2)
    # rewrite one fragment with warc_ts stringified (upstream drift)
    frag = sorted(Path(info["pages_dir"]).glob("*.parquet"))[0]
    t = pq.read_table(frag)
    drifted = t.set_column(t.schema.get_field_index("warc_ts"), "warc_ts",
                           pc.cast(t["warc_ts"], pa.string()))
    pq.write_table(drifted, frag)

    with pytest.raises(Exception, match="schema contract"):
        run_flagship(info["pages_dir"], tmp_path / "out",
                     info["lookup_lang"], info["lookup_host"],
                     num_shards=2)
