"""Checkpoint-resume suite (SURVEY.md §5 test 2): kill mid-run, resume,
assert the union of committed shards covers every input row exactly once
— no duplicates, no drops (≙ reference state.json semantics,
app/s3_manager.py:253-267,356-359)."""

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from illumio_ray.pipelines.flagship import run_flagship
from illumio_ray.state import lineage
from illumio_ray.synth import synth_pages

from .oracle import BODY


def _routed_urls(out_dir):
    t = pads.dataset(str(out_dir / "routed"), partitioning="hive").to_table(
        columns=["url"]
    )
    return t["url"].to_pylist()


def test_mid_run_kill_then_resume(tmp_path):
    info = synth_pages(tmp_path / "in", rows=1200, num_files=8)
    out = tmp_path / "out"

    with pytest.raises(RuntimeError, match="simulated failure"):
        run_flagship(info["pages_dir"], out, info["lookup_lang"],
                     info["lookup_host"], num_shards=4, fail_after_shards=2)

    partial = lineage.load_manifests(out)
    assert len(partial) == 2  # two shards committed before the kill

    # Resume: must run only the remaining shards.
    metrics = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                           info["lookup_host"], num_shards=4)
    assert metrics["shards_run_this_invocation"] == 2
    assert metrics["shards_total"] == 4

    # Exactly-once: routed urls == input urls minus truncated-html rows.
    pages = pads.dataset(info["pages_dir"]).to_table(columns=["url", "html"])
    expected = {
        u for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
        if BODY.search(h.decode())
    }
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls)), "duplicate rows after resume"
    assert set(urls) == expected, "dropped or extra rows after resume"

    # Manifests cover every input fragment exactly once.
    manifests = lineage.load_manifests(out)
    frags = [f for m in manifests.values() for f in m["input_fragments"]]
    assert sorted(frags) == lineage.list_fragments(info["pages_dir"])
    assert len(frags) == len(set(frags))


def test_corrupt_manifest_reprocessed_exactly_once(tmp_path):
    """A torn/corrupted manifest (crash mid-write, disk corruption) must be
    treated as uncommitted: its shard is swept and re-run on resume, and the
    union of committed shards still covers every row exactly once."""
    info = synth_pages(tmp_path / "in", rows=800, num_files=4)
    out = tmp_path / "out"
    run_flagship(info["pages_dir"], out, info["lookup_lang"],
                 info["lookup_host"], num_shards=4)
    baseline = sorted(_routed_urls(out))

    # corrupt one committed manifest: truncated JSON
    victim = lineage.manifest_dir(out) / "shard-00002.json"
    victim.write_text(victim.read_text()[: 17])

    assert len(lineage.load_manifests(out)) == 3  # torn → uncommitted

    metrics = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                           info["lookup_host"], num_shards=4)
    assert metrics["shards_run_this_invocation"] == 1  # only the torn shard
    assert len(lineage.load_manifests(out)) == 4

    urls = _routed_urls(out)
    assert len(urls) == len(set(urls)), "duplicates after corrupt-manifest recovery"
    assert sorted(urls) == baseline, "row set changed after recovery"


def test_uncommitted_partial_output_is_discarded(tmp_path):
    info = synth_pages(tmp_path / "in", rows=600, num_files=4)
    out = tmp_path / "out"
    # Fake a torn shard dir (data written, no manifest) — must be redone.
    torn = lineage.shard_dir(out, 1)
    torn.mkdir(parents=True)
    (torn / "garbage.parquet").write_bytes(b"not parquet")

    metrics = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                           info["lookup_host"], num_shards=2)
    assert metrics["shards_run_this_invocation"] == 2
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls))


def test_worker_death_mid_shard_exactly_once(tmp_path, monkeypatch):
    """Task-level fault tolerance, one level below the driver-kill resume
    suite: a worker PROCESS dies mid-task inside a shard pipeline
    (os._exit — what Ray sees on an OOM-kill or node loss). Ray must
    retry the task on a fresh worker, and the content-addressed output
    names (make_write_summarize) must make any replayed write overwrite
    rather than duplicate, so the run completes exactly-once with NO
    resume step. The crash fires exactly once per test via an O_EXCL
    sentinel committed before the exit."""
    import os

    import illumio_ray.pipelines.flagship as fl

    real = fl.extract_page_fields
    sentinel = str(tmp_path / "crashed-once")

    def crash_once_then_extract(t):
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            pass
        else:
            os.close(fd)
            os._exit(1)  # kill THIS worker mid-task
        return real(t)

    monkeypatch.setattr(fl, "extract_page_fields", crash_once_then_extract)
    info = synth_pages(tmp_path / "in", rows=800, num_files=4)
    out = tmp_path / "out"
    metrics = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                           info["lookup_host"], num_shards=2)
    assert os.path.exists(sentinel), "fault was never injected"
    assert metrics["shards_run_this_invocation"] == 2

    pages = pads.dataset(info["pages_dir"]).to_table(columns=["url", "html"])
    expected = {
        u for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
        if BODY.search(h.decode())
    }
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls)), "duplicate rows after task retry"
    assert set(urls) == expected, "dropped or extra rows after task retry"


def test_completed_run_resume_is_noop(tmp_path):
    info = synth_pages(tmp_path / "in", rows=400, num_files=4)
    out = tmp_path / "out"
    run_flagship(info["pages_dir"], out, info["lookup_lang"],
                 info["lookup_host"], num_shards=2)
    m2 = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                      info["lookup_host"], num_shards=2)
    assert m2["shards_run_this_invocation"] == 0


def test_incremental_processes_only_new_fragments(tmp_path):
    """Poll-loop semantics (reference app/main.py:339-384): a second
    invocation after new files arrive processes only the new fragments and
    the aggregate covers everything exactly once."""
    import pyarrow.dataset as pads

    from illumio_ray.pipelines.flagship import run_incremental
    from illumio_ray.synth import _write_fragment, synth_pages

    info = synth_pages(tmp_path / "in", rows=1200, num_files=4)
    out = tmp_path / "out"
    m1 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], fragments_per_shard=2)
    assert m1["shards_run_this_invocation"] == 2
    rows1 = m1["rows_routed"]

    # two new fragments "arrive" (distinct content via fresh frag indices)
    _write_fragment((100, 300, 10_000, 42, info["pages_dir"]))
    _write_fragment((101, 300, 10_300, 42, info["pages_dir"]))

    m2 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], fragments_per_shard=2)
    assert m2["shards_run_this_invocation"] == 1
    assert m2["new_fragments"] == 2
    assert m2["rows_routed"] > rows1

    # third run: nothing new → no work, same totals
    m3 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], fragments_per_shard=2)
    assert m3["shards_run_this_invocation"] == 0
    assert m3["rows_routed"] == m2["rows_routed"]

    # exactly-once across all routed output
    routed = pads.dataset(str(out / "routed"), partitioning="hive").to_table(
        columns=["url"])
    assert routed.num_rows == m2["rows_routed"]
    assert len(set(routed["url"].to_pylist())) == routed.num_rows

    # aggregate covers all committed docs
    agg = pads.dataset(str(out / "aggregates")).to_table()
    import pyarrow.compute as pc
    assert pc.sum(agg["n_docs"]).as_py() == m2["rows_routed"]


def test_incremental_empty_input_is_noop(tmp_path):
    from illumio_ray.pipelines.flagship import run_incremental
    from illumio_ray.synth import lookup_tables
    import pyarrow.parquet as pq

    (tmp_path / "pages").mkdir()
    lang, host = lookup_tables()
    pq.write_table(lang, tmp_path / "lang.parquet")
    pq.write_table(host, tmp_path / "host.parquet")
    m = run_incremental(tmp_path / "pages", tmp_path / "out",
                        str(tmp_path / "lang.parquet"),
                        str(tmp_path / "host.parquet"))
    assert m["rows_routed"] == 0
    assert m["shards_run_this_invocation"] == 0


def test_replan_with_fewer_shards_removes_stale_dirs(tmp_path):
    import pyarrow.dataset as pads

    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import synth_pages

    info = synth_pages(tmp_path / "in", rows=1200, num_files=4)
    out = tmp_path / "out"
    m1 = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                      info["lookup_host"], num_shards=4)
    m2 = run_flagship(info["pages_dir"], out, info["lookup_lang"],
                      info["lookup_host"], num_shards=2, resume=False)
    assert m1["rows_routed"] == m2["rows_routed"]
    routed = pads.dataset(str(out / "routed"), partitioning="hive").to_table(
        columns=["url"])
    # no stale shard dirs from the 4-shard plan → no duplicate urls
    assert routed.num_rows == m2["rows_routed"]
    assert len(set(routed["url"].to_pylist())) == routed.num_rows


def test_watch_daemon_kill9_mid_watch_exactly_once(tmp_path):
    """The reference poll-loop daemon reality (app/main.py:339-384), end to
    end through the REAL CLI in a subprocess: start `run --incremental
    --watch`, let fragments arrive BETWEEN polls, SIGKILL the daemon while
    it is live, restart, and assert every url is routed exactly once.

    The subprocess owns a private Ray instance (address="local" in a new
    process group); the kill takes down its whole group so no orphaned
    raylet survives. Kill timing is deliberately loose — the shard commit
    protocol must make ANY kill point safe, so the assertions don't depend
    on where it lands."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from illumio_ray.pipelines.flagship import run_incremental
    from illumio_ray.synth import _write_fragment

    info = synth_pages(tmp_path / "in", rows=600, num_files=4)
    out = tmp_path / "out"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(__import__("pathlib").Path(__file__).parents[1])
    env.pop("RAY_ADDRESS", None)  # own instance, never the test session
    proc = subprocess.Popen(
        [sys.executable, "-m", "illumio_ray", "run",
         "--pages-dir", str(info["pages_dir"]), "--out", str(out),
         "--lang", info["lookup_lang"], "--host", info["lookup_host"],
         "--incremental", "--watch", "--poll-interval", "0.3",
         "--max-polls", "1000", "--fragments-per-shard", "2"],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def wait_manifests(n, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("watch daemon exited early")
            if len(lineage.load_manifests(out)) >= n:
                return
            time.sleep(0.25)
        raise AssertionError(f"timed out waiting for {n} manifests")

    try:
        wait_manifests(2)                      # initial 4 fragments → 2 shards
        _write_fragment((300, 150, 30_000, 11, info["pages_dir"]))
        _write_fragment((301, 150, 30_150, 11, info["pages_dir"]))
        wait_manifests(3)                      # picked up BETWEEN polls
        # more data arrives, then the daemon dies hard mid-watch
        _write_fragment((302, 150, 30_300, 11, info["pages_dir"]))
        _write_fragment((303, 150, 30_450, 11, info["pages_dir"]))
        time.sleep(0.5)                        # let it get into the poll
    finally:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

    # restart the daemon (one poll of the same incremental plan, in the
    # test session's Ray): finishes whatever the kill interrupted
    m = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                        info["lookup_host"], fragments_per_shard=2)

    pages = pads.dataset(info["pages_dir"]).to_table(columns=["url", "html"])
    expected = {
        u for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
        if BODY.search(h.decode())
    }
    urls = _routed_urls(out)
    assert len(urls) == len(set(urls)), "duplicate rows after kill-resume"
    assert set(urls) == expected, "dropped or extra rows after kill-resume"
    assert m["rows_routed"] == len(expected)

    # manifests cover every fragment exactly once
    manifests = lineage.load_manifests(out)
    frags = [f for mm in manifests.values() for f in mm["input_fragments"]]
    assert sorted(frags) == lineage.list_fragments(info["pages_dir"])
    assert len(frags) == len(set(frags))


def test_watch_late_data_invalidate_consistency(tmp_path):
    """One scenario chaining the daemon-mode realities (VERDICT r2
    stretch): a look-back window predicate, late-arriving fragments
    between polls, and an upstream correction (shard invalidation) —
    after the next poll the aggregate must equal a from-scratch run over
    the same final input, and routed output must stay exactly-once."""
    import pandas as pd
    import pyarrow.dataset as pads

    from illumio_ray.pipelines.flagship import run_incremental
    from illumio_ray.state import lineage
    from illumio_ray.synth import _write_fragment, synth_pages

    window = ("2024-10-01T06:00:00", "2024-10-02T12:00:00")
    info = synth_pages(tmp_path / "in", rows=1500, num_files=4)
    out = tmp_path / "out"
    kw = dict(fragments_per_shard=2, time_window=window)

    m1 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], **kw)
    assert m1["shards_run_this_invocation"] == 2

    # late data arrives between polls
    _write_fragment((200, 400, 20_000, 7, info["pages_dir"]))
    _write_fragment((201, 400, 20_400, 7, info["pages_dir"]))
    m2 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], **kw)
    assert m2["shards_run_this_invocation"] == 1

    # upstream correction: drop one committed shard, next poll re-ingests
    victim = min(lineage.load_manifests(out))
    lineage.remove_shard(out, victim)
    m3 = run_incremental(info["pages_dir"], out, info["lookup_lang"],
                         info["lookup_host"], **kw)
    assert m3["shards_run_this_invocation"] >= 1

    def _load(d):
        agg = pads.dataset(str(d / "aggregates")).to_table().to_pandas()
        return agg.sort_values(["sink", "lang", "hour"]).reset_index(drop=True)

    # from-scratch run over the same final fragment set
    out2 = tmp_path / "out_scratch"
    run_incremental(info["pages_dir"], out2, info["lookup_lang"],
                    info["lookup_host"], **kw)
    pd.testing.assert_frame_equal(_load(out), _load(out2))

    routed = pads.dataset(str(out / "routed"), partitioning="hive").to_table(
        columns=["url"])
    assert len(set(routed["url"].to_pylist())) == routed.num_rows == m3["rows_routed"]
