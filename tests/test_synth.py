import pyarrow.dataset as pads

from illumio_ray.schema import PAGES_SCHEMA
from illumio_ray.synth import synth_pages


def test_synth_deterministic_and_schema(tmp_path):
    a = synth_pages(tmp_path / "a", rows=500, num_files=4)
    b = synth_pages(tmp_path / "b", rows=500, num_files=4)
    ta = pads.dataset(a["pages_dir"]).to_table().sort_by("url")
    tb = pads.dataset(b["pages_dir"]).to_table().sort_by("url")
    assert ta.schema.equals(PAGES_SCHEMA)
    assert ta.equals(tb)
    assert ta.num_rows == 500
    # urls unique
    import pyarrow.compute as pc
    assert len(pc.unique(ta["url"])) == 500


def test_synth_idempotent_marker(tmp_path):
    a = synth_pages(tmp_path / "x", rows=200, num_files=2)
    files = sorted(p.name for p in (tmp_path / "x" / "pages").glob("*.parquet"))
    mtimes = [(tmp_path / "x" / "pages" / f).stat().st_mtime_ns for f in files]
    b = synth_pages(tmp_path / "x", rows=200, num_files=2)
    mtimes2 = [(tmp_path / "x" / "pages" / f).stat().st_mtime_ns for f in files]
    assert mtimes == mtimes2  # second call was a no-op
    assert a["rows"] == b["rows"] == 200


def test_synth_has_malformed_and_missing_event(tmp_path):
    info = synth_pages(tmp_path / "m", rows=2000, num_files=4)
    t = pads.dataset(info["pages_dir"]).to_table()
    htmls = t["html"].to_pylist()
    truncated = sum(1 for h in htmls if b"</body>" not in h)
    no_event = sum(1 for h in htmls if b"</body>" in h and b'name="event"' not in h)
    assert 0 < truncated < 200
    assert 0 < no_event < 200


def test_compact_parquet_merges_small_files(tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from illumio_ray.sources.parquet import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    for i in range(20):  # 20 tiny files
        pq.write_table(pa.table({"x": np.arange(100) + i * 100}),
                       src / f"part-{i:03d}.parquet")
    out = tmp_path / "compact"
    rep = compact_parquet(src, out, target_mb=64)
    assert rep["files_in"] == 20
    assert rep["files_out"] == 1          # tiny input → one block
    got = pq.read_table(out).to_pandas().sort_values("x")
    assert len(got) == 2000 and got.x.is_unique
