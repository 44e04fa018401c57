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
