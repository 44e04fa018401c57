"""Property-based byte-identity: the vectorized extract→enrich→route→wire
pipeline vs the pure-Python per-row oracle, on adversarial inputs the synth
generator never produces (pipes everywhere, unicode, lookup misses, empty
titles, bodies past the 2048-byte wire budget)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from hypothesis import HealthCheck, given, settings, strategies as st

from illumio_ray.pipelines.flagship import build_routed
from illumio_ray.schema import PAGES_SCHEMA
from illumio_ray.stages.enrich import broadcast_lookups
from illumio_ray.synth import lookup_tables
from tests.oracle import run_oracle

# text safe for the <body>(.*?)</body> extraction on BOTH engines:
# no '<' (keeps title/body structure unambiguous), no newlines ('.' matches
# neither in RE2 nor in Python re), plus pipes/unicode/spaces/equals.
_BODY_ALPHABET = "ab |=é漢字ß0._-:;!?"
_TITLE_ALPHABET = "ab |é=. "

_body = st.text(alphabet=_BODY_ALPHABET, min_size=0, max_size=50)
_long_body = st.text(alphabet="a| ", min_size=2100, max_size=2300)
_title = st.text(alphabet=_TITLE_ALPHABET, min_size=0, max_size=12)
_event = st.sampled_from(["login", "error", "page_view", "click", None])
_host = st.sampled_from([
    "host000.example-news.com",      # known host (lookup hit)
    "host006.example-malware.com",   # audit-by-category host
    "unknown-host.example.org",      # lookup miss → null category
])
_lang = st.sampled_from(["en", "de", "xx"])  # xx → lang lookup miss
_ts_us = st.integers(min_value=0, max_value=48 * 3600 * 1_000_000 - 1)

_row = st.fixed_dictionaries({
    "body": st.one_of(_body, _long_body),
    "title": _title,
    "event": _event,
    "host": _host,
    "lang": _lang,
    "ts_us": _ts_us,
    "truncated": st.booleans(),
})


def _mk_pages(rows) -> pa.Table:
    base = np.datetime64("2024-10-01T00:00:00", "us")
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i, r in enumerate(rows):
        meta = ("" if r["event"] is None
                else f'<meta name="event" content="{r["event"]}"/>')
        if r["truncated"]:
            html = f'<html><head><title>{r["title"]}</title>{meta}</head><body>{r["body"]}'
        else:
            html = (f'<html><head><title>{r["title"]}</title>{meta}</head>'
                    f'<body>{r["body"]}</body></html>')
        urls.append(f'https://{r["host"]}/p/{i:010d}.html')
        tss.append(base + np.timedelta64(r["ts_us"], "us"))
        htmls.append(html.encode("utf-8"))
        texts.append(r["body"])
        langs.append(r["lang"])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]"), pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


@settings(max_examples=12, deadline=None,
          # the >2048-byte bodies are the point (wire truncation budget);
          # hypothesis' data_too_large heuristic intermittently trips on them
          suppress_health_check=[HealthCheck.data_too_large])
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_wire_matches_oracle_on_adversarial_rows(rows):
    import tempfile
    from pathlib import Path

    pages = _mk_pages(rows)
    d = Path(tempfile.mkdtemp(prefix="wireprop_"))
    pq.write_table(pages, d / "part-00000.parquet")
    lang_tbl, host_tbl = lookup_tables()
    pq.write_table(lang_tbl, d / "lang.parquet")
    pq.write_table(host_tbl, d / "host.parquet")

    lk = broadcast_lookups(str(d / "lang.parquet"), str(d / "host.parquet"))
    routed = build_routed(rd.read_parquet(str(d / "part-00000.parquet")), lk,
                          with_wire=True).to_pandas()

    oracle = pd.DataFrame(run_oracle(
        pages.to_pandas(), lang_tbl.to_pandas(), host_tbl.to_pandas()))

    assert len(routed) == len(oracle)
    if len(oracle) == 0:
        return
    got = routed.set_index("url").sort_index()
    want = oracle.set_index("url").sort_index()
    assert list(got.index) == list(want.index)
    for col in ["extracted_text", "event_class", "wire"]:
        mism = got[col].fillna("∅") != want[col].fillna("∅")
        assert not mism.any(), (col, got[mism].head(2)[col].tolist(),
                                want[mism].head(2)[col].tolist())


_agg_df = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)),
              st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
    min_size=0, max_size=60)


@settings(max_examples=8, deadline=None)
@given(rows=_agg_df)
def test_grouped_agg_matches_pandas(rows):
    from illumio_ray.ops import relational as rel

    df = pd.DataFrame(rows, columns=["k", "v"])
    df["k"] = df["k"].astype("Int64")
    df["v"] = df["v"].astype("float64")
    out = rel.grouped_agg(rd.from_pandas(df), ["k"], [
        ("v", "sum", "s"), ("v", "count", "n"),
        ("v", "min", "lo"), ("v", "max", "hi"), ("v", "mean", "m"),
    ], mode="driver").to_pandas()
    if len(df) == 0:
        assert len(out) == 0
        return
    want = (df.groupby("k", dropna=False)["v"]
              .agg(s="sum", n="count", lo="min", hi="max", m="mean")
              .reset_index())
    got = out.sort_values("k", na_position="last").reset_index(drop=True)
    want = want.sort_values("k", na_position="last").reset_index(drop=True)
    assert len(got) == len(want)
    for col in ["s", "n", "lo", "hi", "m"]:
        np.testing.assert_allclose(got[col].to_numpy(dtype=float),
                                   want[col].to_numpy(dtype=float),
                                   rtol=1e-9, equal_nan=True)
