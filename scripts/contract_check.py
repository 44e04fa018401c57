#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every (or selected)
`queries()` entry and compare against its `oracle_sql()` via DuckDB —
row count, column names, and an order-insensitive value hash — at sf0.01
(the driver's scale).

Usage:
    python scripts/contract_check.py               # all queries
    python scripts/contract_check.py q5_local_supplier_volume doc_repetition

Owns its Ray session (the driver-contract modules never call ray.init).
Exit code 0 only when every checked query passes (rows-only queries must
execute cleanly and return >= 1 column).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd
import ray

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _value_hash(df: pd.DataFrame) -> str:
    """Column-name-sorted, row-order-insensitive content hash."""
    df = df[sorted(df.columns)]
    lines = df.to_csv(index=False, float_format="%.9g").encode().split(b"\n")[1:]
    total = 0
    for ln in lines:
        if ln:
            total = (total + int.from_bytes(
                hashlib.md5(ln).digest()[:8], "big")) % (1 << 64)
    return f"{total:016x}"


def main() -> int:
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, str(REPO))
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    want = sys.argv[1:] or list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    results: dict[str, dict] = {}
    for name in want:
        t0 = time.time()
        try:
            mine = _to_df(qs[name](SF_DIR))
            sql = oracles.get(name)
            if sql is None:
                ok = mine is not None and len(mine.columns) > 0
                results[name] = {"err": None if ok else "empty rows-only result",
                                 "rows_only": True, "rows": len(mine),
                                 "sec": round(time.time() - t0, 2)}
                continue
            oracle = con.execute(sql).df()
            r = {
                "rows_match": len(mine) == len(oracle),
                "schema_match": sorted(mine.columns) == sorted(oracle.columns),
                "hash_match": _value_hash(mine) == _value_hash(oracle),
                "rows": len(mine), "oracle_rows": len(oracle),
                "sec": round(time.time() - t0, 2),
            }
            results[name] = r
            if not all((r["rows_match"], r["schema_match"], r["hash_match"])):
                print(f"FAIL {name}: {r}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            results[name] = {"err": repr(e)[:400],
                             "sec": round(time.time() - t0, 2)}
            print(f"ERR {name}: {repr(e)[:400]}", file=sys.stderr)
    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    n_rows_only = sum(1 for r in results.values()
                      if r.get("rows_only") and not r.get("err"))
    bad = {k: v for k, v in results.items()
           if v.get("err") or v.get("hash_match") is False
           or v.get("rows_match") is False or v.get("schema_match") is False}
    print(json.dumps({"oracle_pass": n_pass, "rows_only_ok": n_rows_only,
                      "bad": bad, "total": len(results)}, indent=1))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
