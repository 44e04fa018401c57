"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in illumio_ray's library code) calls ray.init/shutdown.

- ``entry()``   — flagship parse→enrich→route→aggregate run over pages
                  synthesized at sf0.001 scale; returns the aggregate table.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2 +
                  the training-data operator families); each takes sf_dir.
- ``oracle_sql()`` — matching DuckDB SQL per query where SQL-expressible.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from pathlib import Path
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale synthesized pages; returns the
    per-(sink, lang, hour) aggregate as a pandas DataFrame."""
    import pyarrow.dataset as pads

    from illumio_ray.pipelines.flagship import run_flagship
    from illumio_ray.synth import ensure_pages_for_sf

    info = ensure_pages_for_sf(0.001)
    out_dir = Path(tempfile.mkdtemp(prefix="illumio_ray_entry_"))
    try:
        run_flagship(info["pages_dir"], out_dir, info["lookup_lang"],
                     info["lookup_host"], num_shards=4)
        agg = pads.dataset(str(out_dir / "aggregates")).to_table().to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return agg.sort_values(["sink", "lang", "hour"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from illumio_ray.pipelines.queries import ordered_registry
    from illumio_ray.synth import ensure_pages_for_sf

    # The pages-backed queries read synthesized parquet; materialize the
    # sf0.01 copy now so the DuckDB oracle (static path) always finds it.
    # ordered_registry puts oracle-backed queries first so every driver
    # CORRECTNESS slot carries a value-hash check.
    ensure_pages_for_sf(0.01)
    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    from illumio_ray.pipelines.queries import ordered_registry
    from illumio_ray.synth import ensure_pages_for_sf

    ensure_pages_for_sf(0.01)
    return {name: spec.sql
            for name, spec in ordered_registry().items() if spec.sql}
