from .lineage import (  # noqa: F401
    list_fragments,
    load_manifests,
    plan_shards,
    pending_shards,
    clean_uncommitted,
    write_manifest,
)
