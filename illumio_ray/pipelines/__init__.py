from .flagship import (  # noqa: F401
    aggregate_routed,
    build_routed,
    run_flagship,
)
