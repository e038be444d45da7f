"""Device-mesh / sharding helpers (new capability — the reference has no
distributed execution of any kind, see SURVEY.md §2.5)."""

from renderloom.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    shard_params_tp,
    process_shard,
)
