"""Device-mesh parallelism (walker sharding, replacing threads/MPIPool)."""

from .mesh import (WALKER_AXIS, make_mesh, make_sharded_logp_batch,
                   replicate)  # noqa: F401
