"""Device-mesh construction and sharding rules (SPMD over ICI).

The reference has no distributed execution at all (SURVEY.md §2.7); here
parallelism is a first-class subsystem: a (dp, mp) mesh with batch sharding
over ``dp`` and tensor-parallel param sharding over ``mp``, applied through
``jax.jit`` in/out shardings so XLA inserts the ICI collectives.
"""

from multimodal_classification_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    build_mesh,
    param_shardings,
    replicated,
)
