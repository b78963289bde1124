from multioptpy_tpu.parallel.mesh import (  # noqa: F401
    ensemble_mesh,
    shard_batch,
    sharded_optimize_batch,
    tp_energy_and_gradient,
)
