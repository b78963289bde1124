from multioptpy_tpu.drivers.optimize import (  # noqa: F401
    OptimizeConfig,
    OptResult,
    optimize,
    optimize_batch,
)
