from multioptpy_tpu.hessian.updates import (  # noqa: F401
    update_hessian,
    UPDATE_RULES,
)
