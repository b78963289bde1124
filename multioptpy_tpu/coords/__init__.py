from multioptpy_tpu.coords.internals import (  # noqa: F401
    InternalCoordinates,
    auto_internals,
    detect_primitives,
)
