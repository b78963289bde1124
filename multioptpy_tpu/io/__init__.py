from multioptpy_tpu.io.xyz import (  # noqa: F401
    read_xyz,
    read_trajectory,
    write_xyz,
    write_trajectory,
)
