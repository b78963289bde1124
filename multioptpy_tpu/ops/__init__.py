from multioptpy_tpu.ops.jacobi import jacobi_eigh  # noqa: F401
