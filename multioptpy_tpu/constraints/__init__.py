from multioptpy_tpu.constraints.project import Constraints  # noqa: F401
