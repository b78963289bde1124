from multioptpy_tpu.workflows.relaxed_scan import relaxed_scan  # noqa: F401
