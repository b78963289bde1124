from multioptpy_tpu.steppers.rfo import rs_rfo_step, update_trust_radius  # noqa: F401
