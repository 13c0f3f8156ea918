from rnb_tpu.data import cameras, lights, dataset  # noqa: F401
