from rnb_tpu.models import embedder, fields, renderer  # noqa: F401
