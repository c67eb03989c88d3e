from eoe_tpu.ops import losses, metrics  # noqa: F401
