"""eoe_tpu — a TPU-native anomaly-detection framework with Outlier Exposure.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the EOE reference
("Exposing Outlier Exposure", TMLR 2022, github.com/liznerski/eoe): one-vs-rest /
leave-one-class-out image anomaly-detection benchmarks with Outlier Exposure,
six training objectives (HSC, BCE, focal, DeepSVDD, DSAD, CLIP), twelve datasets,
evolutionary single-OE-sample search, and frequency-filter (multiscale) analysis.

Design (TPU-first, not a port):
  * training steps are pure jitted ``(state, batch, key) -> (state, metrics)``
    functions; epochs run as ``lax.scan`` over device-resident data wherever the
    dataset fits in HBM,
  * preprocessing (crop/flip/jitter/noise/filters/normalize) is a single fused
    device-side pipeline compiled by XLA — no host worker processes,
  * multi-chip scaling uses ``jax.sharding.Mesh`` + NamedSharding (data parallel
    over ICI, optional tensor parallelism for the CLIP encoders),
  * CLIP ViT-B/32 runs with a Pallas flash-attention kernel,
  * the evolutionary search evaluates candidate OE samples vectorized via vmap.
"""

__version__ = "0.1.0"

from eoe_tpu.ops import losses  # noqa: F401
