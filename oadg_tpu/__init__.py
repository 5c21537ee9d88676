"""oadg_tpu: TPU-native object-detection + domain-generalization framework
(same capability surface as WoojuLee24/OA-DG, built on jax/XLA/pallas)."""
__version__ = "0.1.0"
