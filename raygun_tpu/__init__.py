"""raygun_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the raygun
capabilities: config-driven large-scale deep-learning for N-D biological
imaging volumes (CycleGAN enhancement, MTLSD/ACLSD segmentation, blockwise
whole-volume inference, watershed/MWS segmentation, VOI validation).
"""

__version__ = "0.1.0"
