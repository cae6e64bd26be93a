"""jdet_tpu — a TPU-native oriented object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of JDet
(oriented detection on aerial imagery) designed for TPU: fixed-shape
jit-compiled train/eval steps, SPMD data parallelism over jax.sharding
meshes, and vectorized/Pallas rotated-geometry kernels.
"""

__version__ = "0.1.0"
