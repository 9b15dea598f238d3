"""r2_gaussian_tpu: TPU-native radiative Gaussian splatting for CT reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Ruyi-Zha/r2_gaussian (NeurIPS 2024). See ARCHITECTURE.md.
"""

__version__ = "0.1.0"
