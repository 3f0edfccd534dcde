"""nerf_fusion_tpu — a TPU-native online RGB-D implicit-reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the DI-Fusion capability set
(reference: chensjtu/nerf-fusion): offline per-voxel SDF data generation,
joint training of a PointNet-style point encoder + uncertainty-aware
DeepSDF-style decoder, and an online SLAM pipeline (SDF+photometric
Gauss-Newton tracking, Bayesian latent-voxel fusion, incremental
marching-cubes meshing).

Design stance (not a port):
  * Functional map state under `jit` with fixed-capacity donated buffers.
  * Static shapes + masks everywhere the reference uses boolean indexing.
  * segment_sum scatter fusion instead of custom CUDA groupby kernels.
  * Image-space geometry kernels instead of GPU KD-trees.
  * The whole Gauss-Newton tracker loop stays on device (6x6 solve included).
  * pjit/shard_map data-parallel training over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
