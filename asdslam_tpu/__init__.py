"""asdslam_tpu — TPU-native visual SLAM engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of ASD-SLAM
(mataiyuan/ASD-SLAM: ORB-SLAM2 pipeline + learned 128-float "ASD" patch
descriptor) designed TPU-first:

- feature detection / descriptor inference as batched XLA+Pallas kernels,
- matching as MXU distance-matrix kernels,
- bundle adjustment as Gauss-Newton/LM with Schur complement (replacing g2o),
- loop closure via a dense-array k-means vocabulary tree + Sim3 pose graph,
- multi-chip scaling via jax.sharding meshes and collectives.

The map is a struct-of-arrays device store with static capacities and
validity masks; the host layer only sequences the state machine and IO.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/estimator einsums need true f32 matmuls: TPU's default bf16-pass
# matmul breaks RANSAC model fitting (two-view init loses ~25% of its inliers
# to rounding).  Hot bf16 paths (descriptor CNN, distance matrices) cast
# explicitly and are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from asdslam_tpu.config import SlamConfig  # noqa: F401
