"""orb_slam2_tpu — TPU-native visual SLAM engine.

Numerics: XLA's DEFAULT matmul precision on TPU truncates float32 matmul
inputs to bfloat16 (one MXU pass). That is the right trade for neural-net
layers, but this engine's matmuls are GEOMETRY — pyramid resizes feeding
sub-pixel keypoints/descriptors, BA normal-equation products, Schur
complements, pose-graph solves — where bf16's 8-bit mantissa injects
~0.4%-relative noise into every product. Round-4 diagnosis: the full-scale
long-drive eval collapsed on TPU (tracking lost right after keyframe
events, healthy on CPU with identical code) until matmul precision was
pinned to float32. Kernels that WANT bf16 (the Pallas-path pyramid
resize) cast their inputs explicitly and are unaffected by this default.

Override with JAX_DEFAULT_MATMUL_PRECISION or jax.config if embedding
this package somewhere that prefers the fast default.
"""
import os

import jax

if (os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") is None
        and jax.config.jax_default_matmul_precision is None):
    jax.config.update("jax_default_matmul_precision", "float32")
