"""mpmavatar_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of MPMAvatar.

Physically-simulated 3D Gaussian avatars: an anisotropic-cloth Material
Point Method solver, a differentiable 3D Gaussian Splatting renderer with
quasi-shadowing, and an SMPL-X LBS body deformer — all as one jit-able,
differentiable XLA program.

Reference capability surface: KAISTChangmin/MPMAvatar (see SURVEY.md).
"""

import jax as _jax

# Physics requires true-f32 contractions; this environment's default
# matmul precision is reduced (bf16-class) even on CPU.  NN/renderer code
# that wants fast low precision opts in locally via
# `jax.default_matmul_precision("default")` or explicit dot precision.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
