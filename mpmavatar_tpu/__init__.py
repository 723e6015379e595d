"""mpmavatar_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of MPMAvatar.

Physically-simulated 3D Gaussian avatars: an anisotropic-cloth Material
Point Method solver, a differentiable 3D Gaussian Splatting renderer with
quasi-shadowing, and an SMPL-X LBS body deformer — all as one jit-able,
differentiable XLA program.

Reference capability surface: KAISTChangmin/MPMAvatar (see SURVEY.md).
"""

__version__ = "0.1.0"
