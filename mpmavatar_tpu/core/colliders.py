"""Boundary conditions / colliders as data (tagged pytrees).

The reference registers Warp kernel *closures* per collider
(/root/reference/warp_mpm/mpm_solver.py:564-1417).  A TPU-native design
cannot trace closures per call, so each BC becomes a parameter pytree with
any branchy configuration (surface type, reset flag) captured as *static*
aux data; the solver applies them inside the jitted substep.

Grid-level BCs run after grid normalization and before G2P, in registration
order — exactly the reference's ``grid_postprocess`` pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

# surface types (mpm_solver.py:585-596)
STICKY = 0
SLIP = 1
FRICTIONAL = 2
CUT = 11


def _register(cls, array_fields, static_fields):
    def flatten(obj):
        children = tuple(getattr(obj, n) for n in array_fields)
        aux = tuple(getattr(obj, n) for n in static_fields)
        return children, aux

    def unflatten(aux, children):
        return cls(**dict(zip(array_fields, children)),
                   **dict(zip(static_fields, aux)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass(frozen=True)
class SurfaceCollider:
    """Half-space collider (mpm_solver.py:564-658)."""
    point: jnp.ndarray        # (3,)
    normal: jnp.ndarray       # (3,) unit
    friction: jnp.ndarray     # scalar
    start_time: jnp.ndarray   # scalar
    end_time: jnp.ndarray     # scalar
    surface_type: int = STICKY  # static


_register(SurfaceCollider,
          ("point", "normal", "friction", "start_time", "end_time"),
          ("surface_type",))


@dataclasses.dataclass(frozen=True)
class CuboidCollider:
    """Moving-cuboid Dirichlet velocity (mpm_solver.py:929-984).

    The reference mutates ``point`` host-side each substep; here the active
    point is computed functionally as point + (clamp(t) - start) * velocity.
    """
    point: jnp.ndarray
    size: jnp.ndarray
    velocity: jnp.ndarray
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    reset: int = 0  # static


_register(CuboidCollider,
          ("point", "size", "velocity", "start_time", "end_time"),
          ("reset",))


@dataclasses.dataclass(frozen=True)
class BoundingBoxCollider:
    """Grid-boundary no-outflow BC (mpm_solver.py:986-1053)."""
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    padding: int = 3  # static


_register(BoundingBoxCollider, ("start_time", "end_time"), ("padding",))


@dataclasses.dataclass(frozen=True)
class GridMaskCollider:
    """Zero grid velocity where mask >= 1 (mpm_solver.py:1330-1355)."""
    mask: jnp.ndarray  # (G, G, G) int


_register(GridMaskCollider, ("mask",), ())


@dataclasses.dataclass(frozen=True)
class ParticleImpulse:
    """Pre-P2G particle impulse (mpm_solver.py:1058-1106, 1360-1417)."""
    mask: jnp.ndarray        # (P,) int
    force: jnp.ndarray       # (3,)
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    scale_by_mass: bool = True  # static; False = *_with_mask variant


_register(ParticleImpulse, ("mask", "force", "start_time", "end_time"),
          ("scale_by_mass",))


@dataclasses.dataclass(frozen=True)
class ParticleVelocityModifier:
    """Dirichlet particle velocity before P2G (mpm_solver.py:1108-1151, 1289-1328)."""
    mask: jnp.ndarray        # (P,) int
    velocity: jnp.ndarray    # (3,)
    start_time: jnp.ndarray
    end_time: jnp.ndarray


_register(ParticleVelocityModifier,
          ("mask", "velocity", "start_time", "end_time"), ())


@dataclasses.dataclass(frozen=True)
class RotationVelocityModifier:
    """Cylinder-region rotation Dirichlet velocity
    (mpm_solver.py:1156-1257): particles inside the cylinder rotate about
    ``normal`` with optional translation along it."""
    mask: jnp.ndarray             # (P,) int
    point: jnp.ndarray            # (3,)
    normal: jnp.ndarray           # (3,) unit
    horizontal_axis_1: jnp.ndarray  # (3,)
    horizontal_axis_2: jnp.ndarray  # (3,)
    rotation_scale: jnp.ndarray   # scalar
    translation_scale: jnp.ndarray  # scalar
    start_time: jnp.ndarray
    end_time: jnp.ndarray


_register(RotationVelocityModifier,
          ("mask", "point", "normal", "horizontal_axis_1",
           "horizontal_axis_2", "rotation_scale", "translation_scale",
           "start_time", "end_time"), ())


@dataclasses.dataclass(frozen=True)
class MeshCollider:
    """Body-mesh collision config (mpm_solver.py:805-919).

    ``faces`` is the static triangle index array; per-substep vertex
    positions/velocities are passed to the stepper as inputs (the reference
    re-uploaded them host-side each substep — eliminated here).
    """
    faces: jnp.ndarray       # (Mf, 3) int32
    friction: jnp.ndarray    # scalar


_register(MeshCollider, ("faces", "friction"), ())


@dataclasses.dataclass(frozen=True)
class ColliderSet:
    """All registered BCs; static tuple structure, traced leaf params.

    ``grid_post`` preserves the reference's registration ordering across
    heterogeneous grid BC types.
    """
    grid_post: Tuple = ()                     # Surface/Cuboid/BBox/GridMask, in order
    impulses: Tuple[ParticleImpulse, ...] = ()
    velocity_modifiers: Tuple[ParticleVelocityModifier, ...] = ()
    mesh_colliders: Tuple[MeshCollider, ...] = ()
    use_particle_mover: bool = False          # static


_register(ColliderSet,
          ("grid_post", "impulses", "velocity_modifiers", "mesh_colliders"),
          ("use_particle_mover",))
