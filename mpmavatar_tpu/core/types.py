"""Pytree state / model containers for the TPU MPM solver.

The reference keeps state in Warp SoA structs
(``MPMStateStruct`` / ``MPMModelStruct``,
/root/reference/warp_mpm/mpm_data_structure.py:14,611).  Here they become
frozen dataclass pytrees of jnp arrays so the whole substep is a pure
function `state -> state` that jit/grad/scan/shard_map compose over.

Particle layout (identical to the reference's ordering,
/root/reference/train_material_params.py:387):

    [0, E)            element particles   (one per garment face)
    [E, E+T)          traditional particles (sand / jelly / ...)
    [E+T, E+T+V)      vertex particles    (garment mesh vertices)

Block boundaries are static Python ints carried by ``MPMStaticConfig`` so
XLA sees only static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pytree_dataclass(cls=None, *, static_fields=()):
    """Register a frozen dataclass as a JAX pytree.

    ``static_fields`` names go into the treedef (hashable aux data, e.g.
    topology tuples) instead of becoming traced leaves — required for
    fields consumed as Python values inside jitted code."""
    if cls is None:
        return lambda c: pytree_dataclass(c, static_fields=static_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)
              if f.name not in static_fields]
    static = tuple(static_fields)

    def flatten(obj):
        return ([getattr(obj, n) for n in fields],
                tuple(getattr(obj, n) for n in static) or None)

    def unflatten(aux, leaves):
        kw = dict(zip(fields, leaves))
        if static:
            kw.update(dict(zip(static, aux)))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass(frozen=True)
class MPMStaticConfig:
    """Static (hashable) solver configuration — closed over by jit.

    Mirrors the scalar/int knobs of the reference MPMModelStruct
    (/root/reference/warp_mpm/mpm_data_structure.py:610-733) that select
    code paths, plus the particle block layout.
    """

    n_elements: int
    n_traditional: int
    n_vertices: int
    n_grid: int
    grid_lim: float = 2.0
    material: int = 7          # 0 jelly, 1 metal, 2 sand, 3 foam, 5 plasticine, 7 cloth
    hardening: int = 0
    update_cov: bool = False
    num_joint_t: int = 0
    num_joint_v: int = 0
    num_joint_f: int = 0

    @property
    def n_particles(self) -> int:
        return self.n_elements + self.n_traditional + self.n_vertices

    @property
    def n_no_vertices(self) -> int:
        return self.n_elements + self.n_traditional

    @property
    def dx(self) -> float:
        return self.grid_lim / self.n_grid

    @property
    def inv_dx(self) -> float:
        return self.n_grid / self.grid_lim


@pytree_dataclass
class MPMState:
    """Dynamic simulation state (all jnp arrays, static shapes).

    P = total particles, E = elements, T = traditional, V = vertices.
    """

    x: jnp.ndarray            # (P, 3) positions in sim space [0, grid_lim]
    v: jnp.ndarray            # (P, 3) velocities
    C: jnp.ndarray            # (P, 3, 3) APIC affine velocity field
    F: jnp.ndarray            # (T, 3, 3) elastic deformation gradient (traditional)
    F_trial: jnp.ndarray      # (T, 3, 3) trial deformation gradient (traditional)
    d: jnp.ndarray            # (E, 3, 3) direction matrix, columns (d1, d2, d3)
    R_inv: jnp.ndarray        # (E, 3) packed inverse rest metric (iR11, iR12, iR22)
    vol: jnp.ndarray          # (P,)
    mass: jnp.ndarray         # (P,)
    density: jnp.ndarray      # (P,)
    cov: jnp.ndarray          # (E+T, 6) packed covariance (render export)
    selection: jnp.ndarray    # (P,) int32; 0 = simulate (reference semantics)
    faces: jnp.ndarray        # (E, 3) int32 vertex-particle-local indices
    yield_stress: jnp.ndarray  # (P,) mutable (hardening/softening writes it)


@pytree_dataclass
class MPMModel:
    """Differentiable material parameters (traced leaves).

    Per-particle arrays mirror MPMModelStruct's E/nu/mu/lam/gamma/kappa
    (/root/reference/warp_mpm/mpm_data_structure.py:611-685); scalars are
    0-d arrays so gradients can flow to them.
    """

    E: jnp.ndarray             # (P,)
    nu: jnp.ndarray            # (P,)
    mu: jnp.ndarray            # (P,)
    lam: jnp.ndarray           # (P,)
    gamma: jnp.ndarray         # (P,)
    kappa: jnp.ndarray         # (P,)
    gravity: jnp.ndarray       # (3,)
    friction_coeff: jnp.ndarray   # scalar: tan(friction_angle)
    alpha: jnp.ndarray            # scalar: Drucker-Prager alpha
    rpic_damping: jnp.ndarray     # scalar
    grid_v_damping_scale: jnp.ndarray  # scalar
    plastic_viscosity: jnp.ndarray     # scalar
    softening: jnp.ndarray             # scalar
    xi: jnp.ndarray                    # scalar (hardening coefficient)


def make_model(
    n_particles: int,
    E: float = 2000.0,
    nu: float = 0.3,
    gamma: float = 500.0,
    kappa: float = 500.0,
    gravity=(0.0, -9.8, 0.0),
    friction_angle: float = 40.0,
    rpic_damping: float = 0.0,
    grid_v_damping_scale: float = 1.1,
    plastic_viscosity: float = 0.0,
    softening: float = 0.1,
    xi: float = 0.0,
    dtype=jnp.float32,
) -> MPMModel:
    """Build an MPMModel with uniform material parameters.

    mu/lam from E/nu as compute_mu_lam_from_E_nu
    (/root/reference/warp_mpm/mpm_utils.py:402-408); friction_coeff/alpha as
    set_parameters_dict (/root/reference/warp_mpm/mpm_solver.py:90-94).
    """
    ones = jnp.ones((n_particles,), dtype)
    e = ones * E
    nu_a = ones * nu
    mu = e / (2.0 * (1.0 + nu_a))
    lam = e * nu_a / ((1.0 + nu_a) * (1.0 - 2.0 * nu_a))
    sin_phi = np.sin(friction_angle / 180.0 * 3.14159265)
    return MPMModel(
        E=e,
        nu=nu_a,
        mu=mu,
        lam=lam,
        gamma=ones * gamma,
        kappa=ones * kappa,
        gravity=jnp.asarray(gravity, dtype),
        friction_coeff=jnp.asarray(np.tan(friction_angle / 180.0 * 3.14159265), dtype),
        alpha=jnp.asarray(np.sqrt(2.0 / 3.0) * 2.0 * sin_phi / (3.0 - sin_phi), dtype),
        rpic_damping=jnp.asarray(rpic_damping, dtype),
        grid_v_damping_scale=jnp.asarray(grid_v_damping_scale, dtype),
        plastic_viscosity=jnp.asarray(plastic_viscosity, dtype),
        softening=jnp.asarray(softening, dtype),
        xi=jnp.asarray(xi, dtype),
    )


def finalize_mu_lam(model: MPMModel) -> MPMModel:
    """Recompute mu/lam from (possibly updated) E/nu.

    Port of prepare_mu_lam (/root/reference/warp_mpm/mpm_solver.py:220-227).
    """
    mu = model.E / (2.0 * (1.0 + model.nu))
    lam = model.E * model.nu / ((1.0 + model.nu) * (1.0 - 2.0 * model.nu))
    return dataclasses.replace(model, mu=mu, lam=lam)


def make_state(
    cfg: MPMStaticConfig,
    x: jnp.ndarray,
    faces: Optional[jnp.ndarray] = None,
    d: Optional[jnp.ndarray] = None,
    R_inv: Optional[jnp.ndarray] = None,
    vol: Optional[jnp.ndarray] = None,
    density: Optional[jnp.ndarray] = None,
    v: Optional[jnp.ndarray] = None,
    yield_stress: float = 0.0,
    dtype=jnp.float32,
) -> MPMState:
    """Assemble an MPMState; mirrors MPMStateStruct.init + from_torch
    (/root/reference/warp_mpm/mpm_data_structure.py:51-260)."""
    P, E, T, V = cfg.n_particles, cfg.n_elements, cfg.n_traditional, cfg.n_vertices
    assert x.shape == (P, 3), (x.shape, P)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (T, 3, 3))
    density_a = (jnp.ones((P,), dtype) if density is None
                 else jnp.asarray(density, dtype))
    vol_a = jnp.zeros((P,), dtype) if vol is None else jnp.asarray(vol, dtype)
    return MPMState(
        x=jnp.asarray(x, dtype),
        v=jnp.zeros((P, 3), dtype) if v is None else jnp.asarray(v, dtype),
        C=jnp.zeros((P, 3, 3), dtype),
        F=eye,
        F_trial=eye,
        d=jnp.zeros((E, 3, 3), dtype) if d is None else jnp.asarray(d, dtype),
        R_inv=jnp.zeros((E, 3), dtype) if R_inv is None else jnp.asarray(R_inv, dtype),
        vol=vol_a,
        mass=density_a * vol_a,
        density=density_a,
        cov=jnp.zeros((E + T, 6), dtype),
        selection=jnp.zeros((P,), jnp.int32),
        faces=(jnp.zeros((E, 3), jnp.int32) if faces is None
               else jnp.asarray(faces, jnp.int32)),
        yield_stress=jnp.full((P,), yield_stress, dtype),
    )


def cloth_geometry(verts: jnp.ndarray, faces: jnp.ndarray, thickness: float = 1e-5):
    """Direction matrices, rest metric and volumes for a garment mesh.

    Port of Trainer.compute_dir_vol / compute_rest_dir_inv_from_vf
    (/root/reference/train_material_params.py:517-553).

    Returns (init_dir (E,3,3), rest_R_inv (E,3), element_vol (E,),
    vertex_vol (V,)).
    """
    verts = jnp.asarray(verts)
    faces = jnp.asarray(faces, jnp.int32)
    d1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    d2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    d3 = jnp.cross(d1, d2)
    d3 = d3 / jnp.linalg.norm(d3, axis=1, keepdims=True)
    init_dir = jnp.stack([d1, d2, d3], axis=-1)

    rest_R_inv = rest_dir_inv_from_vf(verts, faces)

    area = 0.5 * jnp.linalg.norm(jnp.cross(d1, d2), axis=1)
    element_vol = 0.25 * thickness * area
    vertex_vol = jnp.zeros((verts.shape[0],), verts.dtype)
    contrib = jnp.repeat(element_vol, 3)
    vertex_vol = vertex_vol.at[faces.reshape(-1)].add(contrib)
    return init_dir, rest_R_inv, element_vol, vertex_vol


def rest_dir_inv_from_vf(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Packed inverse rest metric (iR11, iR12, iR22) from vertices+faces.

    Port of compute_rest_dir_inv_from_vf
    (/root/reference/train_material_params.py:517-531)."""
    d1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    d2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    r11 = jnp.linalg.norm(d1, axis=1)
    r12 = jnp.sum(d1 * d2, axis=1) / r11
    r22 = jnp.linalg.norm(d2 - (r12 / r11)[:, None] * d1, axis=1)
    i11 = 1.0 / r11
    i22 = 1.0 / r22
    i12 = -r12 * i11 * i22
    return jnp.stack([i11, i12, i22], axis=-1)
