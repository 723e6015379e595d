"""Solver orchestration: collider registry, scanned rollouts, autodiff.

TPU-native replacement for ``MPMWARP`` (/root/reference/warp_mpm/
mpm_solver.py:13-1417).  Differences by design:

* Colliders are *data* (core.colliders pytrees), not kernel closures.
* The 400-substep frame loop is a ``lax.scan`` with the collider-mesh
  position computed in-scan as ``mesh_x + s*dt*mesh_v`` — the reference
  re-uploaded mesh vertices from host every substep
  (mpm_solver.py:286,302; train_material_params.py:623).
* Rollouts are differentiable via ``jax.grad`` through the scan with
  per-frame rematerialization, superseding the reference's
  finite-difference training loop (train_material_params.py:583-655).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import stepping
from ..core.colliders import (BoundingBoxCollider, ColliderSet, CuboidCollider,
                              GridMaskCollider, MeshCollider, ParticleImpulse,
                              ParticleVelocityModifier, SurfaceCollider,
                              STICKY, SLIP, FRICTIONAL, CUT)
from ..core.types import (MPMModel, MPMState, MPMStaticConfig,
                          finalize_mu_lam)

MATERIAL_IDS = {
    "jelly": 0, "metal": 1, "sand": 2, "foam": 3, "snow": 4,
    "plasticine": 5, "neo-hookean": 6, "cloth": 7,
}


class MPMSolver:
    """Stateless-compute solver: owns the static config + collider set and
    exposes jitted substep / frame-rollout functions.

    API mirrors MPMWARP (mpm_solver.py:14-1417) so reference drivers map
    1:1, but all mutation is functional: methods return new model/state.
    """

    def __init__(self, cfg: MPMStaticConfig, column_k: int = 0,
                 mesh_column_k: int = 0, faces=None,
                 column_c_cap=None, mesh_c_cap=None,
                 column_radius: int = 1,
                 rebin_every: int = 1, column_bf16: bool = False,
                 rebin_auto: bool = False, column_pallas=None,
                 column_ztile: bool = False,
                 fused_grid=None, fused_stress=None,
                 halo_cap=None, z_window=None):
        """``column_k > 0`` enables the scatter-free column-packed MXU
        transfer path (ops.column_transfer) with that per-column slot
        capacity; ``faces`` (garment topology) enables the gather-based
        vertex-force path alongside it.

        ``halo_cap > 0`` enables the PACKED halo ("sparse") grid: grid
        fields live only on the dilated active-column set, so grid
        passes scale with the scene, not G^2 (adapt per frame with
        adapt_row_cap / size once with calibrate_caps).

        ``z_window`` (cells, < n_grid) further restricts the grid's z
        extent to a per-substep sliding window over the occupied z
        band — z-lane compute becomes G-independent (the production
        200^3/250^3 grids occupy a half-height band).  Adapted from its
        own ladder by adapt_row_cap/calibrate_caps; exactness is
        guarded by overflow telemetry like the column caps.  Pallas
        halo path only."""
        self.cfg = cfg
        self.colliders = ColliderSet()
        self.column_k = column_k
        self.mesh_column_k = mesh_column_k
        self.mesh_c_cap = mesh_c_cap
        self.column_c_cap = column_c_cap
        self.halo_cap = halo_cap
        # z_window: None = off, int = fixed, "auto" = sized per frame
        # by adapt_row_cap / once by calibrate_caps from the probed
        # occupied z band
        self._z_auto = z_window == "auto"
        self.z_window = None if self._z_auto else z_window
        self.column_radius = column_radius
        self.rebin_every = rebin_every
        self.rebin_auto = rebin_auto
        self.column_bf16 = column_bf16
        if column_pallas is None:
            # fused Mosaic kernels are the fast path on real TPUs; in
            # interpret mode (CPU tests) they are much slower than XLA
            column_pallas = jax.default_backend() == "tpu"
        self.column_pallas = column_pallas
        self.column_ztile = column_ztile
        self.fused_grid = fused_grid
        self.fused_stress = fused_stress
        if rebin_every > 1 or rebin_auto:
            assert column_radius >= 2, (
                "amortized rebinning needs column_radius >= 2")
        self.vf_incidence = None
        if faces is not None and cfg.n_vertices > 0 and column_k > 0:
            from ..ops.column_transfer import build_vertex_incidence
            self.vf_incidence = jnp.asarray(
                build_vertex_incidence(faces, cfg.n_vertices))

    # ------------------------------------------------------------------
    # registration API (mirrors mpm_solver.py)
    # ------------------------------------------------------------------
    def _add_grid_post(self, col):
        self.colliders = dataclasses.replace(
            self.colliders, grid_post=self.colliders.grid_post + (col,))

    def add_surface_collider(self, point, normal, surface="sticky",
                             friction=0.0, start_time=0.0, end_time=999.0):
        """mpm_solver.py:564-658."""
        if surface == "sticky" and friction != 0:
            raise ValueError("friction must be 0 on sticky surfaces.")
        stype = {"sticky": STICKY, "slip": SLIP, "cut": CUT}.get(surface,
                                                                 FRICTIONAL)
        n = np.asarray(normal, np.float32)
        n = n / np.linalg.norm(n)
        self._add_grid_post(SurfaceCollider(
            point=jnp.asarray(point, jnp.float32), normal=jnp.asarray(n),
            friction=jnp.float32(friction), start_time=jnp.float32(start_time),
            end_time=jnp.float32(end_time), surface_type=stype))

    def add_bounding_box(self, start_time=0.0, end_time=999.0):
        """mpm_solver.py:986-1053."""
        self._add_grid_post(BoundingBoxCollider(
            start_time=jnp.float32(start_time),
            end_time=jnp.float32(end_time)))

    def set_velocity_on_cuboid(self, point, size, velocity, start_time=0.0,
                               end_time=999.0, reset=0):
        """mpm_solver.py:929-984 (host `modify` callback made functional)."""
        self._add_grid_post(CuboidCollider(
            point=jnp.asarray(point, jnp.float32),
            size=jnp.asarray(size, jnp.float32),
            velocity=jnp.asarray(velocity, jnp.float32),
            start_time=jnp.float32(start_time),
            end_time=jnp.float32(end_time), reset=reset))

    def enforce_grid_velocity_by_mask(self, mask):
        """mpm_solver.py:1330-1355."""
        self._add_grid_post(GridMaskCollider(mask=jnp.asarray(mask)))

    def add_mesh_collider(self, mesh_faces, friction=0.0):
        """mpm_solver.py:805-919; vertex positions/velocities are rollout
        inputs, not registration-time state."""
        self.colliders = dataclasses.replace(
            self.colliders,
            mesh_colliders=self.colliders.mesh_colliders + (MeshCollider(
                faces=jnp.asarray(mesh_faces, jnp.int32),
                friction=jnp.float32(friction)),))

    def add_particle_mover(self):
        """mpm_solver.py:661-802."""
        self.colliders = dataclasses.replace(self.colliders,
                                             use_particle_mover=True)

    def add_impulse_on_particles(self, mask, force, start_time=0.0,
                                 end_time=999.0, scale_by_mass=True):
        """mpm_solver.py:1058-1106 / 1360-1417 (mask precomputed by caller)."""
        self.colliders = dataclasses.replace(
            self.colliders,
            impulses=self.colliders.impulses + (ParticleImpulse(
                mask=jnp.asarray(mask, jnp.int32),
                force=jnp.asarray(force, jnp.float32),
                start_time=jnp.float32(start_time),
                end_time=jnp.float32(end_time),
                scale_by_mass=scale_by_mass),))

    def enforce_particle_velocity_by_mask(self, mask, velocity,
                                          start_time=0.0, end_time=999.0):
        """mpm_solver.py:1289-1328."""
        self.colliders = dataclasses.replace(
            self.colliders,
            velocity_modifiers=self.colliders.velocity_modifiers + (
                ParticleVelocityModifier(
                    mask=jnp.asarray(mask, jnp.int32),
                    velocity=jnp.asarray(velocity, jnp.float32),
                    start_time=jnp.float32(start_time),
                    end_time=jnp.float32(end_time)),))

    def enforce_particle_velocity_translation(self, state, point, size,
                                              velocity, start_time=0.0,
                                              end_time=999.0):
        """mpm_solver.py:1108-1151: select particles inside a box once."""
        x = np.asarray(state.x)
        inside = np.all(np.abs(x - np.asarray(point)[None]) <
                        np.asarray(size)[None], axis=-1)
        self.enforce_particle_velocity_by_mask(inside.astype(np.int32),
                                               velocity, start_time, end_time)

    def enforce_particle_velocity_rotation(self, state, point, normal,
                                           half_height_and_radius,
                                           rotation_scale,
                                           translation_scale,
                                           start_time=0.0, end_time=999.0):
        """mpm_solver.py:1156-1257: cylinder-region rotation field."""
        from ..core.colliders import RotationVelocityModifier
        normal = np.asarray(normal, np.float64)
        normal = normal / np.linalg.norm(normal)
        h1 = np.array([1.0, 1.0, 1.0])
        if abs(h1 @ normal) < 0.01:
            h1 = np.array([0.72, 0.37, -0.67])
        h1 = h1 - (h1 @ normal) * normal
        h1 = h1 / np.linalg.norm(h1)
        h2 = np.cross(h1, normal)

        x = np.asarray(state.x)
        offset = x - np.asarray(point)[None]
        axial = offset @ normal
        radial = np.linalg.norm(offset - axial[:, None] * normal[None],
                                axis=-1)
        hh, rr = half_height_and_radius
        mask = (np.abs(axial) < hh) & (radial < rr)

        self.colliders = dataclasses.replace(
            self.colliders,
            velocity_modifiers=self.colliders.velocity_modifiers + (
                RotationVelocityModifier(
                    mask=jnp.asarray(mask.astype(np.int32)),
                    point=jnp.asarray(point, jnp.float32),
                    normal=jnp.asarray(normal, jnp.float32),
                    horizontal_axis_1=jnp.asarray(h1, jnp.float32),
                    horizontal_axis_2=jnp.asarray(h2, jnp.float32),
                    rotation_scale=jnp.float32(rotation_scale),
                    translation_scale=jnp.float32(translation_scale),
                    start_time=jnp.float32(start_time),
                    end_time=jnp.float32(end_time)),))

    def release_particles_sequentially(self, state, normal, start_position,
                                       end_position, start_time, end_time,
                                       num_layers=50):
        """mpm_solver.py:1261-1287: shrinking pin region releases particles
        layer by layer along ``normal``."""
        point = [0.0, 0.0, 0.0]
        size = [0.0, 0.0, 0.0]
        axis = -1
        for i in range(3):
            if normal[i] == 0:
                point[i] = 1.0
                size[i] = 1.0
            else:
                axis = i
                point[i] = end_position
        half = abs(start_position - end_position) / num_layers
        end_portion = end_time / num_layers
        for i in range(num_layers):
            size[axis] = half * (num_layers - i)
            self.enforce_particle_velocity_translation(
                state, point, size, [0.0, 0.0, 0.0],
                start_time=start_time, end_time=end_portion * (i + 1))

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------
    def substep(self, state: MPMState, model: MPMModel, dt, time,
                **scene) -> MPMState:
        return stepping.p2g2p(self.cfg, self.colliders, state, model,
                              jnp.float32(dt), jnp.float32(time),
                              column_k=self.column_k,
                              mesh_column_k=self.mesh_column_k,
                              mesh_c_cap=self.mesh_c_cap,
                              column_c_cap=self.column_c_cap,
                              column_radius=self.column_radius,
                              column_bf16=self.column_bf16,
                              column_pallas=self.column_pallas,
                              column_ztile=self.column_ztile,
                              fused_grid=self.fused_grid,
                              fused_stress=self.fused_stress,
                              halo_cap=self.halo_cap,
                              z_window=self.z_window,
                              vf_incidence=self.vf_incidence, **scene)

    def frame(self, state: MPMState, model: MPMModel, dt: float,
              num_substeps: int, time0,
              mesh_x: Optional[jnp.ndarray] = None,
              mesh_v: Optional[jnp.ndarray] = None,
              joint_verts_v: Optional[jnp.ndarray] = None,
              joint_faces_v: Optional[jnp.ndarray] = None,
              remat: bool = False, return_overflow: bool = False):
        """One capture frame = ``num_substeps`` scanned substeps.

        ``mesh_x`` is the frame-start collider mesh; positions advance
        linearly in-scan (train_material_params.py:622-626).

        ``return_overflow=True`` appends an int32 scalar: the max
        per-substep count of particles/collider faces silently dropped by
        the column caps.  Nonzero means lost mass — raise column_k /
        column_c_cap.  Use ``check_overflow`` at frame boundaries."""
        cfg, colliders = self.cfg, self.colliders

        amortized = self.column_k > 0 and (self.rebin_every > 1
                                           or self.rebin_auto)
        # drift bound: binning stays valid while every particle is within
        # (radius-1) cells of its binned column; rebuild at 60% of that.
        drift_lim = 0.6 * max(self.column_radius - 1, 0) * cfg.dx

        sparse = (self.halo_cap or 0) > 0 and self.column_k > 0

        def _rebuild(x):
            from ..ops import column_transfer as _ct
            bins = _ct.build_bins(
                x, cfg, self.column_k, c_cap=self.column_c_cap)
            if sparse:
                return bins, _ct.build_halo(bins, cfg,
                                            self.column_radius,
                                            self.halo_cap)
            return bins, None

        def body(carry, s):
            if amortized:
                st, t, of, bh, x_ref = carry
                if self.rebin_auto:
                    drift = jnp.max(jnp.abs(st.x[:, :2] - x_ref[:, :2]))
                    need = drift > drift_lim
                else:
                    need = s % self.rebin_every == 0
                bh = jax.lax.cond(need, _rebuild, lambda x: bh, st.x)
                bins, halo = bh
                x_ref = jnp.where(need, st.x, x_ref)
            else:
                st, t, of = carry
                bins = halo = None
            kw = {}
            if mesh_x is not None:
                kw["mesh_x"] = mesh_x + (s.astype(jnp.float32) * dt) * mesh_v
                kw["mesh_v"] = mesh_v
            if joint_verts_v is not None:
                kw["joint_verts_v"] = joint_verts_v
            if joint_faces_v is not None:
                kw["joint_faces_v"] = joint_faces_v
            st, st_of = stepping.p2g2p(cfg, colliders, st, model,
                                       jnp.float32(dt), t,
                                       column_k=self.column_k,
                                       mesh_column_k=self.mesh_column_k,
                                       mesh_c_cap=self.mesh_c_cap,
                                       column_c_cap=self.column_c_cap,
                                       column_radius=self.column_radius,
                                       column_bf16=self.column_bf16,
                                       column_pallas=self.column_pallas,
                                       column_ztile=self.column_ztile,
                                       fused_grid=self.fused_grid,
                                       fused_stress=self.fused_stress,
                                       halo_cap=self.halo_cap,
                                       z_window=self.z_window,
                                       column_bins=bins,
                                       column_halo=halo,
                                       vf_incidence=self.vf_incidence,
                                       return_overflow=True, **kw)
            of = jnp.maximum(of, st_of)
            if amortized:
                return (st, t + dt, of, (bins, halo), x_ref), None
            return (st, t + dt, of), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        of0 = jnp.zeros((), jnp.int32)
        if amortized:
            bh0 = _rebuild(state.x)
            (state, time, overflow, _, _), _ = jax.lax.scan(
                body, (state, jnp.float32(time0), of0, bh0, state.x),
                jnp.arange(num_substeps))
        else:
            (state, time, overflow), _ = jax.lax.scan(
                body, (state, jnp.float32(time0), of0),
                jnp.arange(num_substeps))
        if return_overflow:
            return state, time, overflow
        return state, time

    _CAP_LADDER = (1536, 2048, 2560, 3072, 3584, 4096, 5120, 6144,
                   8192, 12288, 16384, 24576, 32768)
    _HALO_LADDER = (1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288,
                    16384, 24576, 32768, 49152, 65536)
    # z-window rungs: half-lane-tile steps — a partial 128-lane tile
    # pads back up inside the transfer matmuls, but every (H, Zw, ch)
    # grid array, splat fold and G2P gather shrinks with Zw itself
    # (matters when G is just above a full tile, e.g. 250 vs 192)
    _ZWIN_LADDER = (64, 128, 192, 256, 320, 384, 448, 512, 768, 1024)

    def _pick_z_window(self, zmin: int, zmax: int,
                       headroom_cells: int = 8):
        """Smallest ladder window covering the occupied z band (+3-cell
        splat reach +headroom for intra-frame drift).  The window origin
        re-centers every substep, so only band GROWTH between probes
        needs slack — at MPM-stable dt that is ~1 cell per frame, and
        the in-graph coverage overflow fails loud if a probe gap is
        ever outrun.  None when no rung below n_grid fits."""
        want = (zmax - zmin + 4) + headroom_cells
        for w in self._ZWIN_LADDER:
            if w >= want:
                return w if w < self.cfg.n_grid else None
        return None

    def _pick_halo_cap(self, n_halo: int, headroom: float):
        g2 = self.cfg.n_grid * self.cfg.n_grid
        want = min(int(n_halo * headroom), g2)
        for cap in self._HALO_LADDER:
            if cap >= want:
                return min(cap, g2)
        return min(self._HALO_LADDER[-1], g2)

    def adapt_row_cap(self, state: MPMState, headroom: float = 1.35):
        """Adaptive row cap: size ``column_c_cap`` to the CURRENT
        particle distribution (+headroom) from a discrete ladder, once
        per frame on the host.  Transfer compute scales with the cap, so
        a flat cloth (few occupied columns) runs ~2-3x cheaper than the
        worst-case static cap; each ladder value compiles once (the
        in-frame overflow check still fails loud if drift outruns the
        headroom).  When the halo grid is enabled, ``halo_cap`` adapts
        from its own ladder in the same probe.  Returns the chosen cap."""
        if self.column_k <= 0:
            return self.column_c_cap
        from ..ops import column_transfer as _ct
        ztile = (self.column_ztile and self.column_radius == 1
                 and not self.column_pallas)
        if (self.halo_cap or 0) > 0:
            # fused probe: one readback instead of two (each host
            # transfer is a full round trip on tunneled runtimes)
            probe = np.asarray(_ct.count_rows_and_halo(
                state.x, self.cfg, self.column_k, ztile,
                self.column_radius))
            rows = int(probe[0])
            self.halo_cap = self._pick_halo_cap(int(probe[1]), headroom)
            if self._z_auto and self.column_pallas:
                self.z_window = self._pick_z_window(int(probe[2]),
                                                    int(probe[3]))
        else:
            rows = int(_ct.count_rows(state.x, self.cfg, self.column_k,
                                      ztile))
        want = int(rows * headroom)
        for cap in self._CAP_LADDER:
            if cap >= want:
                self.column_c_cap = cap
                return cap
        self.column_c_cap = self._CAP_LADDER[-1]
        return self.column_c_cap

    def calibrate_caps(self, xs=None, mesh_xs=None,
                       headroom: float = 1.35, sample_every: int = 4):
        """One-time static cap sizing from KNOWN trajectories.

        Training/demo drivers know every frame's particle positions
        (tracked verts) and collider mesh up front; the caps are sized
        from the sampled trajectory's pack-row MAXIMA plus ``headroom``,
        and never force a mid-run recompile the way per-frame adaptation
        would inside jitted grad rollouts.  This is a heuristic bound,
        not a guarantee: frames between samples, or simulated states
        that deviate from the probed trajectory (e.g. during material
        training), can still exceed the headroom — the runtime overflow
        check (``frame(..., return_overflow=True)`` + ``check_overflow``)
        remains required.
        ``xs``: iterable of (P, 3) particle positions (sim space);
        ``mesh_xs``: iterable of (Vb, 3) collider vertex frames (the
        registered mesh colliders' faces are used for centroids)."""
        from ..ops import column_transfer as _ct
        ztile = (self.column_ztile and self.column_radius == 1
                 and not self.column_pallas)
        if xs is not None and self.column_k > 0:
            rows = 0
            n_halo = 0
            zmin, zmax = self.cfg.n_grid, 0
            xs = list(xs)
            for x in xs[::max(1, sample_every)]:
                if (self.halo_cap or 0) > 0:
                    probe = np.asarray(_ct.count_rows_and_halo(
                        jnp.asarray(x), self.cfg, self.column_k, ztile,
                        self.column_radius))
                    rows = max(rows, int(probe[0]))
                    n_halo = max(n_halo, int(probe[1]))
                    zmin = min(zmin, int(probe[2]))
                    zmax = max(zmax, int(probe[3]))
                else:
                    rows = max(rows, int(_ct.count_rows(
                        jnp.asarray(x), self.cfg, self.column_k, ztile)))
            if (self.halo_cap or 0) > 0:
                self.halo_cap = self._pick_halo_cap(n_halo, headroom)
                if self._z_auto and self.column_pallas:
                    self.z_window = self._pick_z_window(zmin, zmax)
            want = int(rows * headroom)
            for cap in self._CAP_LADDER:
                if cap >= want:
                    self.column_c_cap = cap
                    break
            else:
                self.column_c_cap = self._CAP_LADDER[-1]
        if (mesh_xs is not None and self.mesh_column_k > 0
                and self.colliders.mesh_colliders):
            rows = 0
            mesh_xs = list(mesh_xs)
            for mx in mesh_xs[::max(1, sample_every)]:
                mx = jnp.asarray(mx)
                for mc in self.colliders.mesh_colliders:
                    centroid = mx[mc.faces].mean(axis=1)
                    rows = max(rows, int(_ct.count_rows(
                        centroid, self.cfg, self.mesh_column_k)))
            n_faces = max(int(mc.faces.shape[0])
                          for mc in self.colliders.mesh_colliders)
            # clamp rounded UP to a multiple of 8: a raw odd n_faces
            # would collapse the Pallas block picker to 1-row programs
            self.mesh_c_cap = min(
                -(-int(rows * headroom) // 256) * 256,
                -(-n_faces // 8) * 8)
        return self.column_c_cap, self.mesh_c_cap

    def adapt_mesh_cap(self, mesh_x, headroom: float = 1.15,
                       quantum: int = 256):
        """Adaptive row cap for the mesh-collider splat: probe the pack
        rows of the CURRENT collider face centroids (+headroom), rounded
        up to ``quantum`` so a moving body re-compiles at most every
        quantum-row change.  Call once per frame before ``frame`` when
        the body mesh moves; a static body needs one call.  Worst case
        is n_faces rows, so the cap is clamped there (always exact)."""
        if self.mesh_column_k <= 0 or not self.colliders.mesh_colliders:
            return self.mesh_c_cap
        from ..ops import column_transfer as _ct
        caps = []
        for mc in self.colliders.mesh_colliders:
            centroid = mesh_x[mc.faces].mean(axis=1)
            rows = int(_ct.count_rows(centroid, self.cfg,
                                      self.mesh_column_k))
            want = -(-int(rows * headroom) // quantum) * quantum
            caps.append(min(want, -(-int(mc.faces.shape[0]) // 8) * 8))
        self.mesh_c_cap = max(caps)
        return self.mesh_c_cap

    @staticmethod
    def check_finite(state: MPMState, context: str = "rollout"):
        """Host-side fail-loud NaN/Inf detector for long rollouts: raises
        on the FIRST bad frame instead of letting the driver write NaN
        OBJs until something downstream chokes.  Call at frame
        boundaries next to ``check_overflow`` (the reference relies on
        in-kernel clamps only — SURVEY.md §5 failure detection)."""
        bad = validate_state(state)
        if bad:
            raise FloatingPointError(
                f"non-finite simulation state during {context}: "
                f"{bad} (field -> bad-value count). The timestep is "
                "likely unstable for this stiffness/grid — reduce dt "
                "(see cfl_dt) or raise the substep count.")

    @staticmethod
    def check_overflow(overflow, context: str = "rollout"):
        """Host-side fail-loud check of the overflow telemetry returned by
        ``frame(..., return_overflow=True)`` — raises instead of letting an
        over-cap scene silently lose mass."""
        n = int(overflow)
        if n > 0:
            raise RuntimeError(
                f"column-transfer overflow during {context}: {n} "
                "particles/collider faces were dropped by the static "
                "caps — raise column_k / column_c_cap / mesh_column_k")


# ----------------------------------------------------------------------
# world <-> sim normalization (train_material_params.py:365-373)
# ----------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SimTransform:
    scale: float
    shift: np.ndarray  # (3,)

    @classmethod
    def from_verts(cls, verts) -> "SimTransform":
        v = np.asarray(verts)
        min_pos = v.min(0)
        max_pos = v.max(0)
        scale = 1.0 / float((max_pos - min_pos).max())
        shift = np.ones(3) - (min_pos + max_pos) / 2.0 * scale
        return cls(scale=scale, shift=shift.astype(np.float32))

    def wld2sim(self, p):
        return p * self.scale + jnp.asarray(self.shift)

    def sim2wld(self, p):
        return (p - jnp.asarray(self.shift)) / self.scale

    def vel2sim(self, v):
        return v * self.scale


def set_parameters_dict(cfg: MPMStaticConfig, model: MPMModel,
                        state: MPMState, params: dict):
    """Functional port of MPMWARP.set_parameters_dict
    (mpm_solver.py:57-126).  Returns (cfg, model, state); ``material``
    changes the *static* config."""
    if "material" in params:
        cfg = dataclasses.replace(cfg, material=MATERIAL_IDS[params["material"]])
    mupd = {}
    if "g" in params:
        mupd["gravity"] = jnp.asarray(params["g"], jnp.float32)
    if "friction_angle" in params:
        ang = params["friction_angle"] / 180.0 * 3.14159265
        sin_phi = np.sin(ang)
        mupd["friction_coeff"] = jnp.float32(np.tan(ang))
        mupd["alpha"] = jnp.float32(np.sqrt(2.0 / 3.0) * 2.0 * sin_phi
                                    / (3.0 - sin_phi))
    for k in ("rpic_damping", "plastic_viscosity", "softening",
              "grid_v_damping_scale", "xi"):
        if k in params:
            mupd[k] = jnp.float32(params[k])
    if mupd:
        model = dataclasses.replace(model, **mupd)
    supd = {}
    if "yield_stress" in params:
        supd["yield_stress"] = jnp.full_like(state.yield_stress,
                                             params["yield_stress"])
    if "density" in params:
        density = jnp.full_like(state.density, params["density"])
        supd["density"] = density
        supd["mass"] = density * state.vol
    if supd:
        state = dataclasses.replace(state, **supd)
    if "hardening" in params:
        cfg = dataclasses.replace(cfg, hardening=int(params["hardening"]))
    return cfg, model, state


def set_E_nu(model: MPMModel, E=None, nu=None, gamma=None, kappa=None,
             finalize: bool = True) -> MPMModel:
    """Functional set_E_nu(+prepare_mu_lam) (mpm_solver.py:128-227).
    Scalars broadcast; arrays are taken per-particle."""
    upd = {}
    for name, val in (("E", E), ("nu", nu), ("gamma", gamma),
                      ("kappa", kappa)):
        if val is not None:
            cur = getattr(model, name)
            upd[name] = jnp.broadcast_to(jnp.asarray(val, cur.dtype),
                                         cur.shape)
    model = dataclasses.replace(model, **upd)
    return finalize_mu_lam(model) if finalize else model


def set_parameters_in_box(model: MPMModel, state: MPMState, point, size,
                          E=None, nu=None, density=None):
    """Region-box material override: particles inside the axis-aligned
    box [point-size, point+size] get new E/nu/density (+mass refresh);
    mu/lam are re-finalized when E/nu change.  Port of
    apply_additional_params (mpm_utils.py:1175-1193)."""
    pt = jnp.asarray(point, state.x.dtype)
    sz = jnp.asarray(size, state.x.dtype)
    inside = jnp.all(jnp.abs(state.x - pt) < sz, axis=-1)
    mupd = {}
    if E is not None:
        mupd["E"] = jnp.where(inside, jnp.asarray(E, model.E.dtype),
                              model.E)
    if nu is not None:
        mupd["nu"] = jnp.where(inside, jnp.asarray(nu, model.nu.dtype),
                               model.nu)
    if mupd:
        model = finalize_mu_lam(dataclasses.replace(model, **mupd))
    if density is not None:
        dens = jnp.where(inside, jnp.asarray(density, state.density.dtype),
                         state.density)
        state = dataclasses.replace(state, density=dens,
                                    mass=dens * state.vol)
    return model, state


def reset_density(state: MPMState, density, update_mass=True) -> MPMState:
    """MPMStateStruct.reset_density (mpm_data_structure.py:434-467)."""
    density = jnp.broadcast_to(jnp.asarray(density, state.density.dtype),
                               state.density.shape)
    mass = density * state.vol if update_mass else state.mass
    return dataclasses.replace(state, density=density, mass=mass)


def export_particle_cov(state: MPMState, cfg: MPMStaticConfig):
    """Render-time covariance export: cov = F_trial @ cov0 @ F_trial^T
    for the non-vertex particles (compute_cov_from_F,
    /root/reference/warp_mpm/mpm_utils.py:1108-1132;
    export_particle_cov_to_torch, mpm_solver.py:543-561)."""
    nnv = cfg.n_no_vertices
    c = state.cov[:nnv]
    cov0 = jnp.stack([
        jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
        jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
        jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
    ], -2)
    E = cfg.n_elements
    # elements have no F; use identity (reference leaves their cov as-is)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=c.dtype),
                           (E, 3, 3))
    f = jnp.concatenate([eye, state.F_trial], 0)[:nnv]
    cov = f @ cov0 @ jnp.swapaxes(f, -1, -2)
    return jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                      cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)


def update_cov(state: MPMState, cfg: MPMStaticConfig, grad_v, dt):
    """Advect the packed covariance with the velocity gradient
    (update_cov, mpm_utils.py:432-452); grad_v is the (P, 3, 3) field
    from gather_quantities.  Returns the new packed (E+T, 6) array."""
    nnv = cfg.n_no_vertices
    c = state.cov
    cov_n = jnp.stack([
        jnp.stack([c[:, 0], c[:, 1], c[:, 2]], -1),
        jnp.stack([c[:, 1], c[:, 3], c[:, 4]], -1),
        jnp.stack([c[:, 2], c[:, 4], c[:, 5]], -1),
    ], -2)
    gv = grad_v[:nnv]
    cov_np1 = cov_n + dt * (gv @ cov_n + cov_n @ jnp.swapaxes(gv, -1, -2))
    return jnp.stack([cov_np1[:, 0, 0], cov_np1[:, 0, 1], cov_np1[:, 0, 2],
                      cov_np1[:, 1, 1], cov_np1[:, 1, 2],
                      cov_np1[:, 2, 2]], -1)


def validate_state(state: MPMState, name: str = "state"):
    """Failure detection (SURVEY.md §5): host-side finite check of the
    dynamic state; returns a dict of offending fields (empty = healthy).
    The reference relies on in-kernel NaN clamps only; this adds an
    explicit detector for long rollouts."""
    import numpy as np
    bad = {}
    for field in ("x", "v", "C", "F", "F_trial", "d"):
        arr = np.asarray(getattr(state, field))
        n_bad = int(np.size(arr) - np.isfinite(arr).sum())
        if n_bad:
            bad[field] = n_bad
    return bad


def cfl_dt(state: MPMState, cfg: MPMStaticConfig, safety: float = 0.5,
           dt_max: float = 1e-3):
    """Suggested stable dt from the CFL condition |v| dt < safety * dx."""
    import numpy as np
    vmax = float(np.abs(np.asarray(state.v)).max())
    if vmax <= 0:
        return dt_max
    return min(dt_max, safety * cfg.dx / vmax)
