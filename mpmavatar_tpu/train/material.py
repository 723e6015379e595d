"""Stage-3 inverse material estimation + stage-4 simulation/eval.

Port of the ``Trainer`` in /root/reference/train_material_params.py:62-883,
with the central upgrade promised by the design (SURVEY.md §3.3): the
material parameters (D = density, E = Young's modulus, H = rest-shape
vertical scale) are optimized with TRUE gradients from ``jax.grad``
through the scanned MPM rollout — one differentiable rollout per step
instead of the reference's four finite-difference rollouts.  A
``finite_diff=True`` mode reproduces the reference's probe scheme exactly
for comparison.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import types
from ..sim import MPMSolver, SimTransform, reset_density, set_E_nu
from ..utils.schedules import cosine_lr


@dataclasses.dataclass
class MaterialTrainerConfig:
    """Mirrors the relevant ModelParams/OptimizationParams knobs
    (arguments/__init__.py:81-97,142-144)."""
    grid_size: int = 200
    grid_lim: float = 2.0
    substep: int = 400
    fps: float = 25.0
    init_D: float = 1.0
    init_E: float = 100.0   # stored /100 like the reference's E knob
    init_nu: float = 0.3
    init_gamma: float = 500.0
    init_kappa: float = 500.0
    friction_angle: float = 40.0
    mesh_friction_coeff: float = 0.5
    min_D: float = 0.1
    max_D: float = 3.0
    min_E: float = 0.5
    max_E: float = 20.0
    min_H: float = 0.8
    max_H: float = 1.2
    lr_D: float = 1e-2
    lr_E: float = 3e-1
    lr_H: float = 1e-2
    iterations: int = 200
    thickness: float = 1e-5
    # TPU transfer-path knobs (0 = slow reference-semantics scatter
    # path).  K=96 / radius-1 exact rebin / fused Mosaic kernels is the
    # measured-fastest configuration (ROUND_NOTES.md trajectory table);
    # caps are calibrated from the trajectory at setup.
    column_k: int = 96
    mesh_column_k: int = 32
    column_c_cap: int = 4096
    column_radius: int = 1
    rebin_auto: bool = False


class MaterialTrainer:
    """Owns the sim setup for a garment split and optimizes (D, E, H).

    Inputs (all world-space numpy/jax arrays):
      cloth_verts0 (V, 3)     garment vertices at the first train frame
      cloth_faces (E, 3)
      first_frame_verts (V, 3) vertices of frame 0 of tracking (H scaling
                              reference, train_material_params.py:411)
      train_verts (F+1, V, 3) tracked garment trajectory (supervision)
      smplx_verts (F+1, Vb, 3) body collider trajectory
      smplx_faces (Fb, 3)
      joint_v_idx prefix length = num_joint_v; joint faces prefix
      num_joint_f (split_idx convention, preprocess/split_garments.py).
    """

    def __init__(self, cfg: MaterialTrainerConfig, cloth_faces,
                 first_frame_verts, train_verts, smplx_verts, smplx_faces,
                 num_joint_v: int, num_joint_f: int):
        self.cfg = cfg
        self.faces = np.asarray(cloth_faces, np.int32)
        self.train_verts = np.asarray(train_verts, np.float32)
        self.smplx_verts = np.asarray(smplx_verts, np.float32)
        self.smplx_faces = np.asarray(smplx_faces, np.int32)
        verts0 = self.train_verts[0]

        # world<->sim normalization (train_material_params.py:365-373)
        self.tf = SimTransform.from_verts(verts0)
        E, V = len(self.faces), len(verts0)
        self.static = types.MPMStaticConfig(
            n_elements=E, n_traditional=0, n_vertices=V,
            n_grid=cfg.grid_size, grid_lim=cfg.grid_lim, material=7,
            num_joint_v=num_joint_v, num_joint_f=num_joint_f)

        sim_verts0 = np.asarray(self.tf.wld2sim(jnp.asarray(verts0)))
        d, _, evol, vvol = types.cloth_geometry(
            jnp.asarray(sim_verts0), jnp.asarray(self.faces),
            thickness=cfg.thickness)
        x0 = jnp.concatenate([jnp.asarray(sim_verts0)[self.faces].mean(1),
                              jnp.asarray(sim_verts0)], 0)
        vol = jnp.concatenate([evol, vvol], 0)
        self.base_state = types.make_state(
            self.static, x0, faces=self.faces, d=d,
            R_inv=jnp.zeros((E, 3)), vol=vol)
        self.vertices_init_sim = jnp.asarray(
            np.asarray(self.tf.wld2sim(jnp.asarray(first_frame_verts))))

        self.model0 = types.make_model(
            self.static.n_particles, E=cfg.init_E,  # overwritten per step
            nu=cfg.init_nu, gamma=cfg.init_gamma, kappa=cfg.init_kappa,
            friction_angle=cfg.friction_angle)

        self.solver = MPMSolver(
            self.static, column_k=cfg.column_k,
            mesh_column_k=cfg.mesh_column_k,
            column_c_cap=(cfg.column_c_cap or None),
            column_radius=cfg.column_radius,
            rebin_auto=cfg.rebin_auto and cfg.column_k > 0,
            faces=self.faces)
        self.solver.add_mesh_collider(self.smplx_faces,
                                      friction=cfg.mesh_friction_coeff)
        self.solver.add_particle_mover()
        # size the static transfer caps ONCE from the full known
        # trajectory: no overflow at any frame, no mid-training recompiles
        # (per-frame adaptation would re-jit the grad rollout)
        if cfg.column_k > 0:
            tv = self.train_verts
            cents = tv[:, self.faces].mean(axis=2)
            xs = [np.asarray(self.tf.wld2sim(jnp.asarray(
                np.concatenate([cents[i], tv[i]], 0))))
                for i in range(0, len(tv), 4)]
            mesh_xs = [np.asarray(self.tf.wld2sim(jnp.asarray(v)))
                       for v in self.smplx_verts[::4]]
            self.solver.calibrate_caps(xs=xs, mesh_xs=mesh_xs,
                                       sample_every=1)

        # per-frame kinematics in sim units (train_material_params.py:616-626)
        fps = cfg.fps
        self.train_verts_velo = (self.train_verts[1:]
                                 - self.train_verts[:-1]) * fps
        self.smplx_velo = (self.smplx_verts[1:]
                           - self.smplx_verts[:-1]) * fps

        self.params = {
            "D": jnp.float32(cfg.init_D),
            "E": jnp.float32(cfg.init_E / 100.0),
            "H": jnp.float32(1.0),
        }
        self.tx = optax.chain(optax.multi_transform(
            {"D": optax.adam(cfg.lr_D), "E": optax.adam(cfg.lr_E),
             "H": optax.adam(cfg.lr_H)},
            {"D": "D", "E": "E", "H": "H"}))
        self.opt_state = self.tx.init(self.params)
        self.lr_schedule = cosine_lr(1.0, cfg.iterations)
        self.step = 0
        self.best = {"loss": np.inf, "params": dict(self.params)}
        self._rollout_loss = self._build_rollout()

    def _rest_dir_inv(self, h):
        """H-scaled rest metric (train_material_params.py:587)."""
        v = self.vertices_init_sim
        scaled = jnp.stack([v[:, 0], v[:, 1] * h, v[:, 2]], 1)
        return types.rest_dir_inv_from_vf(scaled, jnp.asarray(self.faces))

    def _build_rollout(self):
        cfg = self.cfg
        solver = self.solver
        static = self.static
        dt = (1.0 / cfg.fps) / cfg.substep
        n_frames = self.train_verts.shape[0] - 1
        scale = self.tf.scale

        # rollout data passed as jit ARGUMENTS (large closed-over
        # constants can exceed remote-compile payload limits on some TPU
        # deployments) and threaded through lax.scan as xs
        faces_j = jnp.asarray(self.faces[:static.num_joint_f])
        self._rollout_data = {
            "smplx_sim": jnp.asarray(np.asarray(
                self.tf.wld2sim(jnp.asarray(self.smplx_verts))))[:n_frames],
            "smplx_velo_sim": jnp.asarray(self.smplx_velo) * scale,
            "target_sim": jnp.asarray(np.asarray(
                self.tf.wld2sim(jnp.asarray(self.train_verts))))[1:],
            "joint_velo_sim": jnp.asarray(
                self.train_verts_velo[:, :static.num_joint_v]) * scale,
            "base_state": self.base_state,
            "verts_init_sim": self.vertices_init_sim,
        }

        def rollout_loss(params, data):
            d = params["D"]
            e = params["E"] * 100.0
            h = params["H"]
            model = set_E_nu(self.model0, E=e)
            state = reset_density(data["base_state"], d)
            v0 = data["verts_init_sim"]
            scaled = jnp.stack([v0[:, 0], v0[:, 1] * h, v0[:, 2]], 1)
            r_inv = types.rest_dir_inv_from_vf(scaled,
                                               jnp.asarray(self.faces))
            state = dataclasses.replace(state, R_inv=r_inv)

            def frame_body(carry, xs):
                st, t, of = carry
                mesh_x, mesh_v, jv, target = xs
                jf = jv[faces_j].mean(1)
                st, t, st_of = solver.frame(st, model, dt, cfg.substep, t,
                                            mesh_x=mesh_x, mesh_v=mesh_v,
                                            joint_verts_v=jv,
                                            joint_faces_v=jf,
                                            remat=True,
                                            return_overflow=True)
                cloth = st.x[static.n_elements:]
                floss = jnp.mean((cloth - target) ** 2)
                return (st, t, jnp.maximum(of, st_of)), floss

            # overflow rides the scan as an aux: the trainer's static caps
            # are calibrated from the TRACKED trajectory, but the simulated
            # cloth can drift past the headroom mid-training — overflowing
            # bins silently drop particles and corrupt loss AND gradient,
            # so the caller must fail loud (ADVICE r2)
            #
            # two-level remat (SURVEY.md §7.2): the frame body is
            # checkpointed HERE so the forward stores only per-frame
            # states; solver.frame(remat=True) checkpoints the substep
            # body so the backward of one frame stores substep carries,
            # not per-substep grid intermediates.  Without the frame
            # level, a production rollout (24 frames x 400 substeps at
            # ~100k particles) materializes every frame's 400 substep
            # carries at once (~5 GB/frame) and cannot fit HBM.
            (_, _, overflow), losses = jax.lax.scan(
                jax.checkpoint(frame_body, prevent_cse=False),
                (state, jnp.float32(0.0),
                 jnp.zeros((), jnp.int32)),
                (data["smplx_sim"], data["smplx_velo_sim"],
                 data["joint_velo_sim"], data["target_sim"]))
            return jnp.mean(losses), overflow

        vg = jax.jit(jax.value_and_grad(rollout_loss, has_aux=True))
        # raw (loss, overflow) fn: forward-only timing + diagnostics
        self._rollout_loss_fn = rollout_loss
        return lambda params: vg(params, self._rollout_data)

    def train_one_step(self):
        """One optimization step with autodiff gradients
        (supersedes train_material_params.py:571-714)."""
        cfg = self.cfg
        (loss, overflow), grads = self._rollout_loss(self.params)
        self.solver.check_overflow(overflow,
                                   context=f"training step {self.step}")
        lr_scale = self.lr_schedule(self.step)
        grads = jax.tree.map(lambda g: g * lr_scale, grads)
        updates, self.opt_state = self.tx.update(grads, self.opt_state,
                                                 self.params)
        self.params = optax.apply_updates(self.params, updates)
        self.params = {
            "D": jnp.clip(self.params["D"], cfg.min_D, cfg.max_D),
            "E": jnp.clip(self.params["E"], cfg.min_E, cfg.max_E),
            "H": jnp.clip(self.params["H"], cfg.min_H, cfg.max_H),
        }
        loss_f = float(loss)
        if loss_f < self.best["loss"]:
            self.best = {"loss": loss_f,
                         "params": {k: float(v)
                                    for k, v in self.params.items()}}
        self.step += 1
        return loss_f, {k: float(v) for k, v in self.params.items()}

    def train_one_step_finite_diff(self, probes=((0.0, 0.0, 0.0),
                                                 (0.05, 0.0, 0.0),
                                                 (0.0, 0.05, 0.0),
                                                 (0.0, 0.0, 0.005))):
        """The reference's exact 4-rollout finite-difference scheme
        (train_material_params.py:583-655), for parity checks."""
        losses = []
        for (dD, dE, dH) in probes:
            p = {"D": self.params["D"] + dD, "E": self.params["E"] + dE,
                 "H": self.params["H"] + dH}
            (loss, overflow), _ = self._rollout_loss(p)
            self.solver.check_overflow(
                overflow, context=f"FD probe at step {self.step}")
            losses.append(float(loss))
        grads = {"D": jnp.float32((losses[1] - losses[0]) / 0.05),
                 "E": jnp.float32((losses[2] - losses[0]) / 0.05),
                 "H": jnp.float32((losses[3] - losses[0]) / 0.005)}
        updates, self.opt_state = self.tx.update(grads, self.opt_state,
                                                 self.params)
        self.params = optax.apply_updates(self.params, updates)
        cfg = self.cfg
        self.params = {
            "D": jnp.clip(self.params["D"], cfg.min_D, cfg.max_D),
            "E": jnp.clip(self.params["E"], cfg.min_E, cfg.max_E),
            "H": jnp.clip(self.params["H"], cfg.min_H, cfg.max_H),
        }
        self.step += 1
        return losses[0], {k: float(v) for k, v in self.params.items()}

    def save(self, out_dir: str):
        """best/last param npz (train_material_params.py:725-728)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        np.savez(os.path.join(out_dir, f"best_param_{self.step:05d}.npz"),
                 D=self.best["params"]["D"],
                 E=self.best["params"]["E"] * 100.0,
                 H=self.best["params"]["H"], loss=self.best["loss"],
                 step=self.step)
        np.savez(os.path.join(out_dir, f"last_param_{self.step:05d}.npz"),
                 D=float(self.params["D"]),
                 E=float(self.params["E"]) * 100.0,
                 H=float(self.params["H"]), step=self.step)

    def simulate(self, test_verts0, test_verts_velo0, test_smplx,
                 test_smplx_velo, n_frames: int,
                 joint_velo_fn=None):
        """Stage-4 rollout on test poses (train_material_params.py:730-822):
        returns per-frame cloth vertices in world space."""
        cfg = self.cfg
        static = self.static
        dt = (1.0 / cfg.fps) / cfg.substep
        d = self.params["D"]
        e = self.params["E"] * 100.0
        h = self.params["H"]
        model = set_E_nu(self.model0, E=e)

        sim_v0 = self.tf.wld2sim(jnp.asarray(test_verts0))
        dmat, _, evol, vvol = types.cloth_geometry(
            sim_v0, jnp.asarray(self.faces), thickness=cfg.thickness)
        init_velo = jnp.asarray(test_verts_velo0) * self.tf.scale
        x0 = jnp.concatenate([sim_v0[self.faces].mean(1), sim_v0], 0)
        v0 = jnp.concatenate([init_velo[self.faces].mean(1), init_velo], 0)
        state = types.make_state(static, x0, faces=self.faces, d=dmat,
                                 R_inv=self._rest_dir_inv(h),
                                 vol=jnp.concatenate([evol, vvol]), v=v0)
        state = reset_density(state, d)

        outs = []
        t = jnp.float32(0.0)
        for i in range(n_frames):
            mesh_x = self.tf.wld2sim(jnp.asarray(test_smplx[i]))
            mesh_v = jnp.asarray(test_smplx_velo[i]) * self.tf.scale
            if joint_velo_fn is not None:
                jv = joint_velo_fn(i) * self.tf.scale
                jf = jv[jnp.asarray(self.faces[:static.num_joint_f])].mean(1)
            else:
                jv = jf = None
            state, t, of = self.solver.frame(
                state, model, dt, cfg.substep, t, mesh_x=mesh_x,
                mesh_v=mesh_v, joint_verts_v=jv, joint_faces_v=jf,
                return_overflow=True)
            self.solver.check_overflow(of, context=f"simulate frame {i}")
            self.solver.check_finite(state, context=f"simulate frame {i}")
            cloth = self.tf.sim2wld(state.x[static.n_elements:])
            outs.append(np.asarray(cloth))
        return outs
