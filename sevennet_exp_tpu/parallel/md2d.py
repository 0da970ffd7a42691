"""Domain-decomposed MD on a 2-D (Pa x Pb) pencil mesh.

Generalizes parallel/md.py's 1-D slab ring with the two-phase halo
exchange of domain2d.py: before every convolution, ghost rows refresh
via a ppermute pair along 'dda' (phase A) followed by a ppermute pair
along 'ddb' from [local | phase-A ghost] rows (phase B) -- LAMMPS'
staged-swap scheme (comm_brick.cpp), corner ghosts included without
diagonal messages. Backward halo accumulation falls out of SPMD
autodiff (the VJP of each ppermute is its reverse).

Physics follows parallel/md.py: GLOBAL Nose-Hoover (psum'd kinetic
energy over BOTH mesh axes, real-atom DOF), psum'd strain-gradient
virial for stress.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import _keys as KEY
from ..data.graph import Atoms
from ..data.periodic import atomic_masses
from ..md import integrate
from ..md.integrate import MDState
from ..md.units import fs as FS
from .domain2d import DomainSpec2D, decompose_2d

AXA = 'dda'
AXB = 'ddb'
AXES = (AXA, AXB)


def _two_phase_refresh_fn(spec_caps, sia, sma, sib, smb,
                          shift_a=None, shift_b=None):
    """refresh(x) for per-device arrays inside shard_map over (Pa, Pb).

    x: (cap_all, F); rows refresh as [local | gA_lo | gA_hi | gB_lo |
    gB_hi]. shift_a/shift_b (positions only) are added at the sender.
    """
    cap_loc, cap_ga, cap_gb, Pa, Pb = spec_caps
    cap_a_all = cap_loc + 2 * cap_ga

    def ring(v, axis_name, n_dev, up):
        perm = ([(i, (i - 1) % n_dev) for i in range(n_dev)] if up
                else [(i, (i + 1) % n_dev) for i in range(n_dev)])
        return jax.lax.ppermute(v, axis_name, perm)

    def refresh(x):
        d = x[..., None] if x.ndim == 1 else x
        # phase A along 'dda'
        s0 = d[sia[0]] * sma[0][:, None]
        s1 = d[sia[1]] * sma[1][:, None]
        if shift_a is not None:
            s0 = s0 + shift_a[0] * sma[0][:, None]
            s1 = s1 + shift_a[1] * sma[1][:, None]
        from_hi = ring(s0, AXA, Pa, up=True)   # side-0 goes to da-1
        from_lo = ring(s1, AXA, Pa, up=False)
        xa = jnp.concatenate([d[:cap_loc], from_hi, from_lo], axis=0)
        # phase B along 'ddb', sends select from [local | gA]
        t0 = xa[sib[0]] * smb[0][:, None]
        t1 = xa[sib[1]] * smb[1][:, None]
        if shift_b is not None:
            t0 = t0 + shift_b[0] * smb[0][:, None]
            t1 = t1 + shift_b[1] * smb[1][:, None]
        from_bhi = ring(t0, AXB, Pb, up=True)
        from_blo = ring(t1, AXB, Pb, up=False)
        out = jnp.concatenate([xa, from_bhi, from_blo], axis=0)
        return out[..., 0] if x.ndim == 1 else out

    return refresh


class ParallelMolecularDynamics2D:
    """NVE/NVT MD over a (Pa x Pb) pencil mesh (two-phase halos)."""

    def __init__(
        self,
        model,
        params,
        atoms: Atoms,
        mesh_shape: Tuple[int, int],
        axes: Tuple[int, int] = (0, 1),
        dt_fs: float = 2.0,
        temperature_K: float = 300.0,
        ensemble: str = 'nvt',
        tdamp_fs: Optional[float] = None,
        skin: float = 1.0,
        rebuild_every: int = 10,
        seed: int = 0,
        dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
    ):
        from ..ops import pallas_tp
        if use_pallas is None:
            if jax.default_backend() not in ('cpu',):
                pallas_tp.enable(True)
        else:
            pallas_tp.enable(bool(use_pallas))
        Pa, Pb = mesh_shape
        devices = jax.devices()
        assert Pa * Pb <= len(devices), 'not enough devices'
        self.mesh_shape = (Pa, Pb)
        self.mesh = Mesh(
            np.array(devices[:Pa * Pb]).reshape(Pa, Pb), (AXA, AXB)
        )
        self.model = model
        self.params = params
        self.dtype = dtype
        self.atoms = atoms
        self.cutoff = float(model.cutoff)
        self.build_cutoff = self.cutoff + skin
        self.dt = dt_fs * FS
        self.temperature_K = temperature_K
        self.ensemble = ensemble
        self.tdamp = (tdamp_fs or 50.0 * dt_fs) * FS
        self.rebuild_every = rebuild_every
        self.seed = seed
        self.axes = axes
        self.time_steps = 0
        self.volume = float(abs(np.linalg.det(np.asarray(atoms.cell))))
        self.n_dof = 3 * len(atoms)

        self.spec = decompose_2d(
            atoms, self.mesh_shape, self.build_cutoff, axes=axes
        )
        self._push_state(init_velocities=True)

    # -- host <-> device -----------------------------------------------
    def _push_state(self, init_velocities=False, vel_global=None):
        spec = self.spec
        self.Z = jnp.asarray(spec.z, dtype=jnp.int32)
        self.pos = jnp.asarray(spec.pos, dtype=self.dtype)
        self.loc_mask = jnp.asarray(spec.loc_mask, dtype=self.dtype)
        self.sia = jnp.asarray(spec.send_idx_a, dtype=jnp.int32)
        self.sma = jnp.asarray(spec.send_mask_a, dtype=self.dtype)
        self.sha = jnp.asarray(spec.shift_a, dtype=self.dtype)
        self.sib = jnp.asarray(spec.send_idx_b, dtype=jnp.int32)
        self.smb = jnp.asarray(spec.send_mask_b, dtype=self.dtype)
        self.shb = jnp.asarray(spec.shift_b, dtype=self.dtype)
        self.edge_idx = jnp.asarray(spec.edge_idx, dtype=jnp.int32)
        self.edge_mask = jnp.asarray(spec.edge_mask, dtype=self.dtype)
        masses = np.asarray(atomic_masses)[spec.z] * (spec.loc_mask > 0)
        masses = masses + (spec.loc_mask == 0)
        self.masses = jnp.asarray(masses, dtype=self.dtype)

        if init_velocities:
            rng = np.random.default_rng(self.seed)
            from ..md.units import kB
            v = rng.normal(size=spec.pos.shape) * np.sqrt(
                kB * self.temperature_K / np.asarray(masses)
            )[..., None]
            v = v * spec.loc_mask[..., None]
            self.vel = jnp.asarray(v, dtype=self.dtype)
        elif vel_global is not None:
            vel = np.zeros_like(spec.pos)
            off = 0
            for d in range(spec.pos.shape[0]):
                m = int(spec.n_loc[d])
                vel[d, :m] = vel_global[spec.owner_perm[off:off + m]]
                off += m
            self.vel = jnp.asarray(vel, dtype=self.dtype)

    def gather_global(self):
        spec = self.spec
        pos = np.asarray(self.pos)
        vel = np.asarray(self.vel)
        n = len(self.atoms)
        gp = np.zeros((n, 3))
        gv = np.zeros((n, 3))
        off = 0
        for d in range(pos.shape[0]):
            m = int(spec.n_loc[d])
            gp[spec.owner_perm[off:off + m]] = pos[d, :m]
            gv[spec.owner_perm[off:off + m]] = vel[d, :m]
            off += m
        return gp, gv

    # -- per-shard energy/forces ---------------------------------------
    def _shard_energy(self, pos_loc, strain, z, loc_mask, sia, sma, sha,
                      sib, smb, shb, edge_idx, edge_mask):
        spec = self.spec
        Pa, Pb = self.mesh_shape
        caps = (spec.cap_loc, spec.cap_ga, spec.cap_gb, Pa, Pb)
        pos_refresh = _two_phase_refresh_fn(
            caps, sia, sma, sib, smb, shift_a=sha, shift_b=shb
        )
        feat_refresh = _two_phase_refresh_fn(caps, sia, sma, sib, smb)

        pos_all = pos_refresh(
            jnp.concatenate([
                pos_loc,
                jnp.zeros((2 * spec.cap_ga, 3), pos_loc.dtype),
            ])
        )
        vec = pos_all[edge_idx[1]] - pos_all[edge_idx[0]]
        r2 = jnp.sum(vec * vec, axis=-1)
        mask = (edge_mask > 0) & (r2 < self.cutoff ** 2)
        safe = jnp.where(
            mask[:, None], vec, jnp.array([1.0, 0.0, 0.0], vec.dtype)
        )
        safe = safe + safe @ strain
        cap_all = spec.cap_all
        z_all = jnp.concatenate(
            [z, jnp.zeros(2 * spec.cap_ga, z.dtype)]
        )
        z_all = feat_refresh(z_all.astype(pos_loc.dtype)).astype(jnp.int32)
        # ghosts never contribute energy: each atom counts only on its
        # owner device
        node_mask = jnp.concatenate([
            loc_mask,
            jnp.zeros(cap_all - spec.cap_loc, loc_mask.dtype),
        ])
        data = {
            KEY.ATOMIC_NUMBERS: z_all,
            KEY.EDGE_IDX: edge_idx,
            KEY.EDGE_VEC: safe,
            KEY.EDGE_MASK: mask.astype(safe.dtype),
            KEY.BATCH: jnp.zeros(cap_all, dtype=jnp.int32),
            KEY.NUM_ATOMS: jnp.array([cap_all], dtype=jnp.int32),
            KEY.NODE_MASK: node_mask,
            KEY.CELL_VOLUME: jnp.array([self.volume], safe.dtype),
        }
        out = self.model.apply_energy(
            self.params, data, halo_refresh=feat_refresh
        )
        return jnp.sum(out[KEY.PRED_TOTAL_ENERGY])

    def _psum2(self, v):
        return jax.lax.psum(jax.lax.psum(v, AXA), AXB)

    def _shard_efs(self, pos_loc, z, loc_mask, sia, sma, sha, sib, smb,
                   shb, edge_idx, edge_mask):
        eps0 = jnp.zeros((3, 3), pos_loc.dtype)
        e, (g_pos, g_eps) = jax.value_and_grad(
            self._shard_energy, argnums=(0, 1)
        )(
            pos_loc, eps0, z, loc_mask, sia, sma, sha, sib, smb, shb,
            edge_idx, edge_mask,
        )
        e_tot = self._psum2(e)
        v = self._psum2(g_eps)
        stress = -jnp.stack([
            v[0, 0], v[1, 1], v[2, 2], v[0, 1], v[1, 2], v[2, 0]
        ]) / self.volume
        return e_tot, -g_pos, stress

    def _shard_ef(self, *args):
        e, f, _ = self._shard_efs(*args)
        return e, f

    # -- single-shot oracle --------------------------------------------
    def energy_forces(self, return_stress: bool = False):
        def shard_fn(pos, z, loc_mask, sia, sma, sha, sib, smb, shb,
                     edge_idx, edge_mask):
            sq = lambda a: a.reshape(a.shape[2:])
            e, f, s = self._shard_efs(
                sq(pos), sq(z), sq(loc_mask), sq(sia), sq(sma),
                sq(sha), sq(sib), sq(smb), sq(shb), sq(edge_idx),
                sq(edge_mask),
            )
            return (e[None, None], f[None, None], s[None, None])

        spec2 = P(AXA, AXB)
        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=tuple([spec2] * 11),
            out_specs=(spec2, spec2, spec2),
            check_vma=False,
        )
        Pa, Pb = self.mesh_shape
        r2 = lambda a: a.reshape((Pa, Pb) + a.shape[1:])
        e, f, s = jax.jit(fn)(
            r2(self.pos), r2(self.Z), r2(self.loc_mask), r2(self.sia),
            r2(self.sma), r2(self.sha), r2(self.sib), r2(self.smb),
            r2(self.shb), r2(self.edge_idx), r2(self.edge_mask),
        )
        e_tot = float(np.asarray(e)[0, 0])
        f = np.asarray(f).reshape((-1,) + f.shape[2:])
        spec = self.spec
        n = len(self.atoms)
        fg = np.zeros((n, 3))
        off = 0
        for d in range(f.shape[0]):
            m = int(spec.n_loc[d])
            fg[spec.owner_perm[off:off + m]] = f[d, :m]
            off += m
        if return_stress:
            return e_tot, fg, np.asarray(s)[0, 0]
        return e_tot, fg

    # -- run loop -------------------------------------------------------
    def _compiled_chunk(self, length: int):
        def shard_chunk(pos, vel, key, xi, z, loc_mask, masses,
                        sia, sma, sha, sib, smb, shb,
                        edge_idx, edge_mask):
            sq = lambda a: a.reshape(a.shape[2:])
            pos, vel, z, loc_mask, masses = map(
                sq, (pos, vel, z, loc_mask, masses)
            )
            sia_, sma_, sha_ = sq(sia), sq(sma), sq(sha)
            sib_, smb_, shb_ = sq(sib), sq(smb), sq(shb)
            edge_idx_, edge_mask_ = sq(edge_idx), sq(edge_mask)
            key = key.reshape(key.shape[2:])
            xi = xi.reshape(())

            def ef(p, nl_unused):
                return self._shard_ef(
                    p, z, loc_mask, sia_, sma_, sha_, sib_, smb_,
                    shb_, edge_idx_, edge_mask_,
                )

            if self.ensemble == 'nve':
                step = integrate.make_nve_step(ef, masses, self.dt)
            else:
                step = integrate.make_nose_hoover_step(
                    ef, masses, self.dt, self.temperature_K,
                    self.tdamp, n_dof=self.n_dof,
                    ke_reduce=self._psum2,
                )

            e0, f0 = ef(pos, None)
            state = MDState(pos=pos, vel=vel,
                            forces=f0 * loc_mask[:, None],
                            energy=e0, key=key, xi=xi)

            def body(s, _):
                s2 = step(s, None)
                return s2._replace(
                    forces=s2.forces * loc_mask[:, None],
                    vel=s2.vel * loc_mask[:, None],
                ), None

            state, _ = jax.lax.scan(body, state, None, length=length)
            ke = self._psum2(
                0.5 * jnp.sum(masses[:, None] * state.vel ** 2)
            )
            from ..md.units import kB
            temp = 2.0 * ke / (self.n_dof * kB)
            return (
                state.pos[None, None], state.vel[None, None],
                state.key[None, None], state.xi[None, None],
                state.energy[None, None], temp[None, None],
            )

        spec2 = P(AXA, AXB)
        fn = shard_map(
            shard_chunk, mesh=self.mesh,
            in_specs=tuple([spec2] * 15),
            out_specs=tuple([spec2] * 6),
            check_vma=False,
        )
        return jax.jit(fn)

    def _chunk_for(self, length: int):
        key = (length, self.spec.cap_loc, self.spec.cap_ga,
               self.spec.cap_gb, self.spec.cap_edge)
        chunks = getattr(self, '_chunks', None)
        if chunks is None:
            chunks = self._chunks = {}
        if key not in chunks:
            chunks[key] = self._compiled_chunk(length)
        return chunks[key]

    def run(self, n_steps: int) -> Dict[str, np.ndarray]:
        Pa, Pb = self.mesh_shape
        D = Pa * Pb
        if not hasattr(self, '_keys'):
            base = jax.random.PRNGKey(self.seed + 1)
            self._keys = jax.random.split(base, D)
            self._xi = jnp.zeros((D,), self.dtype)
        energies, temps = [], []
        done = 0
        r2 = lambda a: a.reshape((Pa, Pb) + a.shape[1:])
        while done < n_steps:
            length = min(self.rebuild_every, n_steps - done)
            chunk = self._chunk_for(length)
            pos, vel, keys, xi, e, temp = chunk(
                r2(self.pos), r2(self.vel), r2(self._keys),
                r2(self._xi), r2(self.Z), r2(self.loc_mask),
                r2(self.masses), r2(self.sia), r2(self.sma),
                r2(self.sha), r2(self.sib), r2(self.smb), r2(self.shb),
                r2(self.edge_idx), r2(self.edge_mask),
            )
            flat = lambda a: jnp.asarray(a).reshape(
                (-1,) + a.shape[2:]
            )
            self.pos, self.vel = flat(pos), flat(vel)
            self._keys, self._xi = flat(keys), flat(xi)
            energies.append(float(np.asarray(e)[0, 0]))
            temps.append(float(np.asarray(temp)[0, 0]))
            done += length
            self.time_steps += length
            if done < n_steps:
                self._rebuild()
        return {
            'energy': np.array(energies),
            'temperature': np.array(temps),
        }

    def _rebuild(self):
        gp, gv = self.gather_global()
        at = Atoms(
            atomic_numbers=self.atoms.atomic_numbers, pos=gp,
            cell=self.atoms.cell, pbc=self.atoms.pbc,
        )
        self.atoms = at
        self.spec = decompose_2d(
            at, self.mesh_shape, self.build_cutoff, axes=self.axes,
            caps=(self.spec.cap_loc, self.spec.cap_ga,
                  self.spec.cap_gb, self.spec.cap_edge),
        )
        self._push_state(vel_global=gv)
