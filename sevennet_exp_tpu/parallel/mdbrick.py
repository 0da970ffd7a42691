"""Domain-decomposed MD on a K-axis brick mesh (K = 1, 2, or 3).

The single generalized engine behind the 1-D slab ring, 2-D pencils,
and full 3-D bricks: shard_map over a (P0[, P1[, P2]]) device mesh with
K staged ppermute halo phases before every convolution (the analog of
comm_brick.cpp's per-dimension swaps + pair_e3gnn_parallel.cpp:355-387
per-segment forward_comm; backward ghost accumulation falls out of SPMD
autodiff — the VJP of each ppermute is its reverse).

Runs the round-2 single-chip fast path per shard (VERDICT r2 #2): the
decomposition emits a symmetric dense neighbor grid (EDGE_REV +
EDGE_DENSE_D, parallel/brick.py), so the hot loop is scatter-free and
the fused Pallas convolution kernels engage — multi-chip MD no longer
falls through to the unsorted segment-sum path (model/layers.py).

Physics follows parallel/md.py round 2: GLOBAL Nose-Hoover (psum'd
kinetic energy over all mesh axes, real-atom DOF), psum'd
strain-gradient virial for stress.
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
from ..ops.scatter import gather_pair
from .brick import BrickSpec, decompose_brick

AXIS_NAMES = ('bk0', 'bk1', 'bk2')


def _staged_refresh_fn(cap_loc, mesh, send_idx, send_mask, shifts=None):
    """refresh(x) for per-device arrays inside shard_map over the brick
    mesh: K ppermute pairs, phase k sending rows (selected from the
    view accumulated so far) along mesh axis k. x needs >= cap_loc
    rows; ghost rows are rebuilt from scratch. shifts: per-phase
    cartesian shifts added at the sender (positions only)."""
    K = len(mesh)

    def refresh(x):
        d = x[..., None] if x.ndim == 1 else x
        cur = d[:cap_loc]
        for k in range(K):
            si, sm = send_idx[k], send_mask[k]
            s0 = cur[si[0]] * sm[0][:, None]
            s1 = cur[si[1]] * sm[1][:, None]
            if shifts is not None:
                s0 = s0 + shifts[k][0] * sm[0][:, None]
                s1 = s1 + shifts[k][1] * sm[1][:, None]
            n_k = mesh[k]
            # side-0 sends go to the lower neighbor along axis k
            from_hi = jax.lax.ppermute(
                s0, AXIS_NAMES[k],
                [(i, (i - 1) % n_k) for i in range(n_k)],
            )
            from_lo = jax.lax.ppermute(
                s1, AXIS_NAMES[k],
                [(i, (i + 1) % n_k) for i in range(n_k)],
            )
            cur = jnp.concatenate([cur, from_hi, from_lo], axis=0)
        return cur[..., 0] if x.ndim == 1 else cur

    return refresh


class BrickMolecularDynamics:
    """NVE/NVT MD over a K-axis brick mesh with staged halos and the
    dense-grid fast path. mesh_shape: (P0[, P1[, P2]])."""

    def __init__(
        self,
        model,
        params,
        atoms: Atoms,
        mesh_shape: Tuple[int, ...],
        axes: Optional[Tuple[int, ...]] = None,
        dt_fs: float = 2.0,
        temperature_K: float = 300.0,
        ensemble: str = 'nvt',
        tdamp_fs: Optional[float] = None,
        skin: float = 1.0,
        rebuild_every: int = 10,
        seed: int = 0,
        dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
        device_rebuild: bool = True,
        cap_margin: float = 1.25,
        conv_chunk_rows: Optional[int] = None,
    ):
        """device_rebuild: migrate atoms and rebuild halos + neighbor
        grids INSIDE the jitted chunk (parallel/devrebuild.py — the
        LAMMPS exchange()/borders() analog on ICI); run(n) then never
        gathers global arrays to the host. False = host re-decompose
        between chunks (the round-2 behavior; also the automatic
        fallback when a static capacity overflows)."""
        from ..ops import pallas_tp
        if use_pallas is None:
            if jax.default_backend() not in ('cpu',):
                pallas_tp.enable(True)
        else:
            pallas_tp.enable(bool(use_pallas))
        self.mesh_shape = tuple(int(p) for p in mesh_shape)
        K = len(self.mesh_shape)
        D = int(np.prod(self.mesh_shape))
        devices = jax.devices()
        assert D <= len(devices), 'not enough devices'
        self.n_dev = D
        self.mesh = Mesh(
            np.array(devices[:D]).reshape(self.mesh_shape),
            AXIS_NAMES[:K],
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
        self.axes = tuple(axes) if axes is not None else tuple(range(K))
        self.time_steps = 0
        self.volume = float(abs(np.linalg.det(np.asarray(atoms.cell))))
        self.n_dof = 3 * len(atoms)

        self.device_rebuild = device_rebuild
        # memory-chunked convolution per shard (None = auto threshold,
        # 0 = off, else explicit rows): lifts the per-shard edge
        # capacity above the ~512k-row whole-array regime (the engine's
        # CONV_CHUNK_ROWS path, VERDICT r3 #6) -- 100k-1M atoms on a
        # pod slice run chunked inside each brick
        self._conv_chunk_rows_arg = conv_chunk_rows
        # cap_margin: static-capacity headroom factor (1.25 default);
        # tests force the overflow -> host-re-decompose -> retry path
        # with 1.0
        self.cap_margin = float(cap_margin)
        self.spec = decompose_brick(
            atoms, self.mesh_shape, self.build_cutoff, axes=self.axes,
            cap_margin=self.cap_margin,
        )
        self._push_state(init_velocities=True)

    # -- host <-> device -----------------------------------------------
    def _push_state(self, init_velocities=False, vel_global=None):
        spec = self.spec
        self.Z = jnp.asarray(spec.z, dtype=jnp.int32)
        self.pos = jnp.asarray(spec.pos, dtype=self.dtype)
        self.loc_mask = jnp.asarray(spec.loc_mask, dtype=self.dtype)
        self.send_idx = [
            jnp.asarray(a, dtype=jnp.int32) for a in spec.send_idx
        ]
        self.send_mask = [
            jnp.asarray(a, dtype=self.dtype) for a in spec.send_mask
        ]
        self.shift = [
            jnp.asarray(a, dtype=self.dtype) for a in spec.shift
        ]
        self.edge_idx = jnp.asarray(spec.edge_idx, dtype=jnp.int32)
        self.edge_mask = jnp.asarray(spec.edge_mask, dtype=self.dtype)
        self.edge_rev = jnp.asarray(spec.edge_rev, dtype=jnp.int32)
        masses = np.asarray(atomic_masses)[spec.z] * (spec.loc_mask > 0)
        masses = masses + (spec.loc_mask == 0)
        self.masses = jnp.asarray(masses, dtype=self.dtype)
        # global atom ids per local row (ride the migration payload so
        # gather_global stays exact after device-resident rebinning)
        ids = np.full((self.n_dev, spec.cap_loc), -1, dtype=np.int64)
        off = 0
        for d in range(self.n_dev):
            m = int(spec.n_loc[d])
            ids[d, :m] = spec.owner_perm[off:off + m]
            off += m
        self.ids = jnp.asarray(ids, dtype=jnp.int32)
        self.forces = jnp.zeros_like(self.pos)
        self._initialized = False

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
            for d in range(self.n_dev):
                m = int(spec.n_loc[d])
                vel[d, :m] = vel_global[spec.owner_perm[off:off + m]]
                off += m
            self.vel = jnp.asarray(vel, dtype=self.dtype)

    def gather_global(self):
        """(pos, vel) concatenated back to original atom order (by the
        carried global atom ids — valid after device-side migration)."""
        pos = np.asarray(self.pos)
        vel = np.asarray(self.vel)
        ids = np.asarray(self.ids)
        mask = np.asarray(self.loc_mask) > 0
        n = len(self.atoms)
        gp = np.zeros((n, 3))
        gv = np.zeros((n, 3))
        gp[ids[mask]] = pos[mask]
        gv[ids[mask]] = vel[mask]
        return gp, gv

    # -- per-shard energy/forces ---------------------------------------
    @property
    def conv_chunk_rows(self) -> int:
        """0 = whole-array convolution per shard; else the scan-chunk
        row count (multiple of the kernel aggregation block). Same
        threshold as the single-chip engine: above ~512k dense rows
        the gathered per-edge features would blow HBM per shard."""
        from ..ops.pallas_conv import agg_block_unit
        unit = agg_block_unit(self.spec.deg_cap)
        if self._conv_chunk_rows_arg is not None:
            rows = int(self._conv_chunk_rows_arg)
            if rows <= 0:
                return 0
        elif self.spec.rows > 524288:
            rows = 131072
        else:
            return 0
        return max(unit, rows // unit * unit)

    def _geom_packed_ok(self) -> bool:
        ok = getattr(self, '_geom_ok', None)
        if ok is None:
            from ..model.layers import geom_packed_ok
            ok = geom_packed_ok(self.model)
            self._geom_ok = ok
        return ok

    def _shard_energy(self, pos_loc, strain, z, loc_mask, send_idx,
                      send_mask, shifts, edge_idx, edge_mask, edge_rev):
        """Per-shard energy on the dense-grid fast path; `strain`
        (3, 3) deforms edge vectors so the psum'd dE/dstrain is the
        global virial (reference pair_e3gnn_parallel.cpp:479-503)."""
        spec = self.spec
        pos_refresh = _staged_refresh_fn(
            spec.cap_loc, self.mesh_shape, send_idx, send_mask,
            shifts=shifts,
        )
        feat_refresh = _staged_refresh_fn(
            spec.cap_loc, self.mesh_shape, send_idx, send_mask,
        )

        pos_all = pos_refresh(pos_loc)
        cap_all = spec.cap_all
        z_all = feat_refresh(
            z.astype(pos_loc.dtype)
        ).astype(jnp.int32)
        node_mask = jnp.concatenate([
            loc_mask,
            jnp.zeros(cap_all - spec.cap_loc, loc_mask.dtype),
        ])
        data = {
            KEY.ATOMIC_NUMBERS: z_all,
            KEY.EDGE_IDX: edge_idx,
            KEY.EDGE_REV: edge_rev,
            KEY.EDGE_DENSE_D: spec.deg_cap,
            KEY.BATCH: jnp.zeros(cap_all, dtype=jnp.int32),
            KEY.NUM_ATOMS: jnp.array([cap_all], dtype=jnp.int32),
            KEY.NODE_MASK: node_mask,
            KEY.CELL_VOLUME: jnp.array([self.volume], pos_loc.dtype),
        }
        chunk_rows = self.conv_chunk_rows
        if chunk_rows:
            # packed large-shard path (engine._energy_fn analog): edge
            # geometry flows as 1-D columns -- an (E, 3) array
            # lane-pads 3 -> 128 on TPU; per-chunk remat keeps resident
            # per-edge memory at O(chunk) (layers.py EDGE_FEAT_PACKED /
            # EDGE_GEOM_PACKED)
            from ..ops.pallas_conv import agg_block_unit
            from ..ops.scatter import gather_col
            unit = agg_block_unit(spec.deg_cap)
            d_c = []
            for c in range(3):
                pi_c, pj_c = gather_col(
                    pos_all[:, c], edge_idx[1], edge_rev, edge_idx[0],
                    dense_d=spec.deg_cap,
                )
                d_c.append(pj_c - pi_c)
            r2 = (d_c[0] * d_c[0] + d_c[1] * d_c[1]
                  + d_c[2] * d_c[2])
            mask = (edge_mask > 0) & (r2 < self.cutoff ** 2)
            defaults = (1.0, 0.0, 0.0)
            s_c = [jnp.where(mask, v, d)
                   for v, d in zip(d_c, defaults)]
            s_c = [
                s_c[a] + sum(s_c[b] * strain[b, a] for b in range(3))
                for a in range(3)
            ]
            data |= {
                KEY.EDGE_VEC_COLS: tuple(s_c),
                KEY.EDGE_MASK: mask.astype(pos_loc.dtype),
                KEY.CONV_CHUNK_ROWS: chunk_rows,
                KEY.EDGE_PACK_G: min(64, unit & (-unit)),
            }
            if self._geom_packed_ok():
                data[KEY.EDGE_GEOM_PACKED] = True
        else:
            # scatter-free pairwise gather: the VJP aggregates
            # per-center over the dense grid and rides the reverse-edge
            # permutation (ops/scatter.py) — no scatter-add in the
            # force program
            pi, pj = gather_pair(
                pos_all, edge_idx, edge_rev, dense_d=spec.deg_cap
            )
            vec = pj - pi
            r2 = jnp.sum(vec * vec, axis=-1)
            mask = (edge_mask > 0) & (r2 < self.cutoff ** 2)
            safe = jnp.where(
                mask[:, None], vec,
                jnp.array([1.0, 0.0, 0.0], vec.dtype)
            )
            safe = safe + safe @ strain
            data |= {
                KEY.EDGE_VEC: safe,
                KEY.EDGE_MASK: mask.astype(safe.dtype),
            }
        out = self.model.apply_energy(
            self.params, data, halo_refresh=feat_refresh
        )
        return jnp.sum(out[KEY.PRED_TOTAL_ENERGY])

    def _psum_all(self, v):
        for k in range(len(self.mesh_shape)):
            v = jax.lax.psum(v, AXIS_NAMES[k])
        return v

    def _shard_efs(self, pos_loc, z, loc_mask, send_idx, send_mask,
                   shifts, edge_idx, edge_mask, edge_rev):
        """(E_total, local forces, global stress Voigt); conventions
        as parallel/md.py round 2 (-virial/V, xx yy zz xy yz zx)."""
        eps0 = jnp.zeros((3, 3), pos_loc.dtype)
        e, (g_pos, g_eps) = jax.value_and_grad(
            self._shard_energy, argnums=(0, 1)
        )(
            pos_loc, eps0, z, loc_mask, send_idx, send_mask, shifts,
            edge_idx, edge_mask, edge_rev,
        )
        e_tot = self._psum_all(e)
        v = self._psum_all(g_eps)
        stress = -jnp.stack([
            v[0, 0], v[1, 1], v[2, 2], v[0, 1], v[1, 2], v[2, 0]
        ]) / self.volume
        return e_tot, -g_pos, stress

    def _shard_ef(self, *args):
        e, f, _ = self._shard_efs(*args)
        return e, f

    # -- shard_map plumbing --------------------------------------------
    def _mesh_spec(self):
        K = len(self.mesh_shape)
        return P(*AXIS_NAMES[:K])

    def _shard_args(self):
        """Flat per-device arrays reshaped to the mesh multi-index."""
        r = lambda a: a.reshape(self.mesh_shape + a.shape[1:])
        args = [r(self.pos), r(self.Z), r(self.loc_mask)]
        for k in range(len(self.mesh_shape)):
            args += [r(self.send_idx[k]), r(self.send_mask[k]),
                     r(self.shift[k])]
        args += [r(self.edge_idx), r(self.edge_mask), r(self.edge_rev)]
        return args

    def _unpack_shard_args(self, flat):
        """Device-local views (mesh dims squeezed) -> argument groups."""
        K = len(self.mesh_shape)
        sq = lambda a: a.reshape(a.shape[K:])
        pos, z, loc_mask = map(sq, flat[:3])
        send_idx, send_mask, shifts = [], [], []
        i = 3
        for _ in range(K):
            send_idx.append(sq(flat[i]))
            send_mask.append(sq(flat[i + 1]))
            shifts.append(sq(flat[i + 2]))
            i += 3
        edge_idx, edge_mask, edge_rev = map(sq, flat[i:i + 3])
        return (pos, z, loc_mask, send_idx, send_mask, shifts,
                edge_idx, edge_mask, edge_rev)

    # -- single-shot oracle --------------------------------------------
    def energy_forces(self, return_stress: bool = False):
        if getattr(self, '_dev_dirty', False):
            # device-resident chunks ran: the host spec index maps are
            # stale — resync once (the only host round-trip besides
            # the final gather)
            self._rebuild()
        K = len(self.mesh_shape)

        def shard_fn(*flat):
            (pos, z, loc_mask, send_idx, send_mask, shifts,
             edge_idx, edge_mask, edge_rev) = self._unpack_shard_args(flat)
            e, f, s = self._shard_efs(
                pos, z, loc_mask, send_idx, send_mask, shifts,
                edge_idx, edge_mask, edge_rev,
            )
            lead = (1,) * K
            return (e.reshape(lead), f.reshape(lead + f.shape),
                    s.reshape(lead + s.shape))

        spec = self._mesh_spec()
        n_in = 3 + 3 * K + 3
        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=tuple([spec] * n_in),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )
        e, f, s = jax.jit(fn)(*self._shard_args())
        e_tot = float(np.asarray(e).ravel()[0])
        f = np.asarray(f).reshape((self.n_dev,) + f.shape[K:])
        sp = self.spec
        n = len(self.atoms)
        fg = np.zeros((n, 3))
        off = 0
        for d in range(self.n_dev):
            m = int(sp.n_loc[d])
            fg[sp.owner_perm[off:off + m]] = f[d, :m]
            off += m
        if return_stress:
            return e_tot, fg, np.asarray(s).reshape(-1, 6)[0]
        return e_tot, fg

    # -- run loop ------------------------------------------------------
    def _compiled_chunk(self, length: int):
        K = len(self.mesh_shape)

        def shard_chunk(pos, vel, key, xi, masses, *flat):
            sq = lambda a: a.reshape(a.shape[K:])
            vel, masses = sq(vel), sq(masses)
            key = key.reshape(key.shape[K:])
            xi = xi.reshape(())
            (pos, z, loc_mask, send_idx, send_mask, shifts,
             edge_idx, edge_mask, edge_rev) = self._unpack_shard_args(
                (pos,) + flat)

            def ef(p, nl_unused):
                return self._shard_ef(
                    p, z, loc_mask, send_idx, send_mask, shifts,
                    edge_idx, edge_mask, edge_rev,
                )

            if self.ensemble == 'nve':
                step = integrate.make_nve_step(ef, masses, self.dt)
            else:
                # GLOBAL Nose-Hoover: psum'd KE over all mesh axes,
                # real-atom DOF — one thermostat, not n_dev of them
                step = integrate.make_nose_hoover_step(
                    ef, masses, self.dt, self.temperature_K,
                    self.tdamp, n_dof=self.n_dof,
                    ke_reduce=self._psum_all,
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
            ke = self._psum_all(
                0.5 * jnp.sum(masses[:, None] * state.vel ** 2)
            )
            from ..md.units import kB
            temp = 2.0 * ke / (self.n_dof * kB)
            _, _, stress = self._shard_efs(
                state.pos, z, loc_mask, send_idx, send_mask, shifts,
                edge_idx, edge_mask, edge_rev,
            )
            lead = (1,) * K
            r = lambda a: a.reshape(lead + a.shape)
            return (r(state.pos), r(state.vel), r(state.key),
                    r(state.xi), r(state.energy), r(temp), r(stress))

        spec = self._mesh_spec()
        # pos,vel,key,xi,masses + the remaining shard args
        # (z, loc_mask, K phase triples, edge_idx, edge_mask, edge_rev)
        n_in = 10 + 3 * K
        fn = shard_map(
            shard_chunk, mesh=self.mesh,
            in_specs=tuple([spec] * n_in),
            out_specs=tuple([spec] * 7),
            check_vma=False,
        )
        return jax.jit(fn)

    def _compiled_chunk_dev(self, length: int):
        """Device-resident chunk: [migrate + rebuild halos/grid on
        device] -> scan(step x length). No host round-trip per chunk
        (parallel/devrebuild.py; VERDICT r2 #3)."""
        from .devrebuild import make_device_rebuild, make_geom

        K = len(self.mesh_shape)
        cell_np = np.asarray(self.spec.cell)
        geom = make_geom(self.spec, cell_np, self.build_cutoff)
        rebuild = make_device_rebuild(
            geom, cell_np, self.build_cutoff, AXIS_NAMES
        )
        am = jnp.asarray(np.asarray(atomic_masses), jnp.float32)

        def shard_chunk(pos, vel, forces, z, ids, loc_mask, key, xi):
            sq = lambda a: a.reshape(a.shape[K:])
            pos, vel, forces = sq(pos), sq(vel), sq(forces)
            z, ids, loc_mask = sq(z), sq(ids), sq(loc_mask)
            key = key.reshape(key.shape[K:])
            xi = xi.reshape(())

            vs = rebuild(pos, vel, forces, z, ids, loc_mask)
            masses = am[vs.z] * vs.loc_mask + (1.0 - vs.loc_mask)

            def ef(p, nl_unused):
                return self._shard_ef(
                    p, vs.z, vs.loc_mask, list(vs.send_idx),
                    list(vs.send_mask), list(vs.shift),
                    vs.edge_idx, vs.edge_mask, vs.edge_rev,
                )

            if self.ensemble == 'nve':
                step = integrate.make_nve_step(ef, masses, self.dt)
            else:
                step = integrate.make_nose_hoover_step(
                    ef, masses, self.dt, self.temperature_K,
                    self.tdamp, n_dof=self.n_dof,
                    ke_reduce=self._psum_all,
                )

            # no per-chunk prime: forces rode the migration payload and
            # are exact at these positions (run() primes once at t=0)
            state = MDState(pos=vs.pos, vel=vs.vel, forces=vs.forces,
                            energy=jnp.zeros((), pos.dtype),
                            key=key, xi=xi)

            def body(s, _):
                s2 = step(s, None)
                return s2._replace(
                    forces=s2.forces * vs.loc_mask[:, None],
                    vel=s2.vel * vs.loc_mask[:, None],
                ), None

            state, _ = jax.lax.scan(body, state, None, length=length)
            ke = self._psum_all(
                0.5 * jnp.sum(masses[:, None] * state.vel ** 2)
            )
            from ..md.units import kB
            temp = 2.0 * ke / (self.n_dof * kB)
            _, _, stress = self._shard_efs(
                state.pos, vs.z, vs.loc_mask, list(vs.send_idx),
                list(vs.send_mask), list(vs.shift),
                vs.edge_idx, vs.edge_mask, vs.edge_rev,
            )
            lead = (1,) * K
            r = lambda a: a.reshape(lead + a.shape)
            return (r(state.pos), r(state.vel), r(state.forces),
                    r(vs.z), r(vs.ids), r(vs.loc_mask),
                    r(state.key), r(state.xi), r(state.energy),
                    r(temp), r(stress),
                    r(vs.overflow.astype(jnp.int32)))

        spec = self._mesh_spec()
        fn = shard_map(
            shard_chunk, mesh=self.mesh,
            in_specs=tuple([spec] * 8),
            out_specs=tuple([spec] * 12),
            check_vma=False,
        )
        return jax.jit(fn)

    def _prime_once(self):
        """Seed per-device forces at t=0 with one shard_map force call
        over the freshly host-decomposed spec arrays."""
        if self._initialized:
            return
        K = len(self.mesh_shape)

        def shard_fn(*flat):
            (pos, z, loc_mask, send_idx, send_mask, shifts,
             edge_idx, edge_mask, edge_rev) = self._unpack_shard_args(
                flat)
            e, f = self._shard_ef(
                pos, z, loc_mask, send_idx, send_mask, shifts,
                edge_idx, edge_mask, edge_rev,
            )
            return f.reshape((1,) * K + f.shape)

        spec = self._mesh_spec()
        n_in = 3 + 3 * K + 3
        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=tuple([spec] * n_in), out_specs=spec,
            check_vma=False,
        )
        f = jax.jit(fn)(*self._shard_args())
        self.forces = jnp.asarray(f).reshape(
            (self.n_dev,) + f.shape[K:]
        ) * self.loc_mask[..., None]
        self._initialized = True

    def _chunk_for(self, length: int):
        key = (length, self.spec.cap_loc, tuple(self.spec.cap_g),
               self.spec.deg_cap, self.spec.rows, self.device_rebuild)
        chunks = getattr(self, '_chunks', None)
        if chunks is None:
            chunks = self._chunks = {}
        if key not in chunks:
            chunks[key] = (
                self._compiled_chunk_dev(length) if self.device_rebuild
                else self._compiled_chunk(length)
            )
        return chunks[key]

    def comm_stats(self) -> Dict:
        """Machine-readable halo-exchange accounting (the analog of the
        reference's SEVENN_PRINT_INFO comm dumps,
        pair_e3gnn_parallel.cpp:87-93,441-455,807-815): per-device
        occupancy, actual send counts per phase/direction, and the
        per-layer halo payload each refresh phase moves.

        Volumes are per DEVICE per force call unless noted. A force
        call runs 1 + n_layers feature refreshes forward (positions +
        per-conv ghost features) and autodiff replays the n_layers
        feature exchanges in reverse for the gradient accumulation, so
        bytes_force_call covers (1 + 2*n_layers) refreshes.
        """
        from ..model import layers as L
        spec = self.spec
        widths = [int(layer.tp.irreps_in1.dim)
                  for _, layer in self.model.layers
                  if isinstance(layer, L.IrrepsConvolution)]
        sends = [np.asarray(m).sum(axis=2).astype(int).tolist()
                 for m in self.send_mask]
        itemsize = 4 if self.dtype == jnp.float32 else 8
        # capacity-padded payload per phase (what actually rides the
        # wire: ppermute moves the full (2, cap_g, width) buffer)
        per_phase_pos = [2 * cg * 3 * itemsize for cg in spec.cap_g]
        per_phase_feat = [
            [2 * cg * w * itemsize for w in widths] for cg in spec.cap_g
        ]
        bytes_pos = sum(per_phase_pos)
        bytes_feat_fwd = sum(sum(p) for p in per_phase_feat)
        return dict(
            mesh=list(self.mesh_shape),
            n_devices=self.n_dev,
            cap_loc=int(spec.cap_loc),
            cap_g=[int(c) for c in spec.cap_g],
            deg_cap=int(spec.deg_cap),
            rows=int(spec.rows),
            n_loc=list(map(int, np.asarray(spec.n_loc).ravel())),
            sends_per_phase=sends,
            layer_widths=widths,
            bytes_per_phase_feat=per_phase_feat,
            bytes_pos_refresh=bytes_pos,
            bytes_feat_refresh_fwd=bytes_feat_fwd,
            bytes_force_call=bytes_pos + 2 * bytes_feat_fwd,
        )

    def _print_comm_stats(self):
        s = self.comm_stats()
        print(f'[comm] mesh={tuple(s["mesh"])} cap_loc={s["cap_loc"]} '
              f'cap_g={s["cap_g"]} deg_cap={s["deg_cap"]} '
              f'rows={s["rows"]}')
        print(f'[comm] n_loc={s["n_loc"]} '
              f'sends(lo,hi) per phase={s["sends_per_phase"]}')
        for k, payload in enumerate(s['bytes_per_phase_feat']):
            print(f'[comm] phase {k} halo payload/refresh per device: '
                  f'{[f"{p / 1e6:.2f}MB" for p in payload]} '
                  f'(layer widths {s["layer_widths"]}; '
                  f'{1 + len(s["layer_widths"])} fwd refreshes per '
                  f'force call incl. positions, feature refreshes '
                  f'replayed once more in the backward)')
        print(f'[comm] per device per force call: '
              f'{s["bytes_force_call"] / 1e6:.2f}MB '
              f'(pos {s["bytes_pos_refresh"] / 1e6:.2f} + fwd+bwd '
              f'features 2x{s["bytes_feat_refresh_fwd"] / 1e6:.2f})')

    def run(self, n_steps: int) -> Dict[str, np.ndarray]:
        """Advance exactly n_steps; returns per-chunk energy /
        temperature / stress (Voigt, eV/A^3). Set
        SEVENNET_PRINT_COMM=1 for per-rebuild comm diagnostics."""
        import os
        if os.environ.get('SEVENNET_PRINT_COMM'):
            self._print_comm_stats()
        K = len(self.mesh_shape)
        if not hasattr(self, '_keys'):
            base = jax.random.PRNGKey(self.seed + 1)
            self._keys = jax.random.split(base, self.n_dev)
            self._xi = jnp.zeros((self.n_dev,), self.dtype)
        if self.device_rebuild:
            return self._run_dev(n_steps)
        energies, temps, stresses = [], [], []
        done = 0
        r = lambda a: a.reshape(self.mesh_shape + a.shape[1:])
        while done < n_steps:
            length = min(self.rebuild_every, n_steps - done)
            chunk = self._chunk_for(length)
            args = self._shard_args()
            pos, vel, keys, xi, e, temp, stress = chunk(
                args[0], r(self.vel), r(self._keys), r(self._xi),
                r(self.masses), *args[1:],
            )
            flat = lambda a: jnp.asarray(a).reshape(
                (self.n_dev,) + a.shape[K:]
            )
            self.pos, self.vel = flat(pos), flat(vel)
            self._keys = flat(keys)
            self._xi = jnp.asarray(xi).reshape(self.n_dev)
            energies.append(float(np.asarray(e).ravel()[0]))
            temps.append(float(np.asarray(temp).ravel()[0]))
            stresses.append(np.asarray(stress).reshape(-1, 6)[0])
            done += length
            self.time_steps += length
            if done < n_steps:
                self._rebuild()
        return {
            'energy': np.array(energies),
            'temperature': np.array(temps),
            'stress': np.array(stresses),
        }

    def _run_dev(self, n_steps: int) -> Dict[str, np.ndarray]:
        """Device-resident run loop: between chunks NOTHING crosses the
        host boundary except the per-chunk scalar metrics — migration,
        halo selection, and neighbor-grid rebuild all execute on
        device (devrebuild.py). A capacity overflow (device-flagged,
        psum'd) falls back to one host re-decompose with fresh margins
        and retries the chunk."""
        K = len(self.mesh_shape)
        self._prime_once()
        r = lambda a: a.reshape(self.mesh_shape + a.shape[1:])
        energies, temps, stresses = [], [], []
        done = 0
        retries = 0
        while done < n_steps:
            length = min(self.rebuild_every, n_steps - done)
            chunk = self._chunk_for(length)
            (pos, vel, forces, z, ids, loc_mask, keys, xi, e, temp,
             stress, ovf) = chunk(
                r(self.pos), r(self.vel), r(self.forces), r(self.Z),
                r(self.ids), r(self.loc_mask), r(self._keys),
                r(self._xi),
            )
            if int(np.asarray(ovf).ravel()[0]):
                retries += 1
                if retries > 8:
                    raise RuntimeError(
                        'device rebuild: capacity overflow persists '
                        'after repeated host re-decompositions'
                    )
                self._rebuild(fresh=True)
                self._prime_once()
                continue
            retries = 0
            flat = lambda a: jnp.asarray(a).reshape(
                (self.n_dev,) + a.shape[K:]
            )
            self.pos, self.vel = flat(pos), flat(vel)
            self.forces = flat(forces)
            self.Z, self.ids = flat(z), flat(ids)
            self.loc_mask = flat(loc_mask)
            self._keys = flat(keys)
            self._xi = jnp.asarray(xi).reshape(self.n_dev)
            self._dev_dirty = True
            energies.append(float(np.asarray(e).ravel()[0]))
            temps.append(float(np.asarray(temp).ravel()[0]))
            stresses.append(np.asarray(stress).reshape(-1, 6)[0])
            done += length
            self.time_steps += length
        return {
            'energy': np.array(energies),
            'temperature': np.array(temps),
            'stress': np.array(stresses),
        }

    def _rebuild(self, fresh: bool = False):
        """Host-side rebin + fresh index maps (atom migration); caps
        kept while they fit (decompose_brick regrows otherwise).
        fresh=True re-derives every capacity from the current
        configuration with margins (the device-overflow fallback)."""
        gp, gv = self.gather_global()
        at = Atoms(
            atomic_numbers=self.atoms.atomic_numbers, pos=gp,
            cell=self.atoms.cell, pbc=self.atoms.pbc,
        )
        self.atoms = at
        self.spec = decompose_brick(
            at, self.mesh_shape, self.build_cutoff, axes=self.axes,
            prev=None if fresh else self.spec,
            cap_margin=max(self.cap_margin, 1.25) if fresh
            else self.cap_margin,
        )
        self._push_state(vel_global=gv)
        self._dev_dirty = False
