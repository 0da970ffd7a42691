"""Integrators (NVE velocity-Verlet, NVT Langevin BAOAB, NVT Nose-Hoover)
as pure jit/scan-ready step functions.

Replaces the LAMMPS Verlet::run -> pair->compute per-step round trip
(SURVEY.md 3.4/3.5): the whole trajectory chunk is one XLA program; the
model forward+grad, neighbor reuse, and the integrator all fuse.
Units: eV / Angstrom / amu; dt in internal units (see md/units.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .units import kB


class MDState(NamedTuple):
    pos: jnp.ndarray        # (N, 3)
    vel: jnp.ndarray        # (N, 3) internal units
    forces: jnp.ndarray     # (N, 3) eV/A
    energy: jnp.ndarray     # () eV
    key: jnp.ndarray        # PRNG key
    xi: jnp.ndarray         # () thermostat friction (nose-hoover)
    cell: jnp.ndarray = None  # (3, 3) evolving cell (NPT only; None =
    #                           the engine's static cell)


def kinetic_energy(state: MDState, masses) -> jnp.ndarray:
    return 0.5 * jnp.sum(masses[:, None] * state.vel ** 2)


def temperature(state: MDState, masses) -> jnp.ndarray:
    n_dof = 3 * state.pos.shape[0]
    return 2.0 * kinetic_energy(state, masses) / (n_dof * kB)


def maxwell_boltzmann(key, masses, temp_K, dtype=jnp.float32):
    n = masses.shape[0]
    v = jax.random.normal(key, (n, 3), dtype=dtype)
    v = v * jnp.sqrt(kB * temp_K / masses)[:, None].astype(dtype)
    v = v - jnp.mean(v * masses[:, None], axis=0) / jnp.mean(masses)
    return v


def make_nve_step(ef_fn: Callable, masses, dt: float):
    """ef_fn(pos, nl) -> (energy, forces)."""
    inv_m = (1.0 / masses)[:, None]

    def step(state: MDState, nl) -> MDState:
        v_half = state.vel + 0.5 * dt * state.forces * inv_m
        pos = state.pos + dt * v_half
        energy, forces = ef_fn(pos, nl)
        vel = v_half + 0.5 * dt * forces * inv_m
        return state._replace(pos=pos, vel=vel, forces=forces, energy=energy)

    return step


def make_langevin_step(ef_fn: Callable, masses, dt: float, temp_K: float,
                       friction: float):
    """BAOAB Langevin; friction in 1/internal-time."""
    inv_m = (1.0 / masses)[:, None]
    c1 = jnp.exp(-friction * dt)
    # per-atom noise amplitude
    def step(state: MDState, nl) -> MDState:
        key, sub = jax.random.split(state.key)
        v = state.vel + 0.5 * dt * state.forces * inv_m          # B
        pos = state.pos + 0.5 * dt * v                           # A
        sigma = jnp.sqrt(kB * temp_K * (1 - c1 ** 2) / masses)[:, None]
        noise = jax.random.normal(sub, v.shape, dtype=v.dtype)
        v = c1 * v + sigma.astype(v.dtype) * noise               # O
        pos = pos + 0.5 * dt * v                                 # A
        energy, forces = ef_fn(pos, nl)
        v = v + 0.5 * dt * forces * inv_m                        # B
        return state._replace(pos=pos, vel=v, forces=forces,
                              energy=energy, key=key)

    return step


def make_nose_hoover_step(ef_fn: Callable, masses, dt: float, temp_K: float,
                          tdamp: float, n_dof: int = None,
                          ke_reduce: Callable = None):
    """Single Nose-Hoover thermostat (LAMMPS `fix nvt`-style, chain of 1).

    For domain-decomposed MD pass the GLOBAL degree-of-freedom count
    (3 x real atoms, not padded rows) as `n_dof` and a cross-device
    reduction (lax.psum over the mesh axis) as `ke_reduce`: every shard
    then integrates the same global kinetic energy, so xi stays
    identical everywhere -- one global thermostat, matching LAMMPS
    `fix nvt` semantics (zero-mass padded rows must carry zero
    velocity; see parallel/md.py).
    """
    inv_m = (1.0 / masses)[:, None]
    if n_dof is None:
        n_dof = 3 * masses.shape[0]
    Q = n_dof * kB * temp_K * tdamp ** 2

    def thermo_half(vel, xi):
        ke2 = jnp.sum(masses[:, None] * vel ** 2)
        if ke_reduce is not None:
            ke2 = ke_reduce(ke2)
        xi_dot = (ke2 - n_dof * kB * temp_K) / Q
        xi = xi + 0.5 * dt * xi_dot
        vel = vel * jnp.exp(-0.5 * dt * xi)
        return vel, xi

    def step(state: MDState, nl) -> MDState:
        vel, xi = thermo_half(state.vel, state.xi)
        v_half = vel + 0.5 * dt * state.forces * inv_m
        pos = state.pos + dt * v_half
        energy, forces = ef_fn(pos, nl)
        vel = v_half + 0.5 * dt * forces * inv_m
        vel, xi = thermo_half(vel, xi)
        return state._replace(pos=pos, vel=vel, forces=forces,
                              energy=energy, xi=xi)

    return step


def make_npt_berendsen_step(efs_fn: Callable, masses, dt: float,
                            temp_K: float, tdamp: float,
                            press_target: float, pdamp: float,
                            compressibility: float = 4.57e-5):
    """Isotropic NPT: Nose-Hoover thermostat + Berendsen barostat
    (LAMMPS ``fix nvt`` + ``fix press/berendsen`` recipe; the reference
    gets NPT from LAMMPS fixes over the pair-style virial,
    pair_e3gnn.cpp + in.lammps examples).

    efs_fn(pos, nl, cell) -> (energy, forces, stress_voigt) with stress
    in the model convention (-virial/V, eV/A^3; model.py:124-138).
    press_target in eV/A^3; compressibility (dimensionless here, scaled
    into mu) -- only the ratio dt * compressibility / pdamp sets the
    relaxation rate. Internal pressure: P = 2*KE/(3V) + trace(stress)/3
    (the model stress convention already carries -virial/V, so its
    trace/3 IS the potential pressure); direction validated by the
    compression unit test.
    """
    inv_m = (1.0 / masses)[:, None]
    n_dof = 3 * masses.shape[0]
    Q = n_dof * kB * temp_K * tdamp ** 2

    def thermo_half(vel, xi):
        ke2 = jnp.sum(masses[:, None] * vel ** 2)
        xi_dot = (ke2 - n_dof * kB * temp_K) / Q
        xi = xi + 0.5 * dt * xi_dot
        vel = vel * jnp.exp(-0.5 * dt * xi)
        return vel, xi

    def step(state: MDState, nl) -> MDState:
        vel, xi = thermo_half(state.vel, state.xi)
        v_half = vel + 0.5 * dt * state.forces * inv_m
        pos = state.pos + dt * v_half
        energy, forces, stress = efs_fn(pos, nl, state.cell)
        vel = v_half + 0.5 * dt * forces * inv_m
        vel, xi = thermo_half(vel, xi)
        # instantaneous pressure: kinetic + virial. stress (model
        # convention) = -(sum_e r x dE/dr)/V, so its trace/3 is already
        # the potential (virial) pressure contribution
        vol = jnp.abs(jnp.linalg.det(state.cell))
        ke2 = jnp.sum(masses[:, None] * vel ** 2)
        p_int = ke2 / (3.0 * vol) + (
            stress[0] + stress[1] + stress[2]
        ) / 3.0
        mu = (1.0 - dt / pdamp * compressibility
              * (press_target - p_int)) ** (1.0 / 3.0)
        return state._replace(
            pos=pos * mu, vel=vel, forces=forces, energy=energy, xi=xi,
            cell=state.cell * mu,
        )

    return step


def voigt_to_tensor(s):
    """(6,) Voigt xx yy zz xy yz zx (model convention,
    model/layers.py stress head) -> symmetric (3, 3)."""
    return jnp.array([
        [s[0], s[3], s[5]],
        [s[3], s[1], s[4]],
        [s[5], s[4], s[2]],
    ])


def make_npt_berendsen_aniso_step(efs_fn: Callable, masses, dt: float,
                                  temp_K: float, tdamp: float,
                                  press_target, pdamp: float,
                                  compressibility: float = 4.57e-5):
    """Anisotropic (full-cell / triclinic) NPT: Nose-Hoover thermostat
    + tensor Berendsen barostat (LAMMPS ``fix press/berendsen`` with
    ``couple none`` + tilt semantics -- the reference relies on LAMMPS
    ``fix npt`` over the pair-style virial for full-cell MD,
    pair_e3gnn.cpp virial tally :479-503; the isotropic variant above
    cannot relax shear or per-axis stress).

    Each step applies the symmetric strain

        mu = I - dt * compressibility / (3 * pdamp) * (P_t - P_int)

    to cell rows and positions (rows @ mu); the linearization of the
    isotropic formula above, so on an isotropically-stressed cubic cell
    the two ensembles agree to O(dP^2). press_target: scalar
    (hydrostatic) or (3, 3) tensor in eV/A^3. P_int = kinetic
    sum(m v x v)/V + the model stress tensor (model convention already
    carries -virial/V, so it IS the potential pressure contribution).
    """
    inv_m = (1.0 / masses)[:, None]
    n_dof = 3 * masses.shape[0]
    Q = n_dof * kB * temp_K * tdamp ** 2
    p_t = jnp.asarray(press_target)
    if p_t.ndim == 0:
        p_t = p_t * jnp.eye(3)

    def thermo_half(vel, xi):
        ke2 = jnp.sum(masses[:, None] * vel ** 2)
        xi_dot = (ke2 - n_dof * kB * temp_K) / Q
        xi = xi + 0.5 * dt * xi_dot
        vel = vel * jnp.exp(-0.5 * dt * xi)
        return vel, xi

    def step(state: MDState, nl) -> MDState:
        vel, xi = thermo_half(state.vel, state.xi)
        v_half = vel + 0.5 * dt * state.forces * inv_m
        pos = state.pos + dt * v_half
        energy, forces, stress = efs_fn(pos, nl, state.cell)
        vel = v_half + 0.5 * dt * forces * inv_m
        vel, xi = thermo_half(vel, xi)
        vol = jnp.abs(jnp.linalg.det(state.cell))
        p_kin = jnp.einsum('ni,n,nj->ij', vel, masses, vel) / vol
        p_int = p_kin + voigt_to_tensor(stress)
        mu = jnp.eye(3, dtype=pos.dtype) - (
            dt * compressibility / (3.0 * pdamp)
        ) * (p_t - p_int).astype(pos.dtype)
        mu = 0.5 * (mu + mu.T)  # keep the strain exactly symmetric
        return state._replace(
            pos=pos @ mu, vel=vel, forces=forces, energy=energy, xi=xi,
            cell=state.cell @ mu,
        )

    return step
