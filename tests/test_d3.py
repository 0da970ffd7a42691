"""Grimme D3 dispersion tests.

Validation strategy (no independent D3 package in the image): the
parameter tables are asserted against published Grimme constants, the
autodiff forces/stress against finite differences, and the lattice-sum
against exact supercell extensivity — together these pin the same
contract the reference's CUDA pair style implements (pair_d3.cu).
"""

import numpy as np
import pytest

from sevennet_exp_tpu.calculator import D3Calculator
from sevennet_exp_tpu.ops.d3 import (
    D3Dispersion,
    build_tables,
    get_damping_params,
    interpolate_c6,
    lattice_shifts,
)

import jax.numpy as jnp


def test_published_constants():
    # free-atom C6 values from Grimme's reference tables (JCP 132, 154104)
    raw_hh = build_tables([1])
    c6_hh = np.asarray(raw_hh.c6ref)[0, 0]
    assert np.nanmax(c6_hh) == pytest.approx(7.5916, abs=1e-4)
    t = build_tables([1, 6])
    assert float(t.r0ab[0, 0]) == pytest.approx(2.1823, abs=1e-4)  # H-H bohr
    assert float(t.r0ab[1, 1]) == pytest.approx(2.9103, abs=1e-4)  # C-C
    assert np.nanmax(np.asarray(t.c6ref)[1, 1]) == pytest.approx(
        49.1130, abs=1e-3)
    # functional parameters as carried by the reference setfuncpar
    p = get_damping_params('damp_zero', 'pbe')
    assert (p.rs6, p.s8) == (1.217, 0.722)
    p = get_damping_params('damp_bj', 'pbe')
    assert (p.rs6, p.s8, p.rs8) == (0.4289, 0.7875, 4.4407)
    with pytest.raises(ValueError):
        get_damping_params('damp_bj', 'not-a-functional')


def test_c6_interpolation_hits_reference_points():
    """At a CN far below every reference point, the lowest-CN reference
    dominates the Gaussian weights -> C6 ~ free-atom value."""
    t = build_tables([6])
    c6 = interpolate_c6(jnp.asarray([0.0]), jnp.asarray([0]), t)
    assert float(c6[0, 0]) == pytest.approx(49.1130, rel=5e-3)
    # high CN -> smallest C6 reference (saturated carbon)
    c6h = interpolate_c6(jnp.asarray([8.0]), jnp.asarray([0]), t)
    assert float(c6h[0, 0]) == pytest.approx(18.2067, rel=5e-3)


@pytest.mark.parametrize('damping,functional', [
    ('damp_zero', 'pbe'),
    ('damp_bj', 'pbe'),
    ('damp_zerom', 'pbe'),
    ('damp_bjm', 'pbe'),
])
def test_forces_match_finite_difference(damping, functional):
    d3 = D3Dispersion(damping, functional)
    z = [6, 8, 1, 1]
    rng = np.random.RandomState(0)
    pos = np.array([[0.0, 0, 0], [1.3, 0, 0], [-0.6, 0.9, 0],
                    [-0.6, -0.9, 0]]) + 0.05 * rng.randn(4, 3)
    out = d3.compute(z, pos)
    # eps large enough that the fd energy difference (~f * 2eps) sits
    # well above f32 evaluation noise: the fd reference itself was
    # observed to move by ~6e-4 eV/A between XLA CPU configs at
    # eps=1e-3 (fusion-order rounding), while the analytic force is
    # stable to 1e-6 -- a wrong force formula errs by >>5e-3 rel
    eps = 5e-3
    for (i, k) in [(0, 0), (1, 1), (3, 2)]:
        p1, p2 = pos.copy(), pos.copy()
        p1[i, k] += eps
        p2[i, k] -= eps
        fd = -(d3.compute(z, p1)['energy']
               - d3.compute(z, p2)['energy']) / (2 * eps)
        assert out['forces'][i, k] == pytest.approx(fd, rel=5e-3, abs=2e-4)


def test_energy_attractive_and_damped():
    d3 = D3Dispersion('damp_bj', 'pbe')
    e3 = d3.compute([6, 6], [[0, 0, 0], [3.0, 0, 0]])['energy']
    e6 = d3.compute([6, 6], [[0, 0, 0], [6.0, 0, 0]])['energy']
    assert e3 < e6 < 0.0  # attractive, decaying
    # asymptotically ~ -s6 C6 / r^6 (free-atom C6, no damping)
    r = 15.0  # angstrom
    e = d3.compute([1, 1], [[0, 0, 0], [r, 0, 0]])['energy']
    au, ev = 0.52917726, 27.21138505
    # C6 at CN=0 from the Gaussian interpolation itself (the CN=0.9118
    # references still carry ~3% weight at cn=0 — same in real dftd3)
    t = build_tables([1])
    c6_hh = float(interpolate_c6(jnp.asarray([0.0]), jnp.asarray([0]), t)[0, 0])
    r42 = 2.00734898 ** 2
    r_b = r / au
    expect = -(c6_hh / r_b**6 + 0.7875 * 3 * c6_hh * r42 / r_b**8) * ev
    assert e == pytest.approx(expect, rel=1e-2)


def test_periodic_extensivity_and_stress():
    d3 = D3Dispersion('damp_bj', 'pbe')
    cell = np.diag([4.1, 4.3, 4.2])
    z = [14, 8]
    pos = np.array([[0.05, 0, 0], [2.0, 2.1, 2.1]])
    r1 = d3.compute(z, pos, cell, [True] * 3)
    cell2 = np.diag([8.2, 4.3, 4.2])
    pos2 = np.concatenate([pos, pos + [4.1, 0, 0]])
    r2 = d3.compute(z * 2, pos2, cell2, [True] * 3)
    assert r2['energy'] == pytest.approx(2 * r1['energy'], rel=1e-5)
    np.testing.assert_allclose(
        r2['stress'], r1['stress'], rtol=1e-4, atol=1e-8)
    # stress vs finite difference of strain
    eps = 1e-4
    for k in range(3):
        s1 = np.eye(3)
        s1[k, k] += eps
        e_p = d3.compute(z, pos @ s1, cell @ s1, [True] * 3)['energy']
        s1[k, k] -= 2 * eps
        e_m = d3.compute(z, pos @ s1, cell @ s1, [True] * 3)['energy']
        vol = np.abs(np.linalg.det(cell))
        fd = (e_p - e_m) / (2 * eps) / vol
        assert r1['stress'][k, k] == pytest.approx(fd, rel=2e-3, abs=1e-5)


def test_translation_and_pbc_wrap_invariance():
    d3 = D3Dispersion('damp_bj', 'pbe')
    cell = np.diag([5.0, 5.0, 5.0])
    z = [6, 8, 1]
    pos = np.array([[0.2, 0.1, 0.3], [1.5, 1.4, 1.6], [3.0, 3.2, 2.9]])
    e0 = d3.compute(z, pos, cell, [True] * 3)['energy']
    e1 = d3.compute(z, pos + 1.234, cell, [True] * 3)['energy']
    # wrap one atom by a lattice vector
    posw = pos.copy()
    posw[2] += cell[0]
    e2 = d3.compute(z, posw, cell, [True] * 3)['energy']
    assert e1 == pytest.approx(e0, abs=5e-6)
    assert e2 == pytest.approx(e0, abs=5e-6)


def test_lattice_shifts_cover_cutoff():
    cell = np.diag([3.0, 3.0, 3.0])
    s = lattice_shifts(cell, [True] * 3, 7.0, chunk=16)
    assert s.shape[0] % 16 == 0
    # zero shift first
    assert np.all(s[0] == 0)
    reps = np.abs(s[np.abs(s).max(1) < 9]).max()
    assert reps >= 3  # ceil(7/3) + safety


def test_d3_calculator_api():
    calc = D3Calculator(damping='damp_bj', functional='pbe')
    cell = np.diag([4.0, 4.0, 4.0])

    class _A:  # duck-typed atoms
        def get_atomic_numbers(self):
            return np.array([14, 14])

        def get_positions(self):
            return np.array([[0.0, 0, 0], [2.0, 2.0, 2.0]])

        def get_cell(self):
            return cell

        def get_pbc(self):
            return np.array([True] * 3)

    a = _A()
    e = calc.get_potential_energy(a)
    f = calc.get_forces()
    s = calc.get_stress()
    assert e < 0 and f.shape == (2, 3) and s.shape == (6,)


def test_md_engine_with_d3_overlay():
    """MD hybrid/overlay: engine energy = GNN + D3 exactly (the LAMMPS
    `pair_style hybrid/overlay e3gnn d3` analog)."""
    import jax
    import sys
    sys.path.insert(0, 'tests')
    from samples import rattled_rocksalt, tiny_model_config
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model

    at = rattled_rocksalt(reps=3, a=3.4, rattle=0.03, seed=4)
    model = build_e3_equivariant_model(tiny_model_config({'cutoff': 4.0}))
    params, _ = model.init(jax.random.PRNGKey(0))
    # small thresholds keep the replica sum cheap in CI
    d3 = D3Dispersion('damp_bj', 'pbe', rthr=120.0, cn_thr=80.0)

    md0 = MolecularDynamics(model, params, at, ensemble='nve', seed=1,
                            use_pallas=False)
    md1 = MolecularDynamics(model, params, at, ensemble='nve', seed=1,
                            use_pallas=False, d3=d3)
    nl = md0._build_nl(md0.state.pos)
    e0, f0 = md0._ef_fn(md0.state.pos, nl)
    e1, f1 = md1._ef_fn(md1.state.pos, nl)
    ref = d3.compute(at.atomic_numbers, at.pos, at.cell, at.pbc)
    assert float(e1 - e0) == pytest.approx(ref['energy'], rel=1e-4,
                                           abs=1e-5)
    np.testing.assert_allclose(np.asarray(f1 - f0), ref['forces'],
                               rtol=1e-3, atol=1e-4)
    # dynamics runs with the overlay
    m = md1.run(4)
    assert np.isfinite(m['energy']).all()


def test_npt_with_d3_overlay():
    """NPT + D3 (round-3: the guard is lifted): replica shift VECTORS
    track the evolving cell (tau = tau_frac @ lat at runtime), the
    integer range is enumerated on a margin-shrunk cell, and the D3
    virial rides the strain gradient into the barostat pressure."""
    import jax
    import sys
    sys.path.insert(0, 'tests')
    from samples import rattled_rocksalt, tiny_model_config
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model

    at = rattled_rocksalt(reps=3, a=3.4, rattle=0.03, seed=4)
    model = build_e3_equivariant_model(tiny_model_config({'cutoff': 4.0}))
    params, _ = model.init(jax.random.PRNGKey(0))
    d3 = D3Dispersion('damp_bj', 'pbe', rthr=120.0, cn_thr=80.0)

    md = MolecularDynamics(model, params, at, ensemble='npt', seed=1,
                           use_pallas=False, d3=d3, dt_fs=1.0,
                           temperature_K=50.0, rebuild_every=3)
    # D3 contributes to the NPT stress: the strain gradient through
    # the dispersion term is nonzero
    nl = md._compact_nl(md._ensure_verlet(), md.state.pos,
                        md.state.cell)
    e, f, s_with = md._efs_fn(md.state.pos, nl, md.state.cell)
    md_no = MolecularDynamics(model, params, at, ensemble='npt', seed=1,
                              use_pallas=False, dt_fs=1.0,
                              temperature_K=50.0, rebuild_every=3)
    nl0 = md_no._compact_nl(md_no._ensure_verlet(), md_no.state.pos,
                            md_no.state.cell)
    _, _, s_without = md_no._efs_fn(md_no.state.pos, nl0,
                                    md_no.state.cell)
    assert float(np.abs(np.asarray(s_with - s_without)).max()) > 1e-8

    m = md.run(6)
    assert np.isfinite(m['energy']).all()
    assert np.isfinite(m['volume']).all()


def test_c6_reference_grid_separability():
    """The factored per-atom C6 interpolation (ops/d3.c6_atom_factors)
    rests on two structural facts of Grimme's table, asserted here over
    all 94 elements: validity factorizes as valid_i[k] & valid_j[l],
    and cn_i[t1, t2, k, l] depends only on (t1, k) (cn_j on (t2, l))."""
    from sevennet_exp_tpu.ops.d3 import _raw_tables

    raw = _raw_tables()
    c6, cni, cnj = raw['c6'], raw['cn_i'], raw['cn_j']
    fin = np.isfinite(c6)
    valid_tk = fin.any(axis=(1, 3))                    # (94, MAXC)
    expect = valid_tk[:, None, :, None] & valid_tk[None, :, None, :]
    assert np.array_equal(fin, expect)

    with np.errstate(invalid='ignore'):
        ref_i = np.where(fin, cni, np.nan)
        ref_j = np.where(fin, cnj, np.nan)
        # constant over (t2, l) / (t1, k) wherever defined
        assert np.nanmax(np.nanmax(ref_i, axis=(1, 3))
                         - np.nanmin(ref_i, axis=(1, 3))) == 0.0
        assert np.nanmax(np.nanmax(ref_j, axis=(0, 2))
                         - np.nanmin(ref_j, axis=(0, 2))) == 0.0


def test_tiled_mic_matches_replica_path():
    """dispersion_energy_tiled (block-tiled MIC sweep, the 100k-capable
    path) must reproduce the replica-scan dispersion_energy exactly --
    energy AND autodiff forces -- whenever MIC is valid (cell widths
    >= 2*cutoff). Block=64 on 90 atoms also exercises the padding."""
    import jax
    from sevennet_exp_tpu.ops.d3 import (
        AU_TO_ANG, build_tables, dispersion_energy,
        dispersion_energy_tiled, lattice_shifts, mic_ok,
    )

    rng = np.random.RandomState(7)
    n = 90
    cell_ang = np.diag([14.0, 15.0, 14.5])
    pos_ang = rng.uniform(0, 1, (n, 3)) @ cell_ang
    z = rng.choice([1, 6, 8, 11, 17], n)
    rthr = (6.0 / AU_TO_ANG) ** 2   # bohr^2; 2*6 A < 14 A -> MIC exact
    cn_thr = (4.0 / AU_TO_ANG) ** 2
    assert mic_ok(cell_ang, 6.0)

    zu, tidx = np.unique(z, return_inverse=True)
    tables = build_tables(zu, np.float32)
    damping = get_damping_params('damp_bj', 'pbe')
    lat = jnp.asarray(cell_ang / AU_TO_ANG, jnp.float32)
    pos = jnp.asarray(pos_ang / AU_TO_ANG, jnp.float32)
    tidx = jnp.asarray(tidx)

    sv = lattice_shifts(np.asarray(lat, np.float64), [True] * 3,
                        float(np.sqrt(rthr)), 16).reshape(-1, 16, 3)
    sc = lattice_shifts(np.asarray(lat, np.float64), [True] * 3,
                        float(np.sqrt(cn_thr)), 16).reshape(-1, 16, 3)

    def e_ref(p):
        return dispersion_energy(p, lat, tidx, tables, damping,
                                 jnp.asarray(sv, jnp.float32),
                                 jnp.asarray(sc, jnp.float32),
                                 rthr, cn_thr)

    def e_tiled(p):
        return dispersion_energy_tiled(p, lat, tidx, tables, damping,
                                       rthr, cn_thr, block=64)

    e0, g0 = jax.value_and_grad(e_ref)(pos)
    e1, g1 = jax.value_and_grad(e_tiled)(pos)
    assert float(e1) == pytest.approx(float(e0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-7)


def test_md_chunked_path_with_d3():
    """D3 on the chunked large-system engine path (round-3's last
    NotImplementedError): the tiled-MIC D3 overlay on the packed
    chunked program must match the whole-array replica-D3 program."""
    import jax
    import sys
    sys.path.insert(0, 'tests')
    from samples import rattled_rocksalt, tiny_model_config
    from sevennet_exp_tpu.md.engine import MolecularDynamics
    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.ops.d3 import AU_TO_ANG

    at = rattled_rocksalt(reps=3, a=3.2, rattle=0.03, seed=4)  # 9.6 A box
    model = build_e3_equivariant_model(tiny_model_config({'cutoff': 4.0}))
    params, _ = model.init(jax.random.PRNGKey(0))
    # r_vdw = 4.2 A < box/2 -> MIC exact; replica path agrees
    d3 = D3Dispersion('damp_bj', 'pbe', rthr=64.0, cn_thr=36.0)

    md = MolecularDynamics(model, params, at, ensemble='nve', seed=1,
                           use_pallas=False, d3=d3)
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    md_c = MolecularDynamics(model, params, at, ensemble='nve', seed=1,
                             use_pallas=False, d3=d3,
                             conv_chunk_atoms=16)
    assert md_c.conv_chunk_rows > 0
    nl_c = md_c._compact_nl(md_c._build_nl(md_c.state.pos),
                            md_c.state.pos)
    e_c, f_c = md_c._ef_fn(md.state.pos, nl_c)
    assert float(e_c) == pytest.approx(float(e_ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref),
                               rtol=1e-3, atol=5e-5)

    # MIC-violating threshold must fail loudly at init, with guidance
    d3_big = D3Dispersion('damp_bj', 'pbe', rthr=9000.0)
    with pytest.raises(ValueError, match='minimum-image'):
        MolecularDynamics(model, params, at, ensemble='nve', seed=1,
                          use_pallas=False, d3=d3_big,
                          conv_chunk_atoms=16)
