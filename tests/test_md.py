"""MD engine tests: on-device neighbor lists vs host reference, NVE energy
conservation, NVT thermostat behavior — the single-device oracle that the
domain-decomposed path is later tested against (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_exp_tpu.data.graph import Atoms
from sevennet_exp_tpu.data.neighborlist import neighbor_list as host_nl
from sevennet_exp_tpu.md.engine import MolecularDynamics
from sevennet_exp_tpu.md.neighbor import (
    cell_list_neighbor_list,
    choose_grid,
    dense_neighbor_list,
)
from sevennet_exp_tpu.model.build import build_e3_equivariant_model

from samples import rattled_rocksalt, tiny_model_config


def _pairs_set(ei, ej):
    return set(zip(ei.tolist(), ej.tolist()))


def test_dense_nl_matches_host():
    at = rattled_rocksalt(reps=2, a=5.63, rattle=0.2, seed=1)
    cutoff = 4.0
    nl = dense_neighbor_list(
        jnp.asarray(at.pos, jnp.float32), jnp.asarray(at.cell, jnp.float32),
        cutoff, e_cap=4096,
    )
    valid = np.asarray(nl.valid)
    dev = _pairs_set(np.asarray(nl.edge_idx[0])[valid],
                     np.asarray(nl.edge_idx[1])[valid])
    hi, hj, _, _ = host_nl(at.pos, at.cell, at.pbc, cutoff)
    host = _pairs_set(hi, hj)
    assert dev == host


def test_cell_list_nl_matches_dense():
    at = rattled_rocksalt(reps=3, a=5.63, rattle=0.15, seed=2)
    cutoff = 4.5
    pos = jnp.asarray(at.pos, jnp.float32)
    cell = jnp.asarray(at.cell, jnp.float32)
    grid = choose_grid(at.cell, cutoff)
    assert all(g >= 3 for g in grid)
    d = dense_neighbor_list(pos, cell, cutoff, e_cap=16384)
    c = cell_list_neighbor_list(pos, cell, cutoff, 16384, grid, cell_cap=32)
    assert not bool(d.overflow) and not bool(c.overflow)
    vd, vc = np.asarray(d.valid), np.asarray(c.valid)
    sd = _pairs_set(np.asarray(d.edge_idx[0])[vd], np.asarray(d.edge_idx[1])[vd])
    sc = _pairs_set(np.asarray(c.edge_idx[0])[vc], np.asarray(c.edge_idx[1])[vc])
    assert sd == sc


def test_cell_list_pads_never_valid():
    """Regression: nonzero(size=...) pads repeat flat index 0; when atom
    0's first diagonal-bin candidate is inside the cutoff those pad rows
    used to be marked valid, duplicating edge 0 (double-counted energy).
    """
    cell = jnp.eye(3, dtype=jnp.float32) * 18.0
    pos = jnp.asarray(np.array([
        [0.1, 0.1, 0.1],       # bin (0,0,0)
        [17.9, 17.9, 17.9],    # bin (2,2,2) == (-1,-1,-1) offset, slot 0
        [9.0, 9.0, 9.0],
    ], np.float32))
    nl = cell_list_neighbor_list(pos, cell, 4.5, 64, (3, 3, 3), 4)
    nl_d = dense_neighbor_list(pos, cell, 4.5, 64)
    assert int(nl.valid.sum()) == int(nl_d.valid.sum()) == 2
    # invalid rows park on the last atom (dst stays sorted for the
    # sorted-scatter aggregation path)
    idx = np.asarray(nl.edge_idx)
    valid = np.asarray(nl.valid)
    assert (idx[:, ~valid] == 2).all()
    assert (np.diff(idx[0]) >= 0).all()


def test_reverse_permutation_and_gather_rev():
    from sevennet_exp_tpu.ops.scatter import (
        gather_rev, reverse_permutation, scatter_sum,
    )

    rng = np.random.default_rng(5)
    at = rattled_rocksalt(reps=2, a=5.63, rattle=0.1, seed=4)
    n = len(at)
    nl = dense_neighbor_list(
        jnp.asarray(at.pos, jnp.float32),
        jnp.asarray(at.cell, jnp.float32), 4.0, e_cap=4096,
    )
    rev = reverse_permutation(nl.edge_idx)
    idx = np.asarray(nl.edge_idx)
    rev_np = np.asarray(rev)
    valid = np.asarray(nl.valid)
    # rev maps each edge to its mirror
    assert (idx[0, rev_np[valid]] == idx[1, valid]).all()
    assert (idx[1, rev_np[valid]] == idx[0, valid]).all()
    # gather_rev: same forward; transpose == scatter-by-src
    x = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(idx.shape[1], 7)).astype(np.float32))
    src = nl.edge_idx[1]
    dst = nl.edge_idx[0]
    fwd_plain = x[src]
    fwd_rev = gather_rev(x, src, rev, dst)
    np.testing.assert_array_equal(np.asarray(fwd_plain), np.asarray(fwd_rev))
    _, vjp_plain = jax.vjp(lambda x: x[src], x)
    _, vjp_rev = jax.vjp(lambda x: gather_rev(x, src, rev, dst), x)
    np.testing.assert_allclose(
        np.asarray(vjp_plain(ct)[0]), np.asarray(vjp_rev(ct)[0]),
        rtol=1e-6, atol=1e-6,
    )


@pytest.fixture(scope='module')
def md_setup():
    config = tiny_model_config({'cutoff': 3.5, 'channel': 4, 'lmax': 1,
                                'num_convolution_layer': 2})
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(1))
    at = rattled_rocksalt(reps=2, a=5.2, rattle=0.05, seed=3)
    return model, params, at


def test_nve_energy_conservation(md_setup):
    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=100.0, ensemble='nve',
        rebuild_every=5, seed=0,
    )
    m = md.run(50)
    etot = m['energy'] + _kinetic(md)
    # total energy drift small relative to kinetic scale
    e_series = m['energy']
    assert np.isfinite(e_series).all()
    # track total energy over the run using per-chunk state is coarse;
    # instead rerun with per-chunk checks
    first, last = e_series[0], e_series[-1]
    ke = _kinetic(md)
    assert abs(float(last - first)) < 0.1  # eV, tiny cell, 50 fs


def _kinetic(md):
    from sevennet_exp_tpu.md.integrate import kinetic_energy
    return float(kinetic_energy(md.state, md.masses))


def test_nvt_runs_and_thermalizes(md_setup):
    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=300.0,
        ensemble='langevin', rebuild_every=5, seed=0,
    )
    m = md.run(100)
    assert np.isfinite(m['energy']).all()
    t = m['temperature'][-1]
    assert 30.0 < float(t) < 3000.0


def test_md_forces_match_calculator(md_setup):
    """The jitted MD potential must agree with the (host-neighbor-list)
    calculator path — the serial oracle of SURVEY.md §4."""
    from sevennet_exp_tpu.calculator import SevenNetCalculator

    model, params, at = md_setup
    md = MolecularDynamics(model, params, at, ensemble='nve')
    nl = md._build_nl(md.state.pos)
    e, f = md._ef_fn(md.state.pos, nl)
    calc = SevenNetCalculator(model=model, params=params)
    res = calc.calculate_single(at)
    assert abs(float(e) - res['energy']) < 5e-4
    np.testing.assert_allclose(np.asarray(f), res['forces'], atol=5e-4)


def test_raw_build_nl_matches_compacted(md_setup):
    """_ef_fn must give identical E/F on the raw Verlet build list
    (scatter path) and the compacted dense grid. Regression: the
    build-time rev amortization once rode NeighborState.rev, which
    _energy_fn uses as the structural dense-grid discriminator — a
    raw-list force call then misread the build list as an n*deg grid
    (round-5 fix: the build permutation rides build_rev)."""
    model, params, at = md_setup
    md = MolecularDynamics(model, params, at, ensemble='nve')
    nl_raw = md._build_nl(md.state.pos)
    assert nl_raw.rev is None and nl_raw.build_rev is not None
    e_raw, f_raw = md._ef_fn(md.state.pos, nl_raw)
    nl_c = md._compact_nl(nl_raw, md.state.pos)
    assert nl_c.rev is not None
    e_c, f_c = md._ef_fn(md.state.pos, nl_c)
    np.testing.assert_allclose(float(e_raw), float(e_c), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_raw), np.asarray(f_c),
                               atol=1e-5)


def test_conv_chunked_matches_whole(md_setup):
    """Memory-chunked convolution (scan + remat, CONV_CHUNK_ROWS) must
    reproduce the whole-array energies and forces exactly."""
    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=300.0,
        ensemble='nvt', rebuild_every=5, seed=0,
    )
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    md_c = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=300.0,
        ensemble='nvt', rebuild_every=5, seed=0,
        conv_chunk_atoms=16,
    )
    assert md_c.conv_chunk_rows > 0
    nl_c = md_c._compact_nl(md_c._build_nl(md_c.state.pos),
                            md_c.state.pos)
    e_c, f_c = md_c._ef_fn(md.state.pos, nl_c)
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref),
                               atol=2e-5)


def test_half_pair_indices_roundtrip():
    """half/pair must invert each other on real edges; pad rows (rev
    fixed points) keep pair = 0 and never enter the half list."""
    from sevennet_exp_tpu.ops.scatter import (
        half_pair_indices, pair_spread, reverse_permutation,
    )

    # dense-grid style list: 3 atoms x D=4 slots, some pad self-edges
    dst = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2])
    src = jnp.asarray([1, 2, 0, 0, 0, 2, 1, 1, 0, 1, 2, 2])
    edge_idx = jnp.stack([dst, src])
    rev = reverse_permutation(edge_idx)
    half, pair = jax.jit(half_pair_indices)(rev)
    e_cap = dst.shape[0]
    real = np.asarray(dst != src)
    hn, pn, rn = np.asarray(half), np.asarray(pair), np.asarray(rev)
    n_real = int(real.sum())
    assert (hn < e_cap).sum() == n_real // 2
    for e in np.nonzero(real)[0]:
        m = min(e, rn[e])
        assert hn[pn[e]] == m
    # pair_spread: forward is the gather; backward (gather-by-rev)
    # must equal the plain scatter-add VJP where the forward reads it
    wh = jnp.asarray(np.random.RandomState(0).randn(e_cap // 2, 5),
                     jnp.float32)
    scale = jnp.asarray(real, jnp.float32)[:, None]
    f_custom = lambda w: jnp.sum(
        (pair_spread(w, pair, half, rev) * scale) ** 2)
    f_plain = lambda w: jnp.sum((w[pair] * scale) ** 2)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(wh)),
        np.asarray(jax.grad(f_plain)(wh)), rtol=1e-6, atol=1e-6,
    )


def test_half_mlp_dense_matches_xla(md_setup):
    """The half-list radial MLP + ext_w kernel on the dense-grid path
    must reproduce the plain XLA whole-array E/F (the radial embedding
    is reversal-symmetric, so sharing MLP rows across (e, rev[e]) is
    exact). Asserts the ext_w kernel actually engaged."""
    from sevennet_exp_tpu.ops import pallas_conv, pallas_tp

    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=300.0,
        ensemble='nvt', rebuild_every=5, seed=0,
    )
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    calls = {'n': 0}
    orig = pallas_conv.make_fused_conv

    def counting(*a, **kw):
        if kw.get('ext_w'):
            calls['n'] += 1
        return orig(*a, **kw)

    pallas_tp.enable(True)
    geom_was = pallas_conv.geom_dense_enabled()
    half_was = pallas_conv._HALF_MLP
    pallas_conv.set_geom_dense(False)
    pallas_conv.set_half_mlp(True)
    if jax.default_backend() == 'cpu':
        pallas_conv.set_interpret(True)
        pallas_tp.set_interpret(True)
    try:
        from sevennet_exp_tpu.model import layers as layers_mod
        import unittest.mock as mock
        with mock.patch.object(layers_mod.pallas_conv,
                               'make_fused_conv', counting):
            md_h = MolecularDynamics(
                model, params, at, dt_fs=1.0, temperature_K=300.0,
                ensemble='nvt', rebuild_every=5, seed=0,
            )
            nl_h = md_h._compact_nl(md_h._build_nl(md_h.state.pos),
                                    md_h.state.pos)
            e_h, f_h = md_h._ef_fn(md.state.pos, nl_h)
    finally:
        pallas_tp.enable(False)
        pallas_conv.set_interpret(False)
        pallas_tp.set_interpret(False)
        pallas_conv.set_geom_dense(geom_was)
        pallas_conv.set_half_mlp(half_was)
    assert calls['n'] > 0, 'ext_w kernel never engaged'
    np.testing.assert_allclose(float(e_h), float(e_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(f_h), np.asarray(f_ref),
                               atol=2e-5)


def test_conv_chunked_fused_piece_matches_whole(md_setup, monkeypatch):
    """The packed-chunked path's single-custom_vjp fused piece (gather +
    unpack + kernel, no kernel-forward remat) must reproduce the plain
    XLA whole-array E/F. Asserts the fused piece actually engaged."""
    from sevennet_exp_tpu.model import layers as layers_mod
    from sevennet_exp_tpu.ops import pallas_conv, pallas_tp

    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=300.0,
        ensemble='nvt', rebuild_every=5, seed=0,
    )
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    calls = {'n': 0}
    orig = pallas_conv.make_fused_conv

    def counting(*a, **kw):
        calls['n'] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(pallas_conv, 'make_fused_conv', counting)
    monkeypatch.setattr(layers_mod.pallas_conv, 'make_fused_conv',
                        counting)
    pallas_tp.enable(True)
    # pin the EDGE_FEAT_PACKED fused path (the geom-fused regime has
    # its own test: test_pallas_conv.test_geom_packed_chunked_...)
    geom_was = pallas_conv.geom_enabled()
    pallas_conv.set_geom_enabled(False)
    if jax.default_backend() == 'cpu':
        pallas_conv.set_interpret(True)
        pallas_tp.set_interpret(True)
    try:
        md_c = MolecularDynamics(
            model, params, at, dt_fs=1.0, temperature_K=300.0,
            ensemble='nvt', rebuild_every=5, seed=0,
            conv_chunk_atoms=16,
        )
        assert md_c.conv_chunk_rows > 0
        nl_c = md_c._compact_nl(md_c._build_nl(md_c.state.pos),
                                md_c.state.pos)
        e_c, f_c = md_c._ef_fn(md.state.pos, nl_c)
    finally:
        pallas_tp.enable(False)
        pallas_conv.set_interpret(False)
        pallas_tp.set_interpret(False)
        pallas_conv.set_geom_enabled(geom_was)
    assert calls['n'] > 0, 'fused piece never engaged'
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref),
                               atol=2e-5)


def test_npt_berendsen(md_setup):
    """NPT (Nose-Hoover thermostat + Berendsen barostat over the
    strain-gradient virial): runs stably, reports volume, and the
    barostat moves the box in the correct direction -- a large positive
    target pressure must compress the cell."""
    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=50.0,
        ensemble='npt', rebuild_every=5, seed=0,
        pressure_gpa=5.0, pdamp_fs=200.0,
    )
    v0 = float(abs(np.linalg.det(np.asarray(at.cell))))
    out = md.run(20)
    assert np.isfinite(out['energy']).all()
    assert np.isfinite(out['volume']).all()
    v_end = out['volume'][-1]
    assert v_end < v0, (v_end, v0)  # 5 GPa target squeezes the box
    # cell and positions scaled together (fractional coords preserved
    # up to dynamics): cell stays finite and nonsingular
    cell_end = np.asarray(md.state.cell)
    assert np.isfinite(cell_end).all()
    assert abs(np.linalg.det(cell_end)) > 0.5 * v0


def test_npt_aniso_matches_iso_linearization():
    """Tensor-Berendsen step vs isotropic step on a synthetic
    isotropically-stressed system: the aniso mu is the linearization of
    the isotropic mu^(1/3) formula, so one step must agree to O(dP^2)
    -- tight in practice."""
    from sevennet_exp_tpu.md import integrate

    n = 8
    rng = np.random.default_rng(0)
    masses = jnp.asarray(rng.uniform(10.0, 30.0, n), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 5, (n, 3)), jnp.float32)
    # zero velocity: random velocities carry off-diagonal kinetic
    # pressure the tensor barostat responds to but the isotropic one
    # projects onto the trace -- a real physical difference, not the
    # linearization error this test measures
    vel = jnp.zeros((n, 3), jnp.float32)
    cell = jnp.eye(3, dtype=jnp.float32) * 5.63
    s_iso = 0.002  # eV/A^3, hydrostatic

    def efs(pos, nl, cell):
        f = jnp.zeros_like(pos)
        stress = jnp.array([s_iso, s_iso, s_iso, 0, 0, 0], jnp.float32)
        return jnp.asarray(0.0), f, stress

    # compressibility 1.0: with the water default (4.57e-5) one
    # step's strain is ~2e-8, below f32 resolution at cell 5.63
    kw = dict(masses=masses, dt=0.5, temp_K=10.0, tdamp=100.0,
              press_target=0.01, pdamp=100.0, compressibility=1.0)
    st = integrate.MDState(
        pos=pos, vel=vel, forces=jnp.zeros_like(pos),
        energy=jnp.asarray(0.0), key=jax.random.PRNGKey(0),
        xi=jnp.asarray(0.0), cell=cell)
    out_iso = integrate.make_npt_berendsen_step(efs, **kw)(st, None)
    out_ani = integrate.make_npt_berendsen_aniso_step(efs, **kw)(st, None)
    np.testing.assert_allclose(np.asarray(out_ani.cell),
                               np.asarray(out_iso.cell), rtol=5e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_ani.pos),
                               np.asarray(out_iso.pos), rtol=2e-5,
                               atol=2e-6)


def test_npt_aniso_relaxes_shear():
    """A pure shear stress must tilt the cell (develop off-diagonal
    components) under the tensor barostat -- the isotropic ensemble
    cannot do this by construction."""
    from sevennet_exp_tpu.md import integrate

    n = 8
    masses = jnp.full((n,), 20.0, jnp.float32)
    pos = jnp.zeros((n, 3), jnp.float32)
    cell = jnp.eye(3, dtype=jnp.float32) * 5.63
    s_xy = 0.01

    def efs(pos, nl, cell):
        stress = jnp.array([0, 0, 0, s_xy, 0, 0], jnp.float32)
        return jnp.asarray(0.0), jnp.zeros_like(pos), stress

    step = integrate.make_npt_berendsen_aniso_step(
        efs, masses, dt=0.5, temp_K=1.0, tdamp=100.0,
        press_target=0.0, pdamp=100.0, compressibility=1.0)
    st = integrate.MDState(
        pos=pos, vel=jnp.zeros_like(pos), forces=jnp.zeros_like(pos),
        energy=jnp.asarray(0.0), key=jax.random.PRNGKey(0),
        xi=jnp.asarray(0.0), cell=cell)
    for _ in range(5):
        st = step(st, None)
    c = np.asarray(st.cell)
    # positive xy stress (internal > target) drives mu_xy > 0: tilt
    assert c[0, 1] > 1e-6 and c[1, 0] > 1e-6
    assert np.allclose(c, c.T * (c.T != 0) + c * (c.T == 0), atol=1e-5)
    # diagonal barely moves (no hydrostatic component)
    np.testing.assert_allclose(np.diag(c), 5.63, rtol=1e-4)


def test_npt_aniso_engine_runs(md_setup):
    """Engine-level triclinic NPT: runs stably on the real tiny model,
    volume responds to a compressive target, and the cell develops
    (and keeps) finite anisotropy without blowing up."""
    model, params, at = md_setup
    md = MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=50.0,
        ensemble='npt_aniso', rebuild_every=5, seed=0,
        pressure_gpa=5.0, pdamp_fs=200.0,
    )
    v0 = float(abs(np.linalg.det(np.asarray(at.cell))))
    out = md.run(20)
    assert np.isfinite(out['energy']).all()
    v_end = out['volume'][-1]
    assert v_end < v0, (v_end, v0)  # 5 GPa target squeezes the box
    cell_end = np.asarray(md.state.cell)
    assert np.isfinite(cell_end).all()
    assert abs(np.linalg.det(cell_end)) > 0.5 * v0
