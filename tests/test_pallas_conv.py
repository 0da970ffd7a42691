"""Fused conv-block kernel (MLP+TP+si2) == XLA path, values and force
gradients, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.graph import collate_graphs, unlabeled_atoms_to_graph
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.ops import pallas_conv, pallas_tp

from samples import nacl_bulk, tiny_model_config


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_conv.set_interpret(True)
    pallas_tp.set_interpret(True)
    mode = pallas_conv._CG_MODE
    geom = pallas_conv.geom_enabled()
    geom_dense = pallas_conv.geom_dense_enabled()
    yield
    pallas_conv.set_interpret(False)
    pallas_tp.set_interpret(False)
    pallas_tp.enable(False)
    pallas_conv.set_geom_enabled(geom)
    pallas_conv.set_geom_dense(geom_dense)
    if pallas_conv._CG_MODE != mode:
        pallas_conv.set_cg_mode(mode)
        pallas_conv.make_fused_conv.cache_clear()


@pytest.mark.parametrize('cg_mode', ['terms', 'cmshared'])
def test_fused_conv_matches_xla_model(cg_mode):
    pallas_conv.set_cg_mode(cg_mode)
    pallas_conv.make_fused_conv.cache_clear()
    model = build_e3_equivariant_model(tiny_model_config())
    params, _ = model.init(jax.random.PRNGKey(0))
    g = unlabeled_atoms_to_graph(nacl_bulk(), 4.0)
    b = collate_graphs([g], n_edge=256)  # % 256 == 0 -> fused eligible
    data = {k: jnp.asarray(v) for k, v in b.items()}

    pallas_tp.enable(False)
    out_ref = model.apply(params, dict(data))
    pallas_tp.enable(True)
    out_fused = model.apply(params, dict(data))

    np.testing.assert_allclose(
        np.asarray(out_ref[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(out_fused[KEY.PRED_TOTAL_ENERGY]), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref[KEY.PRED_FORCE]),
        np.asarray(out_fused[KEY.PRED_FORCE]), atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref[KEY.PRED_STRESS]),
        np.asarray(out_fused[KEY.PRED_STRESS]), atol=1e-3,
    )


def test_fused_conv_matches_xla_lmax3():
    """lmax=3 (l3i5-family) CG paths through the fused kernel."""
    model = build_e3_equivariant_model(tiny_model_config({
        'lmax': 3, 'channel': 2, 'num_convolution_layer': 2,
    }))
    params, _ = model.init(jax.random.PRNGKey(1))
    g = unlabeled_atoms_to_graph(nacl_bulk(), 4.0)
    b = collate_graphs([g], n_edge=256)
    data = {k: jnp.asarray(v) for k, v in b.items()}

    pallas_tp.enable(False)
    out_ref = model.apply(params, dict(data))
    pallas_tp.enable(True)
    out_fused = model.apply(params, dict(data))

    np.testing.assert_allclose(
        np.asarray(out_ref[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(out_fused[KEY.PRED_TOTAL_ENERGY]), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref[KEY.PRED_FORCE]),
        np.asarray(out_fused[KEY.PRED_FORCE]), atol=1e-3,
    )


@pytest.mark.parametrize('cg_mode,geom', [
    ('terms', False), ('cmshared', False), ('cmshared', True),
])
def test_fused_agg_conv_matches_xla_md_engine(cg_mode, geom):
    """Dense neighbor-grid MD path: the in-kernel-aggregated fused conv
    (agg_d > 0 -> node-row output, block-diagonal MXU reduction) must
    match the XLA dense-reduction path for energy AND forces. geom=True
    additionally computes Bessel/cutoff/SH inside the kernel with the
    backward emitting d(edge_vec) directly (GeomSpec)."""
    from samples import rattled_rocksalt
    from sevennet_exp_tpu.md.engine import MolecularDynamics

    pallas_conv.set_cg_mode(cg_mode)
    pallas_conv.set_geom_enabled(geom)
    # dense-path geometry fusion is default-off (slower on hardware:
    # per-layer geometry recompute vs the once-per-call shared arrays);
    # force it on here to keep the kernel covered
    pallas_conv.set_geom_dense(geom)
    pallas_conv.make_fused_conv.cache_clear()
    model = build_e3_equivariant_model(tiny_model_config())
    params, _ = model.init(jax.random.PRNGKey(0))
    at = rattled_rocksalt(reps=3, a=3.2, rattle=0.05, seed=1)  # 216 atoms
    md = MolecularDynamics(model, params, at, skin=0.5,
                           use_pallas=False)
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    pallas_tp.enable(True)
    e_fused, f_fused = md._ef_fn(md.state.pos, nl)

    np.testing.assert_allclose(float(e_fused), float(e_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                               atol=1e-3)


def test_geom_packed_chunked_matches_whole():
    """Geometry-fused packed-chunked path (EDGE_GEOM_PACKED: 3-column
    packed edge vectors, per-chunk geom kernel with in-kernel
    Bessel/cutoff/SH and a d(edge_vec)-emitting backward) must
    reproduce the whole-array XLA E/F. Asserts the geom regime
    actually engaged."""
    from samples import rattled_rocksalt
    from sevennet_exp_tpu.md.engine import MolecularDynamics

    pallas_conv.set_cg_mode('cmshared')
    pallas_conv.set_geom_enabled(True)
    pallas_conv.make_fused_conv.cache_clear()
    model = build_e3_equivariant_model(tiny_model_config())
    params, _ = model.init(jax.random.PRNGKey(2))
    at = rattled_rocksalt(reps=3, a=3.2, rattle=0.05, seed=3)
    md = MolecularDynamics(model, params, at, skin=0.5,
                           use_pallas=False)
    nl = md._compact_nl(md._build_nl(md.state.pos), md.state.pos)
    e_ref, f_ref = md._ef_fn(md.state.pos, nl)

    pallas_tp.enable(True)
    md_c = MolecularDynamics(model, params, at, skin=0.5,
                             conv_chunk_atoms=16)
    assert md_c.conv_chunk_rows > 0
    assert md_c._geom_packed_ok(), 'geom packed regime did not engage'
    nl_c = md_c._compact_nl(md_c._build_nl(md_c.state.pos),
                            md_c.state.pos)
    e_c, f_c = md_c._ef_fn(md.state.pos, nl_c)
    np.testing.assert_allclose(float(e_c), float(e_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_ref),
                               atol=1e-3)
