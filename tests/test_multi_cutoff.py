"""Multi-cutoff edge embedding (reference edge_embedding.py:220-257,
model_build.py:87-103): per-layer cutoff radii via static masks."""

import jax
import jax.numpy as jnp
import numpy as np

import sevennet_exp_tpu._keys as KEY
from sevennet_exp_tpu.data.graph import atoms_to_graph, collate_graphs
from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.model.layers import MultiCutoffEdgeEmbedding

from samples import rattled_rocksalt, tiny_model_config


def _batch(cutoff=4.0):
    at = rattled_rocksalt(reps=2, a=3.2, rattle=0.05, seed=2)
    g = atoms_to_graph(at, cutoff, allow_unlabeled=True)
    b = collate_graphs([g], n_node=72, n_edge=2048)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_uniform_multi_cutoff_matches_single():
    base = tiny_model_config({'cutoff': 4.0, 'channel': 4, 'lmax': 1,
                              'num_convolution_layer': 2})
    multi = tiny_model_config({'cutoff': 4.0, 'channel': 4, 'lmax': 1,
                               'num_convolution_layer': 2,
                               'multi_cutoff': [4.0, 4.0]})
    m0 = build_e3_equivariant_model(base)
    m1 = build_e3_equivariant_model(multi)
    p0, _ = m0.init(jax.random.PRNGKey(5))
    p1, _ = m1.init(jax.random.PRNGKey(5))
    b = _batch()
    o0 = m0.apply(p0, dict(b))
    o1 = m1.apply(p1, dict(b))
    np.testing.assert_allclose(
        np.asarray(o1[KEY.PRED_TOTAL_ENERGY]),
        np.asarray(o0[KEY.PRED_TOTAL_ENERGY]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o1[KEY.PRED_FORCE]),
        np.asarray(o0[KEY.PRED_FORCE]), rtol=1e-5, atol=1e-6)


def test_heterogeneous_cutoffs_run_and_differ():
    multi = tiny_model_config({'cutoff': 4.0, 'channel': 4, 'lmax': 1,
                               'num_convolution_layer': 2,
                               'multi_cutoff': [4.0, 3.0]})
    uni = tiny_model_config({'cutoff': 4.0, 'channel': 4, 'lmax': 1,
                             'num_convolution_layer': 2})
    m = build_e3_equivariant_model(multi)
    mu = build_e3_equivariant_model(uni)
    p, _ = m.init(jax.random.PRNGKey(5))
    pu, _ = mu.init(jax.random.PRNGKey(5))
    b = _batch()
    o = m.apply(p, dict(b))
    ou = mu.apply(pu, dict(b))
    e, eu = (float(np.asarray(x[KEY.PRED_TOTAL_ENERGY])[0]) for x in (o, ou))
    assert np.isfinite(e)
    assert abs(e - eu) > 1e-8  # second layer sees fewer edges


def test_embedding_layer_masks_beyond_cutoff():
    model = build_e3_equivariant_model(tiny_model_config({
        'cutoff': 4.0, 'channel': 4, 'lmax': 1,
        'num_convolution_layer': 2, 'multi_cutoff': [4.0, 3.0]}))
    emb_layer = dict(model.layers)['edge_embedding']
    assert isinstance(emb_layer, MultiCutoffEdgeEmbedding)
    params, _ = emb_layer.init(jax.random.PRNGKey(0))
    b = _batch()
    data = emb_layer.apply(params, dict(b))
    r = np.asarray(data[KEY.EDGE_LENGTH])
    base = np.asarray(b[KEY.EDGE_MASK])
    for c in (3.0, 4.0):
        mask = np.asarray(data[KEY.EDGE_MASK + str(c)])
        np.testing.assert_array_equal(mask, ((r <= c) & (base > 0)))
        emb = np.asarray(data[KEY.EDGE_EMBEDDING + str(c)])
        assert np.all(emb[mask == 0] == 0.0)
        assert np.any(emb[mask == 1] != 0.0)
    # conv keys wired per layer
    convs = [l for n, l in model.layers if n.endswith('_convolution')]
    assert convs[0].key_weight_input.endswith('4.0')
    assert convs[1].key_weight_input.endswith('3.0')
    assert convs[1].key_mask.endswith('3.0')
