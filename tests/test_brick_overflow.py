"""Brick-engine capacity-overflow -> host-fallback -> resume cycle
(round-3 VERDICT weak #4): the likeliest production failure mode is a
static capacity (degree / halo / local-count) overflowing mid-
trajectory at temperature. The device-resident chunk flags the
overflow (psum'd), the engine discards the chunk, re-decomposes on the
host with fresh margins, and retries — trajectory continuity vs an
untampered engine is the oracle (reference analog: LAMMPS would error;
this engine recovers, cf. pair_e3gnn README.md:311-313).
"""

import dataclasses

import jax
import numpy as np
import pytest

from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.parallel import mdbrick as MB
from sevennet_exp_tpu.parallel.brick import decompose_brick

from samples import tiny_model_config
from test_parallel3d import _cube


@pytest.fixture(scope='module')
def setup():
    config = tiny_model_config({'cutoff': 3.5, 'channel': 4, 'lmax': 1,
                                'num_convolution_layer': 2})
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(5))
    return model, params, _cube()


def _exact_caps(spec):
    """Zero-slack copy of a spec's capacities (any runtime growth in
    degree / halo membership / local count then overflows)."""
    deg = spec.edge_mask.reshape(
        spec.edge_mask.shape[0], -1, spec.deg_cap
    ).sum(axis=2).max()
    cap_g = tuple(
        int(m.sum(axis=2).max()) for m in spec.send_mask
    )
    cap_loc = int(spec.n_loc.max())
    return dataclasses.replace(
        spec, deg_cap=int(deg), rows=0, cap_g=cap_g, cap_loc=cap_loc,
    )


def _make_tight(model, params, at, **kw):
    """Engine whose initial decomposition has ZERO capacity slack."""
    md = MB.BrickMolecularDynamics(
        model, params, at, mesh_shape=(2, 2, 2), ensemble='nvt',
        rebuild_every=3, seed=3, skin=0.5, **kw,
    )
    tight_prev = _exact_caps(md.spec)
    md.spec = decompose_brick(
        at, md.mesh_shape, md.build_cutoff, axes=md.axes,
        prev=tight_prev,
    )
    md._push_state(init_velocities=True)
    # the compiled-chunk cache is keyed on caps, but drop any primed
    # state derived from the padded spec
    for attr in ('_chunks', '_dev_state'):
        if hasattr(md, attr):
            delattr(md, attr)
    return md


def test_overflow_fallback_resumes(setup):
    model, params, at = setup
    temp = 1500.0

    ref = MB.BrickMolecularDynamics(
        model, params, at, mesh_shape=(2, 2, 2), ensemble='nvt',
        temperature_K=temp, rebuild_every=3, seed=3, skin=0.5,
    )
    _, gv0 = ref.gather_global()
    out_ref = ref.run(18)

    md = _make_tight(model, params, at, temperature_K=temp)
    # identical initial velocities (velocity draws are per packed slot,
    # so different cap_loc paddings otherwise diverge at t=0)
    md._push_state(vel_global=gv0)
    assert md.spec.deg_cap <= ref.spec.deg_cap
    fresh_calls = {'n': 0}
    orig = md._rebuild

    def spy(fresh=False):
        if fresh:
            fresh_calls['n'] += 1
        return orig(fresh=fresh)

    md._rebuild = spy
    out = md.run(18)

    # the overflow path must actually have fired (zero-slack caps at
    # 1500 K with 6 rebuild chunks)
    assert fresh_calls['n'] >= 1, 'no overflow triggered; tighten test'
    # continuity: same trajectory as the untampered engine (NVT is
    # deterministic given the same seed; capacity changes only alter
    # padding, not physics)
    np.testing.assert_allclose(
        out['energy'], out_ref['energy'], rtol=0, atol=5e-3,
    )
    np.testing.assert_allclose(
        out['temperature'], out_ref['temperature'], rtol=1e-3, atol=0.5,
    )
    # all atoms still present exactly once after recovery
    ids = np.asarray(
        md.ids.reshape(-1)[np.asarray(md.loc_mask.reshape(-1)) > 0]
    )
    assert np.array_equal(np.sort(ids), np.arange(len(at)))
