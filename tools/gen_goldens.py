"""Regenerate the self-golden E/F/S values in tests/test_checkpoint.py.

Runs on CPU fp32 (the test-suite platform). Only use when a deliberate
numerics-convention change is made; paste the printed values into
tests/test_checkpoint.py and explain the change in the commit message.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sevennet_exp_tpu._keys as KEY  # noqa: E402
from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint  # noqa: E402
from sevennet_exp_tpu.data.graph import (  # noqa: E402
    Atoms, collate_graphs, unlabeled_atoms_to_graph,
)
from test_checkpoint import _hfo2_cell  # noqa: E402

assert jax.devices()[0].platform == 'cpu', jax.devices()

cp = SevenNetCheckpoint('/root/reference/tests/data/checkpoints/cp_0.pth')
model, params = cp.build_model()

at = _hfo2_cell()
g = unlabeled_atoms_to_graph(at, cp.config['cutoff'])
b = collate_graphs([g])
out = model.jitted()(params, {k: jnp.asarray(v) for k, v in b.items()})
print('GOLDEN_HFO2_E =', repr(float(out[KEY.PRED_TOTAL_ENERGY][0])))
print('GOLDEN_HFO2_F3 =', repr(np.asarray(out[KEY.PRED_FORCE])[:3].tolist()))
print('GOLDEN_HFO2_S =', repr(np.asarray(out[KEY.PRED_STRESS][0]).tolist()))

at2 = Atoms(atomic_numbers=np.array([72, 8, 8]),
            pos=np.array([[0.0, 0.0, 0.0], [1.9, 0.1, -0.2],
                          [-0.3, 1.85, 0.4]]),
            cell=np.eye(3) * 30.0, pbc=np.array([False] * 3))
g2 = unlabeled_atoms_to_graph(at2, cp.config['cutoff'])
b2 = collate_graphs([g2])
out2 = model.jitted()(params, {k: jnp.asarray(v) for k, v in b2.items()})
print('GOLDEN_MOL_E =', repr(float(out2[KEY.PRED_TOTAL_ENERGY][0])))
print('GOLDEN_MOL_F =', repr(np.asarray(out2[KEY.PRED_FORCE])[:3].tolist()))
