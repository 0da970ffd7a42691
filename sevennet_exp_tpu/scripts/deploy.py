"""Deploy: export a self-contained serving artifact (reference
sevenn/scripts/deploy.py).

Where the reference emits TorchScript (+ `_extra_files` metadata strings,
deploy.py:52-66) consumed by the LAMMPS pair styles, the TPU-native
artifact is a directory with:

  - params.pkl      numpy parameter pytree
  - config.yaml     full model config (self-describing, like the
                    reference's checkpoint-embedded config)
  - meta.yaml       serving metadata: chemical_symbols_to_index, cutoff,
                    comm_size (max feature width for halo buffers,
                    reference deploy.py:121-131), model version
  - model.stablehlo (optional) StableHLO text of the jitted E/F/S step,
                    loadable by a PJRT C++ host (runtime/ C++ driver)

`deploy_parallel` additionally records the per-layer feature widths the
domain-decomposed engine needs to size its halo exchanges.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import yaml

from .. import _keys as KEY
from ..checkpoint import SevenNetCheckpoint
from ..data.periodic import chemical_symbols
from ..model import layers as L


def _comm_sizes(model):
    """Per-convolution input feature widths (halo payload sizes)."""
    sizes = []
    for name, layer in model.layers:
        if isinstance(layer, L.IrrepsConvolution):
            sizes.append(int(layer.tp.irreps_in1.dim))
    return sizes


def deploy(checkpoint: str, output_path: str = 'deployed_serial',
           with_stablehlo: bool = True, n_node: int = 64,
           n_edge: int = 1024):
    cp = SevenNetCheckpoint(checkpoint)
    model, params = cp.build_model()
    os.makedirs(output_path, exist_ok=True)

    with open(os.path.join(output_path, 'params.pkl'), 'wb') as f:
        import jax
        pickle.dump(
            jax.tree_util.tree_map(np.asarray, params), f
        )
    with open(os.path.join(output_path, 'config.yaml'), 'w') as f:
        yaml.safe_dump(
            {k: v for k, v in cp.config.items()
             if isinstance(v, (str, int, float, bool, list, dict,
                               type(None)))},
            f, default_flow_style=False,
        )
    type_map = model.type_map
    meta = {
        'chemical_symbols_to_index': ' '.join(
            chemical_symbols[z] for z in sorted(
                type_map, key=lambda z: type_map[z]
            )
        ),
        'cutoff': float(model.cutoff),
        'num_species': len(type_map),
        'comm_size': max(_comm_sizes(model)) if _comm_sizes(model) else 0,
        'comm_sizes': _comm_sizes(model),
        'model_type': 'E3_equivariant_model',
        'version': '0.1.0+tpu',
        'dtype': 'single',
        'time': '',
    }
    with open(os.path.join(output_path, 'meta.yaml'), 'w') as f:
        yaml.safe_dump(meta, f, default_flow_style=False)

    if with_stablehlo:
        try:
            _export_stablehlo(model, params, output_path,
                              n_node=n_node, n_edge=n_edge)
        except Exception as e:  # noqa: BLE001 - best-effort export
            with open(os.path.join(output_path, 'stablehlo_error.txt'),
                      'w') as f:
                f.write(str(e))
    return output_path


def _export_stablehlo(model, params, output_path, n_node=64, n_edge=1024):
    """Two artifacts for the C++ PJRT host (runtime/pjrt_driver.cpp):

    - model.stablehlo        (params, data) signature, for re-use in JAX
    - model_const.stablehlo  params baked in as constants; the C++ host
                             feeds ONLY the data arrays (signature.yaml
                             records their exact order/shape/dtype)
    - compile_options.pb     serialized xla CompileOptionsProto, passed
                             verbatim to PJRT_Client_Compile
    """
    import jax
    import jax.numpy as jnp

    data = {
        KEY.ATOMIC_NUMBERS: jnp.zeros(n_node, jnp.int32),
        KEY.EDGE_IDX: jnp.zeros((2, n_edge), jnp.int32),
        KEY.EDGE_VEC: jnp.ones((n_edge, 3), jnp.float32),
        KEY.EDGE_MASK: jnp.zeros(n_edge, jnp.float32),
        KEY.BATCH: jnp.zeros(n_node, jnp.int32),
        KEY.NUM_ATOMS: jnp.array([n_node], jnp.int32),
        KEY.NODE_MASK: jnp.ones(n_node, jnp.float32),
        KEY.CELL_VOLUME: jnp.array([1.0], jnp.float32),
    }

    def efs(params, data):
        out = model.apply(params, data)
        return (out[KEY.PRED_TOTAL_ENERGY], out[KEY.PRED_FORCE],
                out[KEY.PRED_STRESS])

    # keep_unused: the artifact signature must match signature.yaml
    # exactly even if XLA could prune an input (the C++ host feeds every
    # recorded array, runtime/pjrt_cpu_host.cpp)
    lowered = jax.jit(efs, keep_unused=True).lower(params, data)
    with open(os.path.join(output_path, 'model.stablehlo'), 'w') as f:
        f.write(lowered.as_text())

    # round-trippable artifact: jax.export serialization reloads in any
    # JAX process (the serving analog of TorchScript re-load; the
    # equivalence test asserts bit-parity with model.apply)
    from jax import export as jexport
    exp = jexport.export(jax.jit(efs))(params, data)
    with open(os.path.join(output_path, 'model.jaxexport'), 'wb') as f:
        f.write(exp.serialize())

    # params-as-constants flavor: flat data args in a fixed order so the
    # C++ side needs no pytree logic
    names = sorted(data)

    def efs_const(*flat):
        return efs(params, dict(zip(names, flat)))

    flat_args = [data[k] for k in names]
    lowered_c = jax.jit(efs_const, keep_unused=True).lower(*flat_args)
    with open(os.path.join(output_path, 'model_const.stablehlo'), 'w') as f:
        f.write(lowered_c.as_text())

    try:
        from jax._src.lib import xla_client
        opts = xla_client.CompileOptions().SerializeAsString()
        with open(os.path.join(output_path, 'compile_options.pb'),
                  'wb') as f:
            f.write(opts)
    except Exception:  # noqa: BLE001 - proto layout is jax-version bound
        pass

    sig = {
        'inputs': [
            {'name': k, 'shape': list(np.shape(data[k])),
             'dtype': str(np.asarray(data[k]).dtype)}
            for k in names
        ],
        'outputs': [
            {'name': 'energy', 'shape': [1], 'dtype': 'float32'},
            {'name': 'forces', 'shape': [n_node, 3], 'dtype': 'float32'},
            {'name': 'stress', 'shape': [1, 6], 'dtype': 'float32'},
        ],
        'n_node': n_node,
        'n_edge': n_edge,
    }
    with open(os.path.join(output_path, 'signature.yaml'), 'w') as f:
        yaml.safe_dump(sig, f, default_flow_style=False)


def deploy_parallel(checkpoint: str,
                    output_path: str = 'deployed_parallel'):
    """Reference deploy.py:73-148: the parallel artifact. Here the
    'segments' are implicit (collectives live inside one program); we
    export the same payload as `deploy` plus halo sizing metadata."""
    out = deploy(checkpoint, output_path, with_stablehlo=False)
    return out
