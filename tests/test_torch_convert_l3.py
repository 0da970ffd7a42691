"""Round-trip the torch-checkpoint ingestion at lmax=3 (the l3i5
family). cp_0 only exercises the lmax=2-era conversion; no pretrained
l3i5 torch weights ship anywhere reachable, so this test SYNTHESIZES a
reference-format torch checkpoint by inverse-mapping our own parameter
tree into the e3nn flat layouts — including the pre-v0.11 UNSORTED
convolution weight columns and sign-flipped stored w3j tensors
(reference scripts/backward_compatibility.py:74-176) — and asserts
`convert_torch_state_dict` recovers the original parameters exactly.
The inversion is independent code; any asymmetry in the sort/sign/
offset logic at l=3 breaks the round trip."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

from samples import tiny_model_config  # noqa: E402
from sevennet_exp_tpu.checkpoint import SevenNetCheckpoint  # noqa: E402
from sevennet_exp_tpu.irreps import Irrep  # noqa: E402
from sevennet_exp_tpu.model import layers as L  # noqa: E402
from sevennet_exp_tpu.model.build import (  # noqa: E402
    build_e3_equivariant_model,
)
from sevennet_exp_tpu.ops.wigner import wigner_3j  # noqa: E402


def _invert_linear(spec, prefix, p, sd):
    """Our per-path weights -> one e3nn flat weight (+ scalar biases)."""
    sd[f'{prefix}.weight'] = np.concatenate(
        [np.asarray(p[f'w{n}']).reshape(-1) for n in range(len(spec.paths))]
    )
    if spec.biases:
        bs = [np.asarray(p[f'b{j}']).reshape(-1)
              for j, (mul, ir) in enumerate(spec.irreps_out)
              if ir == Irrep(0, 1)]
        if bs:
            sd[f'{prefix}.bias'] = np.concatenate(bs)


def _flip(tri):
    """Deterministic mix of flipped / unflipped w3j triples."""
    l1, l2, l3 = tri
    return (l1 * 9 + l2 * 3 + l3) % 2 == 1


def test_l3_torch_conversion_roundtrip(tmp_path):
    config = tiny_model_config({
        'lmax': 3, 'is_parity': False,
        'self_connection_type': 'linear',
        'use_bias_in_linear': True,
        'channel': 4, 'num_convolution_layer': 3,
    })
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(42))
    params = jax.tree_util.tree_map(np.asarray, params)

    sd = {}
    all_tris = set()
    for name, layer in model.layers:
        p = params.get(name)
        if p is None:
            continue
        if isinstance(layer, L.EdgeEmbedding):
            if 'coeffs' in p:
                sd[f'{name}.basis_function.coeffs'] = np.asarray(p['coeffs'])
        elif isinstance(layer,
                        (L.IrrepsLinear, L.SelfConnectionLinearIntro)):
            _invert_linear(layer.spec, f'{name}.linear', p, sd)
        elif isinstance(layer, L.SelfConnectionIntro):
            ws = [np.asarray(p[f'w{n}']).reshape(-1)
                  for n in range(len(layer.spec.instructions))]
            sd[f'{name}.fc_tensor_product.weight'] = np.concatenate(ws)
        elif isinstance(layer, L.IrrepsConvolution):
            wnn = p['weight_nn']
            nlayers = len(layer.weight_nn.hs) - 1
            for i in range(nlayers - 1):
                sd[f'{name}.weight_nn.layer{i}.weight'] = np.asarray(
                    wnn[f'w{i}'])
            sd[f'{name}.denominator'] = np.asarray(
                p['denominator']).reshape(())

            # last radial-MLP layer: emit columns in the UNSORTED
            # instruction order with sign flips folded OUT (the old
            # on-disk convention the converter must undo)
            tp = layer.tp
            last = np.asarray(wnn[f'w{nlayers - 1}'])
            ranges = {}
            off = 0
            for inst in tp.instructions:
                mul = tp.irreps_in1[inst[0]].mul
                ranges.setdefault(tuple(inst), []).append((off, mul))
                off += mul
            assert off == last.shape[1]
            blocks = []
            tris = set()
            for inst in tp.instructions_unsorted:
                o, mul = ranges[tuple(inst)].pop(0)
                block = last[:, o:o + mul]
                l1 = tp.irreps_in1[inst[0]].ir.l
                l2 = tp.irreps_in2[inst[1]].ir.l
                l3 = tp.irreps_out[inst[2]].ir.l
                if l1 > 0 and l2 > 0 and l3 > 0:
                    tris.add((l1, l2, l3))
                    if _flip((l1, l2, l3)):
                        # converter sees -w3j stored and negates the
                        # columns back; pre-negate so the round trip
                        # lands on the original
                        block = -block
                blocks.append(block)
            sd[f'{name}.weight_nn.layer{nlayers - 1}.weight'] = (
                np.concatenate(blocks, axis=1))
            all_tris |= tris
            for tri in tris:
                w3j = wigner_3j(*tri)
                sd[f'{name}.convolution._compiled_main_left_right.'
                   f'_w3j_{tri[0]}_{tri[1]}_{tri[2]}'] = (
                    -w3j if _flip(tri) else w3j)

            if layer.si2 is not None:
                _invert_linear(
                    layer.si2,
                    name.replace('_convolution', '_self_interaction_2')
                    + '.linear',
                    p['si2'], sd,
                )
        elif isinstance(layer, (L.Rescale, L.SpeciesWiseRescale)):
            sd[f'{name}.shift'] = np.asarray(p['shift'])
            sd[f'{name}.scale'] = np.asarray(p['scale'])
        elif isinstance(layer, L.FCNReadout):
            n = len(layer.spec.hs) - 1
            for i in range(n):
                sd[f'{name}.fcn.layer{i}.weight'] = np.asarray(p[f'w{i}'])
        else:
            raise AssertionError(
                f'unhandled parametrized layer {name}: {type(layer)}')

    # the mid-layer convs must carry l>0 x l>0 -> l>0 paths (incl. l=3)
    # or the sign-folding logic was never exercised
    assert any(3 in tri for tri in all_tris), all_tris
    # and at least one conv must have a REAL sorted-vs-unsorted
    # permutation, or the column re-sort was a no-op
    assert any(
        layer.tp.instructions != layer.tp.instructions_unsorted
        for _, layer in model.layers
        if isinstance(layer, L.IrrepsConvolution)
    )

    cfg = dict(config)
    cfg['version'] = '0.10.0'  # pre-0.11: forces the re-sort path
    path = str(tmp_path / 'l3_synth.pth')
    torch.save(
        {'config': cfg, 'epoch': 3,
         'model_state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}},
        path,
    )

    cp = SevenNetCheckpoint(path)
    model2, params2 = cp.build_model()
    assert cp.epoch is None or cp.epoch == 3

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    assert len(flat1) == len(flat2)
    for kp, v1 in flat1:
        v2 = np.asarray(flat2[kp])
        v1 = np.asarray(v1)
        assert v1.shape == v2.shape, (kp, v1.shape, v2.shape)
        np.testing.assert_allclose(
            v2, v1, rtol=0, atol=1e-7,
            err_msg=f'round-trip mismatch at {kp}')
