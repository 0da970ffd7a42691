"""Kernel block-size policy: every fused-conv variant's chosen blocks
must fit XLA's 16 MiB scoped-VMEM budget around the pallas custom call
(calibrated model in ops/pallas_conv.make_fused_conv).

Round-4 regression guard: the 1024-row default block, validated only
at 1k, OOM'd the 97k chunked geom BACKWARD at compile time (scoped
allocation 28.19 MiB vs the 16 MiB XLA limit, driver bench
2026-08-19) -- and bench.py swallowed the failure. These tests fail
fast, on CPU, on any block-default change that would reintroduce it
(VERDICT round 4, demand #7)."""

import jax
import pytest

from sevennet_exp_tpu.model.build import build_e3_equivariant_model
from sevennet_exp_tpu.ops import pallas_conv
from sevennet_exp_tpu.presets import sevennet_0_config


def _conv_layers(config):
    model = build_e3_equivariant_model(config)
    return [l for _, l in model.layers
            if type(l).__name__ == 'IrrepsConvolution']


# the 97k bench config: deg_cap 32 (BENCH_r04.json), geom packed
# chunked path with agg_d = deg_cap; and the 1k dense config at the
# same cap. l3i5 covers the width > 2200 branch.
@pytest.mark.parametrize('deg_cap', [28, 32, 64])
def test_7net0_all_variants_fit_scoped_vmem(deg_cap):
    convs = _conv_layers(sevennet_0_config(species=['Na', 'Cl']))
    assert len(convs) == 5
    for i, conv in enumerate(convs):
        variants = {
            'plain': dict(agg_d=deg_cap),
            'ext_w': dict(agg_d=deg_cap, ext_w=True),
        }
        if conv.geom is not None:
            variants['geom'] = dict(agg_d=deg_cap, geom=conv.geom)
        for name, kw in variants.items():
            fused, _ = pallas_conv.make_fused_conv(
                conv.tp, conv.weight_nn, conv.si2, **kw)
            fwd_b, bwd_b = fused.blocks
            assert fused.scoped_vmem_fits(fwd_b, is_bwd=False), \
                f'layer {i} {name}: fwd block {fwd_b} busts scoped vmem'
            assert fused.scoped_vmem_fits(bwd_b, is_bwd=True), \
                f'layer {i} {name}: bwd block {bwd_b} busts scoped vmem'
            # legality: agg blocks must be multiples of agg_d with
            # 8-sublane-aligned node-row output blocks
            assert fwd_b % deg_cap == 0 and (fwd_b // deg_cap) % 8 == 0
            assert bwd_b % deg_cap == 0 and (bwd_b // deg_cap) % 8 == 0


def test_round4_oom_config_is_rejected():
    """The exact round-4 failure: geom bwd at 1024 rows on the widest
    7net-0 mid layer measured 28.19 MiB scoped -- the calibrated model
    must reject it and the factory must not choose it."""
    convs = _conv_layers(sevennet_0_config(species=['Na', 'Cl']))
    mid = convs[2]
    assert mid.geom is not None, 'geom spec missing on mid layer'
    fused, _ = pallas_conv.make_fused_conv(
        mid.tp, mid.weight_nn, mid.si2, agg_d=32, geom=mid.geom)
    assert not fused.scoped_vmem_fits(1024, is_bwd=True), (
        'calibration drift: the measured-OOM 1024-row geom bwd config '
        'now passes the fit model')
    assert fused.blocks[1] < 1024


def test_l3i5_variants_fit_scoped_vmem():
    from sevennet_exp_tpu.presets import sevennet_l3i5_config
    convs = _conv_layers(sevennet_l3i5_config(species=['Na', 'Cl']))
    for i, conv in enumerate(convs):
        fused, _ = pallas_conv.make_fused_conv(
            conv.tp, conv.weight_nn, conv.si2, agg_d=32)
        for b, is_bwd in zip(fused.blocks, (False, True)):
            assert fused.scoped_vmem_fits(b, is_bwd=is_bwd), \
                f'l3i5 layer {i}: block {b} (bwd={is_bwd})'
