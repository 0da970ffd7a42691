"""Declarative model assembly (reference sevenn/model_build.py:384-576).

Produces the same layer graph and parameter structure as the reference's
``build_E3_equivariant_model`` so that configs and checkpoints map 1:1:

edge_embedding -> onehot_idx_to_onehot -> onehot_to_feature_x ->
[T x (self_connection_intro | self_interaction_1 -> convolution ->
self_interaction_2 | self_connection_outro -> equivariant_gate)] ->
reduce_input_to_hidden -> reduce_hidden_to_energy -> rescale_atomic_energy
-> reduce_total_enegy; force/stress via jax.grad (model.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

from .. import _const
from .. import _keys as KEY
from ..irreps import Irrep, Irreps, infer_irreps_out
from ..ops.radial import BesselBasis, PolynomialCutoff, XPLORCutoff
from ..ops.tensor_product import (
    FullyConnectedNetSpec,
    FullyConnectedTPSpec,
    GateSpec,
    LinearSpec,
    UVUTensorProductSpec,
)
from . import layers as L
from .model import SevenNetModel


def init_edge_embedding(config) -> L.EdgeEmbedding:
    cutoff = config[KEY.CUTOFF]
    env_cfg = dict(config[KEY.CUTOFF_FUNCTION])
    env_name = env_cfg.pop(KEY.CUTOFF_FUNCTION_NAME)
    if env_name == 'poly_cut':
        env = PolynomialCutoff(
            cutoff=cutoff, p=env_cfg.get(KEY.POLY_CUT_P, 6)
        )
    elif env_name == 'XPLOR':
        env = XPLORCutoff(cutoff=cutoff, cutoff_on=env_cfg['cutoff_on'])
    else:
        raise ValueError(f'unknown cutoff function {env_name}')

    rbf_cfg = dict(config[KEY.RADIAL_BASIS])
    rbf_name = rbf_cfg.pop(KEY.RADIAL_BASIS_NAME)
    if rbf_name != 'bessel':
        raise ValueError(f'unknown radial basis {rbf_name}')
    basis = BesselBasis(
        cutoff=cutoff,
        num_basis=rbf_cfg.get(KEY.BESSEL_BASIS_NUM, 8),
        trainable=rbf_cfg.get('trainable_coeff', True),
    )

    lmax_edge = config[KEY.LMAX]
    if config.get(KEY.LMAX_EDGE, -1) > 0:
        lmax_edge = config[KEY.LMAX_EDGE]
    parity = -1 if config[KEY.IS_PARITY] else 1

    if config.get(KEY.MULTI_CUTOFF):
        # per-layer cutoff radii (reference model_build.py:87-103);
        # masked static edge list instead of per-cutoff filtered lists
        cutoffs = sorted(set(float(c) for c in config[KEY.MULTI_CUTOFF]))
        if cutoffs[-1] > float(cutoff) + 1e-9:
            # graphs are only ever built at the global cutoff — a larger
            # per-layer value would be silently truncated
            raise ValueError(
                f'multi_cutoff {cutoffs[-1]} exceeds cutoff {cutoff}; '
                f'set cutoff to the largest per-layer value')
        bases, envs = [], []
        for c in cutoffs:
            bases.append(BesselBasis(
                cutoff=c,
                num_basis=rbf_cfg.get(KEY.BESSEL_BASIS_NUM, 8),
                trainable=rbf_cfg.get('trainable_coeff', True),
            ))
            if env_name == 'XPLOR':
                # reference sets r_on = cutoff - 1 per sub-cutoff
                # (edge_embedding.py:245-247)
                envs.append(XPLORCutoff(cutoff=c, cutoff_on=c - 1.0))
            else:
                envs.append(PolynomialCutoff(
                    cutoff=c, p=env_cfg.get(KEY.POLY_CUT_P, 6)))
        return L.MultiCutoffEdgeEmbedding(
            bases=tuple(bases),
            cutoff_fns=tuple(envs),
            lmax_edge=lmax_edge,
            parity=parity,
            normalize_sph=config.get(KEY._NORMALIZE_SPH, True),
        )

    return L.EdgeEmbedding(
        basis=basis,
        cutoff_fn=env,
        lmax_edge=lmax_edge,
        parity=parity,
        normalize_sph=config.get(KEY._NORMALIZE_SPH, True),
    )


def init_shift_scale(config):
    shift, scale = config[KEY.SHIFT], config[KEY.SCALE]
    train = config[KEY.TRAIN_SHIFT_SCALE]
    type_map = config[KEY.TYPE_MAP]
    n_types = len(type_map)

    def _as_list(s, default):
        # resolve universal-length lists against the type map
        if hasattr(s, 'tolist'):
            s = s.tolist()
        if isinstance(s, (int, float)):
            return [float(s)] * n_types
        if isinstance(s, list):
            if len(s) == 1:
                return [float(s[0])] * n_types
            if len(s) == n_types:
                return [float(v) for v in s]
            if len(s) == _const.NUM_UNIV_ELEMENT:
                return [
                    float(s[z])
                    for z in sorted(type_map, key=lambda x: type_map[x])
                ]
            raise ValueError(f'bad shift/scale length {len(s)}')
        raise ValueError(f'bad shift/scale {s!r}')

    if config.get(KEY.USE_MODALITY, False) and (
        config.get(KEY.USE_MODAL_WISE_SHIFT, False)
        or config.get(KEY.USE_MODAL_WISE_SCALE, False)
    ):
        modal_map = config[KEY.MODAL_MAP]
        n_modal = len(modal_map)

        def _modal(s, use_mw):
            if isinstance(s, dict):
                s = [s[k] for k in sorted(s, key=lambda x: modal_map[x])]
            if use_mw:
                if isinstance(s, (int, float)):
                    return tuple(tuple([float(s)] * n_types)
                                 for _ in range(n_modal))
                if isinstance(s, list) and all(
                    isinstance(v, (int, float)) for v in s
                ) and len(s) == n_modal:
                    return tuple(tuple([float(v)] * n_types) for v in s)
                if isinstance(s, list):
                    if all(isinstance(v, list) for v in s):
                        return tuple(tuple(_as_list(v, None)) for v in s)
                    return tuple(tuple(_as_list(s, None))
                                 for _ in range(n_modal))
                raise ValueError(f'bad modal shift/scale {s!r}')
            return tuple(_as_list(s, None))

        return L.ModalWiseRescale(
            shift=_modal(shift, config.get(KEY.USE_MODAL_WISE_SHIFT, False)),
            scale=_modal(scale, config.get(KEY.USE_MODAL_WISE_SCALE, False)),
            use_modal_wise_shift=config.get(KEY.USE_MODAL_WISE_SHIFT, False),
            use_modal_wise_scale=config.get(KEY.USE_MODAL_WISE_SCALE, False),
            train_shift_scale=train,
        )

    if isinstance(shift, float) and isinstance(scale, float):
        return L.Rescale(shift=shift, scale=scale, train_shift_scale=train)
    return L.SpeciesWiseRescale(
        shift=tuple(_as_list(shift, 0.0)),
        scale=tuple(_as_list(scale, 1.0)),
        train_shift_scale=train,
    )


def nequip_interaction_block(
    t: int,
    irreps_x: Irreps,
    irreps_filter: Irreps,
    irreps_out_tp: Irreps,
    irreps_out: Irreps,
    weight_nn_layers: List[int],
    conv_denominator: float,
    train_conv_denominator: bool,
    self_connection_type: str,
    act_scalar: Dict[int, str],
    act_gate: Dict[int, str],
    act_radial: str,
    bias_in_linear: bool,
    num_species: int,
    use_modal_self_inter_intro: bool = False,
    use_modal_self_inter_outro: bool = False,
    num_modalities: int = 0,
    key_weight_input: str = KEY.EDGE_EMBEDDING,
    key_mask: str = KEY.EDGE_MASK,
    geom=None,
) -> List[Tuple[str, Any]]:
    """One NequIP block (reference sevenn/nn/interaction_blocks.py:12-88).
    key_weight_input/key_mask select per-layer cutoff channels under
    multi_cutoff (reference interaction_blocks.py:54-60)."""
    block: List[Tuple[str, Any]] = []
    irreps_node_attr = Irreps(f'{num_species}x0e')

    gate_spec = GateSpec(irreps_out, act_scalar, act_gate)
    irreps_for_gate_in = gate_spec.irreps_in

    if self_connection_type == 'nequip':
        block.append((
            f'{t}_self_connection_intro',
            L.SelfConnectionIntro(FullyConnectedTPSpec(
                irreps_x, irreps_node_attr, irreps_for_gate_in
            )),
        ))
    elif self_connection_type == 'linear':
        block.append((
            f'{t}_self_connection_intro',
            L.SelfConnectionLinearIntro(LinearSpec(
                irreps_x, irreps_for_gate_in, biases=bias_in_linear
            )),
        ))
    else:
        raise ValueError(self_connection_type)

    si1_modal = num_modalities if use_modal_self_inter_intro else 0
    si1_in = irreps_x
    if si1_modal > 1:
        si1_in = si1_in + Irreps(f'{si1_modal}x0e')
    block.append((
        f'{t}_self_interaction_1',
        L.IrrepsLinear(
            LinearSpec(si1_in, irreps_x, biases=bias_in_linear),
            key_in=KEY.NODE_FEATURE,
            num_modalities=si1_modal,
        ),
    ))

    tp_spec = UVUTensorProductSpec(irreps_x, irreps_filter, irreps_out_tp)
    weight_nn = FullyConnectedNetSpec(
        hs=tuple(weight_nn_layers + [tp_spec.weight_numel]), act=act_radial
    )
    si2_modal = num_modalities if use_modal_self_inter_outro else 0
    if si2_modal > 1:
        # modal one-hot is per-node: keep self_interaction_2 a separate
        # node-level linear (no conv fusion)
        block.append((
            f'{t}_convolution',
            L.IrrepsConvolution(
                tp=tp_spec, weight_nn=weight_nn, si2=None,
                denominator=conv_denominator,
                train_denominator=train_conv_denominator,
                key_weight_input=key_weight_input,
                key_mask=key_mask,
            ),
        ))
        si2_in = tp_spec.irreps_out + Irreps(f'{si2_modal}x0e')
        block.append((
            f'{t}_self_interaction_2',
            L.IrrepsLinear(
                LinearSpec(si2_in, irreps_for_gate_in,
                           biases=bias_in_linear),
                key_in=KEY.NODE_FEATURE,
                num_modalities=si2_modal,
            ),
        ))
    else:
        si2_spec = LinearSpec(
            tp_spec.irreps_out, irreps_for_gate_in, biases=bias_in_linear
        )
        block.append((
            f'{t}_convolution',
            L.IrrepsConvolution(
                tp=tp_spec, weight_nn=weight_nn, si2=si2_spec,
                denominator=conv_denominator,
                train_denominator=train_conv_denominator,
                key_weight_input=key_weight_input,
                key_mask=key_mask,
                geom=geom,
            ),
        ))

    block.append((f'{t}_self_connection_outro', L.SelfConnectionOutro()))
    block.append((f'{t}_equivariant_gate', L.EquivariantGate(gate_spec)))
    return block


def build_e3_equivariant_model(config: Dict[str, Any]) -> SevenNetModel:
    """Reference model_build.py:384-576, single jitted program.

    Output contract: PRED_TOTAL_ENERGY (G,), ATOMIC_ENERGY (N,1),
    PRED_FORCE (N,3), PRED_STRESS (G,6) Voigt xx yy zz xy yz zx.
    """
    cfg = dict(_const.model_defaults(config))
    cfg.update(config)
    config = cfg

    layers: List[Tuple[str, Any]] = []

    cutoff = config[KEY.CUTOFF]
    num_species = config[KEY.NUM_SPECIES]
    feature_multiplicity = config[KEY.NODE_FEATURE_MULTIPLICITY]
    num_conv = config[KEY.NUM_CONVOLUTION]
    use_bias = config[KEY.USE_BIAS_IN_LINEAR]
    use_modality = config.get(KEY.USE_MODALITY, False)
    num_modalities = config.get(KEY.NUM_MODALITIES, 0)

    lmax_node = config[KEY.LMAX]
    if config.get(KEY.LMAX_NODE, -1) > 0:
        lmax_node = config[KEY.LMAX_NODE]

    act_radial = config[KEY.ACTIVATION_RADIAL]
    p_map = {'e': 1, 'o': -1}
    act_scalar = {p_map[k]: v for k, v in config[KEY.ACTIVATION_SCARLAR].items()}
    act_gate = {p_map[k]: v for k, v in config[KEY.ACTIVATION_GATE].items()}

    irreps_manual = None
    if config.get(KEY.IRREPS_MANUAL, False) is not False:
        irreps_manual = [Irreps(i) for i in config[KEY.IRREPS_MANUAL]]
        assert len(irreps_manual) == num_conv + 1, 'invalid irreps_manual'

    conv_denominator = config[KEY.CONV_DENOMINATOR]
    if not isinstance(conv_denominator, list):
        conv_denominator = [conv_denominator] * num_conv

    edge_embedding = init_edge_embedding(config)
    irreps_filter = edge_embedding.irreps_out
    radial_basis_num = (
        edge_embedding.bases[0].num_basis
        if isinstance(edge_embedding, L.MultiCutoffEdgeEmbedding)
        else edge_embedding.basis.num_basis
    )
    layers.append(('edge_embedding', edge_embedding))

    # geometry-fused conv kernels (ops/pallas_conv.GeomSpec): Bessel +
    # cutoff + SH computed inside the kernel, backward emits
    # d(edge_vec) directly. Single-cutoff standard embedding only;
    # multi_cutoff layers keep the XLA edge pipeline.
    geom_spec = None
    if (isinstance(edge_embedding, L.EdgeEmbedding)
            and edge_embedding.normalize_sph):
        from ..ops import pallas_conv as _pc
        _cf = edge_embedding.cutoff_fn
        geom_spec = _pc.GeomSpec(
            cutoff=float(edge_embedding.basis.cutoff),
            num_basis=int(edge_embedding.basis.num_basis),
            lmax=int(edge_embedding.lmax_edge),
            cutoff_kind=('xplor' if isinstance(_cf, XPLORCutoff)
                         else 'poly'),
            cutoff_p=float(getattr(_cf, 'p', 6)),
            cutoff_on=float(getattr(_cf, 'cutoff_on', 0.0)),
        )

    one_hot_irreps = Irreps(f'{num_species}x0e')
    irreps_x = (
        Irreps(f'{feature_multiplicity}x0e')
        if irreps_manual is None else irreps_manual[0]
    )

    layers.append((
        'onehot_idx_to_onehot',
        L.OnehotEmbedding(num_classes=num_species),
    ))
    if use_modality:
        layers.append((
            'one_hot_modality',
            L.OnehotEmbedding(
                num_classes=num_modalities,
                key_x=KEY.MODAL_TYPE,
                key_out=KEY.MODAL_ATTR,
                key_save=None,
                key_additional=None,
            ),
        ))

    ne_modal = (
        num_modalities
        if use_modality and config.get(KEY.USE_MODAL_NODE_EMBEDDING, False)
        else 0
    )
    ne_in = one_hot_irreps
    if ne_modal > 1:
        ne_in = ne_in + Irreps(f'{ne_modal}x0e')
    layers.append((
        'onehot_to_feature_x',
        L.IrrepsLinear(
            LinearSpec(ne_in, irreps_x, biases=use_bias),
            key_in=KEY.NODE_FEATURE,
            num_modalities=ne_modal,
        ),
    ))

    weight_nn_layers = [radial_basis_num] + list(
        config[KEY.CONVOLUTION_WEIGHT_NN_HIDDEN_NEURONS]
    )

    for t in range(num_conv):
        parity_mode = 'full'
        lmax_t = lmax_node
        if t == num_conv - 1:
            lmax_t = 0
            parity_mode = 'even'
        irreps_out = (
            infer_irreps_out(
                irreps_x, irreps_filter, lmax_t, parity_mode,
                fix_multiplicity=feature_multiplicity,
            )
            if irreps_manual is None else irreps_manual[t + 1]
        )
        irreps_out_tp = infer_irreps_out(
            irreps_x, irreps_filter, irreps_out.lmax, parity_mode, False
        )
        layers.extend(nequip_interaction_block(
            t=t,
            irreps_x=irreps_x,
            irreps_filter=irreps_filter,
            irreps_out_tp=irreps_out_tp,
            irreps_out=irreps_out,
            weight_nn_layers=weight_nn_layers,
            conv_denominator=conv_denominator[t],
            train_conv_denominator=config[KEY.TRAIN_DENOMINTAOR],
            self_connection_type=config[KEY.SELF_CONNECTION_TYPE],
            act_scalar=act_scalar,
            act_gate=act_gate,
            act_radial=act_radial,
            bias_in_linear=use_bias,
            num_species=num_species,
            geom=geom_spec,
            use_modal_self_inter_intro=use_modality
            and config.get(KEY.USE_MODAL_SELF_INTER_INTRO, False),
            use_modal_self_inter_outro=use_modality
            and config.get(KEY.USE_MODAL_SELF_INTER_OUTRO, False),
            num_modalities=num_modalities,
            key_weight_input=(
                KEY.EDGE_EMBEDDING + str(float(config[KEY.MULTI_CUTOFF][t]))
                if config.get(KEY.MULTI_CUTOFF) else KEY.EDGE_EMBEDDING
            ),
            key_mask=(
                KEY.EDGE_MASK + str(float(config[KEY.MULTI_CUTOFF][t]))
                if config.get(KEY.MULTI_CUTOFF) else KEY.EDGE_MASK
            ),
        ))
        irreps_x = irreps_out

    # feature reduce (reference model_build.py:116-157)
    if not config.get(KEY.READOUT_AS_FCN, False):
        hidden_irreps = Irreps([(irreps_x.dim // 2, Irrep(0, 1))])
        ro_modal = (
            num_modalities
            if use_modality and config.get(KEY.USE_MODAL_OUTPUT_BLOCK, False)
            else 0
        )
        ro_in = irreps_x
        if ro_modal > 1:
            ro_in = ro_in + Irreps(f'{ro_modal}x0e')
        layers.append((
            'reduce_input_to_hidden',
            L.IrrepsLinear(
                LinearSpec(ro_in, hidden_irreps, biases=use_bias),
                key_in=KEY.NODE_FEATURE,
                num_modalities=ro_modal,
            ),
        ))
        layers.append((
            'reduce_hidden_to_energy',
            L.IrrepsLinear(
                LinearSpec(
                    hidden_irreps, Irreps([(1, Irrep(0, 1))]), biases=use_bias
                ),
                key_in=KEY.NODE_FEATURE,
                key_out=KEY.SCALED_ATOMIC_ENERGY,
            ),
        ))
    else:
        layers.append((
            'readout_FCN',
            L.FCNReadout(FullyConnectedNetSpec(
                hs=tuple(
                    [irreps_x.dim]
                    + list(config[KEY.READOUT_FCN_HIDDEN_NEURONS]) + [1]
                ),
                act=config[KEY.READOUT_FCN_ACTIVATION],
            )),
        ))

    layers.append(('rescale_atomic_energy', init_shift_scale(config)))
    layers.append(('reduce_total_enegy', L.AtomReduce()))

    return SevenNetModel(
        layers=tuple(layers),
        config=config,
        type_map=dict(config[KEY.TYPE_MAP]),
        cutoff=cutoff,
        modal_map=dict(config.get(KEY.MODAL_MAP) or {}),
    )
