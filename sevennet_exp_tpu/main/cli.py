"""Console entry points (reference sevenn/main/*, pyproject.toml:36-43).

Seven commands with the same names/flags semantics:
  sevenn              train from input.yaml
  sevenn_preset       print a preset yaml
  sevenn_graph_build  preprocess structure files into sevenn_data/
  sevenn_inference    evaluate a checkpoint on structures -> csv dir
  sevenn_get_model    deploy a checkpoint as a serving artifact
  sevenn_cp           checkpoint summary / yaml generation
  sevenn_patch_lammps explain the TPU serving path (no LAMMPS patching;
                      see runtime/ for the C++ PJRT host driver)
"""

from __future__ import annotations

import argparse
import os
import sys


def main_sevenn(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn', description='train a SevenNet-TPU potential'
    )
    p.add_argument('input_yaml', help='input.yaml (model/train/data)')
    p.add_argument('-w', '--working_dir', default=os.getcwd())
    p.add_argument('-s', '--screen', action='store_true',
                   help='also print log to stdout')
    p.add_argument('-d', '--distributed', action='store_true',
                   help='data-parallel over all visible devices')
    p.add_argument('--seed', type=int, default=None)
    args = p.parse_args(argv)

    from ..logger import Logger
    from ..parse_input import read_config_yaml
    from ..scripts.train import train_v2
    from .. import _keys as KEY

    Logger(screen=args.screen)
    config = read_config_yaml(args.input_yaml)
    if args.seed is not None:
        config[KEY.RANDOM_SEED] = args.seed
    if args.distributed:
        config[KEY.IS_DDP] = True
    train_v2(config, args.working_dir)


def main_preset(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_preset', description='print a preset input yaml'
    )
    p.add_argument('preset', choices=[
        'base', 'fine_tune', 'sevennet-0', 'sevennet-l3i5', 'multi_modal',
    ])
    args = p.parse_args(argv)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'presets', f'{args.preset}.yaml',
    )
    with open(path) as f:
        print(f.read())


def main_graph_build(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_graph_build',
        description='preprocess structure files into sevenn_data/',
    )
    p.add_argument('source', nargs='+')
    p.add_argument('cutoff', type=float)
    p.add_argument('-o', '--out', default=os.getcwd())
    p.add_argument('-n', '--name', default='graph')
    args = p.parse_args(argv)

    from ..data.dataset import SevenNetGraphDataset

    ds = SevenNetGraphDataset(
        cutoff=args.cutoff, root=args.out, files=args.source,
        processed_name=args.name, force_reload=True,
    )
    print(f'{len(ds)} graphs -> {ds.processed_path}')
    for k, v in ds.statistics.items():
        if not k.startswith('_') and isinstance(v, dict) and 'mean' in v:
            print(f'{k}: mean {v["mean"]:.6f} std {v["std"]:.6f}')


def main_inference(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_inference',
        description='evaluate a checkpoint on structure files',
    )
    p.add_argument('checkpoint')
    p.add_argument('target', nargs='+')
    p.add_argument('-o', '--output', default='sevenn_infer_result')
    p.add_argument('-b', '--batch', type=int, default=4)
    p.add_argument('-m', '--modal', default=None)
    args = p.parse_args(argv)

    from ..scripts.inference import inference

    inference(args.checkpoint, args.target, args.output,
              batch_size=args.batch, modal=args.modal)
    print(f'results written to {args.output}')


def main_get_model(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_get_model',
        description='deploy a checkpoint as a serving artifact',
    )
    p.add_argument('checkpoint')
    p.add_argument('-o', '--output', default=None)
    p.add_argument('-p', '--parallel', action='store_true')
    p.add_argument('--n-node', type=int, default=64,
                   help='node capacity of the exported program')
    p.add_argument('--n-edge', type=int, default=1024,
                   help='edge capacity of the exported program')
    args = p.parse_args(argv)

    from ..scripts.deploy import deploy, deploy_parallel

    if args.parallel:
        out = deploy_parallel(
            args.checkpoint, args.output or 'deployed_parallel'
        )
    else:
        out = deploy(args.checkpoint, args.output or 'deployed_serial',
                     n_node=args.n_node, n_edge=args.n_edge)
    print(f'deployed to {out}')


def main_cp(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_cp', description='checkpoint inspection tool'
    )
    p.add_argument('checkpoint')
    p.add_argument('--yaml', action='store_true',
                   help='print reproduce yaml')
    p.add_argument('--continue-yaml', dest='cont', action='store_true',
                   help='print continue yaml')
    p.add_argument('--append-modal', nargs='+', metavar='NAME',
                   help='append modalities, save to -o (reference '
                        'sevenn_cp --append_modal)')
    p.add_argument('--get-single-modal', metavar='NAME',
                   help='collapse onto one modality, save to -o')
    p.add_argument('-o', '--output', default=None,
                   help='output checkpoint path for modal operations')
    args = p.parse_args(argv)

    import yaml as _yaml

    from ..checkpoint import SevenNetCheckpoint

    cp = SevenNetCheckpoint(args.checkpoint)
    if args.append_modal or args.get_single_modal:
        out = args.output or 'checkpoint_converted.pkl'
        if args.append_modal:
            cp.append_modal(args.append_modal, out)
            print(f'appended modal(s) {args.append_modal} -> {out}')
        else:
            cp.to_single_modal(args.get_single_modal, out)
            print(f'collapsed onto {args.get_single_modal!r} -> {out}')
        return
    if args.yaml or args.cont:
        print(_yaml.safe_dump(
            cp.yaml_dict('continue' if args.cont else 'reproduce'),
            default_flow_style=False,
        ))
        return
    cfg = cp.config
    print(f'checkpoint: {cp.checkpoint_path}')
    print(f'epoch: {cp.epoch}')
    for k in ('cutoff', 'channel', 'lmax', 'is_parity',
              'num_convolution_layer', 'irreps_manual',
              'self_connection_type', '_number_of_species', 'version'):
        if k in cfg:
            print(f'{k}: {cfg[k]}')


def main_patch_lammps(argv=None):
    p = argparse.ArgumentParser(
        prog='sevenn_patch_lammps',
        description='stage the LAMMPS integration files '
                    '(pair style scaffold + exec library build)',
    )
    p.add_argument('lammps_src', nargs='?', default=None,
                   help='LAMMPS src/ directory to copy the pair style '
                        'into (omit to just print instructions)')
    args = p.parse_args(argv)

    # pair-style sources ship as package data (the analog of the
    # reference's patch_lammps.sh:96-140 grafting pair_e3gnn into a
    # LAMMPS tree)
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pair_src = os.path.join(pkg, 'lammps_pair')
    cmake_snippet = (
        '  # CMakeLists.txt additions (lammps/cmake):\n'
        '  target_link_libraries(lammps PRIVATE '
        '${SEVENN_EXEC_DIR}/libsevenn_exec.so)\n'
        '  target_include_directories(lammps PRIVATE '
        '${SEVENN_EXEC_DIR})\n'
        '  # or for the legacy make build, append to LMP_INC/LIB:\n'
        '  #   LMP_INC += -I$(SEVENN_EXEC_DIR)\n'
        '  #   LIB     += -L$(SEVENN_EXEC_DIR) -lsevenn_exec'
    )
    print(
        'SevenNet-TPU serves MD natively (sevennet_exp_tpu.md / '
        'sevennet_exp_tpu.parallel). To drive a deployed potential '
        'from LAMMPS instead:\n'
        '  1. sevenn_get_model <checkpoint> -o deployed_serial   '
        '(StableHLO serving artifact)\n'
        '  2. tools/build_sevenn_exec.sh   (builds '
        'libsevenn_exec.so, the numerically verified C API that '
        'executes the artifact via PJRT)\n'
        f'  3. sevenn_patch_lammps <lammps>/src   (copies the pair '
        'style from {pair_src})\n'
        '  4. rebuild LAMMPS with:\n'
        f'{cmake_snippet}\n'
        '  then: pair_style sevennet_tpu <artifact dir>; '
        'pair_coeff * * <comma-separated element symbols>\n'
        'Full walkthrough: runtime/README.md ("LAMMPS integration").'
    )
    if args.lammps_src:
        if not os.path.isdir(args.lammps_src):
            print(f'error: {args.lammps_src} is not a directory')
            return 1
        import shutil as _sh
        copied = []
        for fn in ('pair_sevennet_tpu.cpp', 'pair_sevennet_tpu.h'):
            src = os.path.join(pair_src, fn)
            dst = os.path.join(args.lammps_src, fn)
            if os.path.exists(dst):
                # back up like the reference patcher does
                _sh.copy(dst, dst + '.bak')
                print(f'backed up existing {fn} -> {fn}.bak')
            _sh.copy(src, dst)
            copied.append(fn)
        print(f'copied {", ".join(copied)} to {args.lammps_src}')
    return 0


if __name__ == '__main__':
    main_sevenn()
