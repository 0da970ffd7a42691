"""Per-piece cost breakdown of the fused agg conv kernel (cm mode).

Builds stripped variants of the mid-layer forward kernel with pieces
replaced by near-zero-cost stand-ins, and reports the DELTA each piece
costs inside the real kernel context (Mosaic scheduling included):

  full        the production kernel body (MLP + CG + w + agg + si2)
  -mlp        radial weights = first emb column broadcast (no MLP dots)
  -cg         CG accs = x slices (no St dots, no products/group-sums)
  -w          no radial-weight multiply
  -agg        no aggregation matmul (si2 on per-edge rows, N=B lanes)
  -si2        skip si2 dots (write aggregated cat directly, padded)
  -transpose  inputs pre-transposed outside the kernel (feature-major
              HBM layout), no in-kernel .T

Usage: python tools/bench_pieces.py [E] [block]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sevennet_exp_tpu.model.build import build_e3_equivariant_model
    from sevennet_exp_tpu.model.layers import IrrepsConvolution
    from sevennet_exp_tpu.ops import pallas_conv
    from sevennet_exp_tpu.ops.normalize import NORMALIZE2MOM_CST
    from sevennet_exp_tpu.presets import sevennet_0_config
    from sevennet_exp_tpu.util import enable_compile_cache

    enable_compile_cache()

    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    D = 32
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    conv = [l for n, l in model.layers
            if isinstance(l, IrrepsConvolution)][2]
    tp, mlp_spec, si2 = conv.tp, conv.weight_nn, conv.si2
    plan, w_numel = pallas_conv._tp_plan(tp)
    groups, d_out = pallas_conv._si2_groups(tp, si2)
    d1 = tp.irreps_in1.dim
    f = tp.irreps_in2.dim
    r = mlp_spec.hs[0]
    act_name = mlp_spec.act
    n_si2 = len(si2.paths)

    # fw constant inputs exactly as the production kernel builds them
    # (on the plan dicts actually referenced by `groups`)
    fw_inputs = []
    seen = set()
    for grp in groups:
        for p_ins, _row in grp['ks']:
            if id(p_ins) in seen:
                continue
            seen.add(id(p_ins))
            if p_ins['dim1'] >= 2:
                p_ins['ct'] = len(fw_inputs)
                fw_inputs.append(pallas_conv._fw_ct(p_ins))
            else:
                p_ins['ct'] = None
    n_fw = len(fw_inputs)

    dotT = pallas_conv._dotT
    _dot = pallas_conv._dot

    import math

    import jax.nn as jnn

    def mlp_forward(emb, w0, w1, w2):
        cst = NORMALIZE2MOM_CST[act_name]
        act = jnn.silu
        pre0 = _dot(emb, w0 / math.sqrt(w0.shape[0]))
        h0 = act(pre0) * cst
        pre1 = _dot(h0, w1 / math.sqrt(w1.shape[0]))
        h1 = act(pre1) * cst
        return _dot(h1, w2 / math.sqrt(w2.shape[0]))

    def make_kernel(skip=()):
        def kernel(xg_ref, sh_ref, emb_ref, ms_ref,
                   w0_ref, w1_ref, w2_ref, *rest):
            si2_refs = rest[:n_si2]
            fw_refs = rest[n_si2:n_si2 + n_fw]
            out_ref = rest[-1]
            b = xg_ref.shape[0]
            if 'mlp' in skip:
                w_rad = jnp.broadcast_to(emb_ref[...][:, 0:1],
                                         (b, w_numel))
            else:
                w_rad = mlp_forward(emb_ref[...], w0_ref[...],
                                    w1_ref[...], w2_ref[...])
            if 'transpose' in skip:
                # emulate pre-transposed inputs: treat refs as already
                # feature-major (shapes swapped by the caller)
                xgT = xg_ref[...]
                shT = sh_ref[...]
            else:
                xgT = xg_ref[...].T
                shT = sh_ref[...].T
            w_radT = (w_rad * ms_ref[...]).T if 'transpose' not in skip \
                else (w_rad * ms_ref[...]).T
            rows = b // D
            AT = (jax.lax.broadcasted_iota(jnp.int32, (b, rows), 0) // D
                  == jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
                  ).astype(jnp.float32)
            out_blocks = {}
            for grp in groups:
                W = si2_refs[grp['path']][...] * grp['alpha']
                mo, oo = grp['mo'], grp['out_off']
                accw = []
                for p_ins, _row in grp['ks']:
                    mul, wo = p_ins['mul'], p_ins['w_off']
                    wnT = w_radT[wo:wo + mul, :]
                    if 'cg' in skip:
                        xo = p_ins['x_off']
                        acc = [xgT[xo:xo + mul, :]] * p_ins['dim3']
                    else:
                        acc = pallas_conv._tp_plan  # placeholder
                        acc = cg_acc_cm(xgT, shT, fw_refs, p_ins)
                    if 'w' in skip:
                        accw.append([a for a in acc])
                    else:
                        accw.append([a * wnT for a in acc])
                for p in range(grp['dim3']):
                    catT = (jnp.concatenate([aw[p] for aw in accw],
                                            axis=0)
                            if len(accw) > 1 else accw[0][p])
                    if 'agg' not in skip:
                        catT = _dot(catT, AT)
                    if 'si2' in skip:
                        o = catT[0:min(mo, catT.shape[0]), :]
                        if o.shape[0] < mo:
                            o = jnp.concatenate([
                                o, jnp.zeros((mo - o.shape[0],
                                              o.shape[1]), jnp.float32)
                            ], axis=0)
                    else:
                        o = dotT(W, catT)
                    k = (oo + p * mo, mo)
                    out_blocks[k] = (o if k not in out_blocks
                                     else out_blocks[k] + o)
            ncols = next(iter(out_blocks.values())).shape[1]
            out_ref[...] = pallas_conv_assemble(out_blocks, d_out,
                                                ncols).T
        return kernel

    # local copies of the module-level helpers (closures can't see the
    # factory internals)
    def _gsum_cm(v, mul, dd1):
        acc = v[0:mul, :]
        for m in range(1, dd1):
            acc = acc + v[m * mul:(m + 1) * mul, :]
        return acc

    def cg_acc_cm(xgT, shT, fw_refs, p_ins):
        mul = p_ins['mul']
        xo, so = p_ins['x_off'], p_ins['sh_off']
        if p_ins['ct'] is not None:
            dd1, dd3 = p_ins['dim1'], p_ins['dim3']
            W = mul * dd1
            XT = xgT[xo:xo + W, :]
            StT = dotT(fw_refs[p_ins['ct']][...],
                       shT[so:so + p_ins['dim2'], :])
            return [_gsum_cm(XT * StT[p * W:(p + 1) * W, :], mul, dd1)
                    for p in range(dd3)]
        cache = {}
        acc = [None] * p_ins['dim3']
        for (m, n, p, c) in p_ins['nz']:
            if (m, n) not in cache:
                cache[(m, n)] = (xgT[xo + m * mul:xo + (m + 1) * mul, :]
                                 * shT[so + n:so + n + 1, :])
            t = cache[(m, n)] * c
            acc[p] = t if acc[p] is None else acc[p] + t
        return [a if a is not None else
                jnp.zeros((mul, xgT.shape[1]), jnp.float32) for a in acc]

    def pallas_conv_assemble(acc, total, b):
        import jax.numpy as jnp
        pieces = []
        pos = 0
        for (off, w) in sorted(acc):
            if off > pos:
                pieces.append(jnp.zeros((off - pos, b), jnp.float32))
            pieces.append(acc[(off, w)])
            pos = off + w
        if pos < total:
            pieces.append(jnp.zeros((total - pos, b), jnp.float32))
        return (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                else pieces[0])

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xg = jax.random.normal(ks[0], (E, d1), jnp.float32)
    sh = jax.random.normal(ks[1], (E, f), jnp.float32)
    emb = jax.random.normal(ks[2], (E, r), jnp.float32)
    ms = jnp.ones((E, 1), jnp.float32)
    mlp_ws = tuple(
        jax.random.normal(ks[3 + i], (mlp_spec.hs[i], mlp_spec.hs[i + 1]))
        for i in range(3)
    )
    si2_ws = tuple(
        jax.random.normal(ks[6], (si2.paths[n][2], si2.paths[n][3]))
        for n in range(n_si2)
    )
    fw_consts = [jnp.asarray(c) for c in fw_inputs]

    def especs(widths, blk):
        return [pl.BlockSpec((blk, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) for w in widths]

    def wspecs(shapes):
        return [pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                             memory_space=pltpu.VMEM) for s in shapes]

    def run(skip, label):
        kernel = make_kernel(skip)
        out_rows = block // D
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((E // D, d_out), jnp.float32),
            grid=(E // block,),
            in_specs=(
                especs([d1, f, r, 1], block)
                + wspecs([w.shape for w in mlp_ws])
                + wspecs([w.shape for w in si2_ws])
                + wspecs([c.shape for c in fw_consts])
            ),
            out_specs=especs([d_out], out_rows)[0],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        from timing import slope_time

        def stepper(z):
            y = call(z, sh, emb, ms, *mlp_ws, *si2_ws, *fw_consts)
            return z + 1e-30 * jnp.sum(y[:1, :1])

        try:
            jax.block_until_ready(jax.jit(stepper)(xg))
            dt = slope_time(stepper, xg)
        except Exception as e:
            print(f'{label:12s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}')
            return None
        print(f'{label:12s}: {dt * 1e3:8.3f} ms  '
              f'{dt / E * 1e9:6.2f} ns/row   (slope-timed)')
        return dt

    base = run((), 'full')
    for piece in ('mlp', 'cg', 'w', 'agg', 'si2'):
        dt = run((piece,), f'-{piece}')
        if base and dt:
            print(f'{"":12s}  -> piece cost '
                  f'{(base - dt) / E * 1e9:6.2f} ns/row')


if __name__ == '__main__':
    main()
