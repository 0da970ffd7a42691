"""Decision microbench: can the CG contraction ride the MXU?

Compares, for one i1 class of the 7net-0 mid-layer uvu TP (all
instructions sharing the same input-irrep slice), three in-kernel
formulations producing the SAME weighted message block in cm layout
(rows (k, p, u), lanes = edges):

  st     current kernel: StT = CT-dot(sh); per-p X*St products +
         group-sum slice adds; x radial weight (VPU-elementwise CG).
  outer  proposed: Z[(m,n), (u,b)] = x-outer-sh built by sublane
         repeat/tile; ONE dense CG matmul (Sum d3, d1*f) @ Z on the
         MXU; radial weight; lane->sublane reshape back to cm rows.
  dots   the outer mode's MXU dots alone (cost floor of the matmuls).

The decision number is ns/edge-row. 'outer' wins only if the Mosaic
relayouts (reshape (d1*mul, B)->(d1, mul*B) and (Sum d3, mul*B) ->
(Sum d3*mul, B)) plus the small-M matmul cost less than the saved VPU
elementwise work (St products + group sums).

Usage: python tools/bench_cgmxu.py [i1] [E] [B]   (i1 in {1, 2})
"""

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
    from sevennet_exp_tpu.presets import sevennet_0_config
    from sevennet_exp_tpu.util import enable_compile_cache

    enable_compile_cache()

    i1_sel = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    config = sevennet_0_config(species=['Na', 'Cl'])
    model = build_e3_equivariant_model(config)
    conv = [l for n, l in model.layers
            if isinstance(l, IrrepsConvolution)][2]
    plan, _ = pallas_conv._tp_plan(conv.tp)
    s1 = conv.tp.irreps_in1.slices()
    x_off = s1[i1_sel].start
    instrs = [p for p in plan if p['x_off'] == x_off]
    mul = instrs[0]['mul']
    d1 = instrs[0]['dim1']
    f = conv.tp.irreps_in2.dim
    d3s = [p['dim3'] for p in instrs]
    d3tot = sum(d3s)
    wide = d3tot * mul
    print(f'i1={i1_sel}: d1={d1} mul={mul} f={f} instrs={len(instrs)} '
          f'd3s={d3s} wide={wide} E={E} B={B}')

    # CG operator C[(k,p) row, (m, n_global) col]
    C = np.zeros((d3tot, d1 * f), np.float32)
    r = 0
    for p_ins in instrs:
        so = p_ins['sh_off']
        for (m, n, p, c) in p_ins['nz']:
            C[r + p, m * f + so + n] = c
        r += p_ins['dim3']
    Cj = jnp.asarray(C.T)  # (d1*f, d3tot) for dotT

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    xT = jax.random.normal(k1, (d1 * mul, E), jnp.float32)
    shT = jax.random.normal(k2, (f, E), jnp.float32)
    wT = jax.random.normal(k3, (len(instrs) * mul, E), jnp.float32)

    dotT = pallas_conv._dotT
    rawdot = pallas_conv._raw_dot

    # ---- mode st: current cm formulation ------------------------------
    cts = []
    for p_ins in instrs:
        W = mul * d1
        ct = np.zeros((p_ins['dim2'], p_ins['dim3'] * W), np.float32)
        for (m, n, p, c) in p_ins['nz']:
            ct[n, p * W + m * mul:p * W + (m + 1) * mul] = c
        cts.append(ct)

    def st_kernel(xT_ref, shT_ref, wT_ref, *rest):
        ct_refs = rest[:len(instrs)]
        o_ref = rest[-1]
        xTb = xT_ref[...]
        shTb = shT_ref[...]
        wTb = wT_ref[...]
        row = 0
        for ki, p_ins in enumerate(instrs):
            dd3 = p_ins['dim3']
            so = p_ins['sh_off']
            d2 = p_ins['dim2']
            W = mul * d1
            StT = dotT(ct_refs[ki][...], shTb[so:so + d2, :])
            wn = wTb[ki * mul:(ki + 1) * mul, :]
            for p in range(dd3):
                prod = xTb * StT[p * W:(p + 1) * W, :]
                acc = prod[0:mul, :]
                for m in range(1, d1):
                    acc = acc + prod[m * mul:(m + 1) * mul, :]
                o_ref[(row + p) * mul:(row + p + 1) * mul, :] = acc * wn
            row += dd3

    # ---- mode outer: MXU CG matmul ------------------------------------
    def outer_kernel(xT_ref, shT_ref, wT_ref, *rest):
        cj_ref = rest[len(instrs)]
        o_ref = rest[-1]
        xTb = xT_ref[...]                       # (d1*mul, B)
        shTb = shT_ref[...]                     # (f, B)
        wTb = wT_ref[...]                       # (n_instr*mul, B)
        # relayout in: (d1*mul, B) -> (d1, mul*B)
        Xr = xTb.reshape(d1, mul * B)
        # sh broadcast over u: (f, B) -> (f, mul*B), u-major lanes
        Shr = jnp.broadcast_to(
            shTb.reshape(f, 1, B), (f, mul, B)
        ).reshape(f, mul * B)
        # Z rows (m, n): repeat X rows f times, tile Sh rows d1 times
        Zx = pltpu.repeat(Xr, f, axis=0) if hasattr(pltpu, 'repeat') \
            else jnp.repeat(Xr, f, axis=0)
        Zs = jnp.concatenate([Shr] * d1, axis=0) if d1 > 1 else Shr
        Z = Zx * Zs                             # (d1*f, mul*B)
        out0 = dotT(cj_ref[...], Z)             # (d3tot, mul*B)
        # radial weight per (k, u): wr[k] = (1, mul*B)
        pieces = []
        row = 0
        for ki, p_ins in enumerate(instrs):
            wr = wTb[ki * mul:(ki + 1) * mul, :].reshape(1, mul * B)
            dd3 = p_ins['dim3']
            pieces.append(out0[row:row + dd3, :] * wr)
            row += dd3
        outw = jnp.concatenate(pieces, axis=0)  # (d3tot, mul*B)
        # relayout out: (d3tot, mul*B) -> (d3tot*mul, B)
        o_ref[...] = outw.reshape(wide, B)

    # ---- mode dots: matmul cost floor ---------------------------------
    def dots_kernel(xT_ref, shT_ref, wT_ref, *rest):
        cj_ref = rest[len(instrs)]
        o_ref = rest[-1]
        # Z at zero build cost (single broadcast), then the same CG
        # matmul and output write as 'outer' -- isolates the dot cost.
        xTb = xT_ref[...]
        Z = jnp.broadcast_to(
            xTb[0:1, :].reshape(1, 1, B), (d1 * f, mul, B)
        ).reshape(d1 * f, mul * B)
        out0 = dotT(cj_ref[...], Z)             # (d3tot, mul*B)
        o_ref[...] = jnp.zeros_like(o_ref)
        # consume both ends of out0 (keeps the full dot alive) without
        # paying the lane->sublane relayout
        o_ref[0:d3tot, :] = out0[:, 0:B] + out0[:, (mul - 1) * B:]

    def run(kernel, label):
        consts = [jnp.asarray(c) for c in cts] + [Cj]
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((wide, E), jnp.float32),
            grid=(E // B,),
            in_specs=[
                pl.BlockSpec((d1 * mul, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((len(instrs) * mul, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(c.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for c in consts
            ],
            out_specs=pl.BlockSpec((wide, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        from timing import slope_time

        def stepper(z):
            y = call(z, shT, wT, *consts)
            return z + 1e-30 * jnp.sum(y[:1, :1])

        try:
            y = jax.jit(lambda z: call(z, shT, wT, *consts))(xT)
            jax.block_until_ready(y)
            dt = slope_time(stepper, xT)
        except Exception as e:
            print(f'{label:6s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:300]}')
            return None, None
        print(f'{label:6s}: {dt * 1e3:8.3f} ms  '
              f'{dt / E * 1e9:7.2f} ns/row   (slope-timed)')
        return y, dt

    y_st, _ = run(st_kernel, 'st')
    y_outer, _ = run(outer_kernel, 'outer')
    run(dots_kernel, 'dots')

    # numpy oracle on the first block: which kernel is wrong?
    xTn = np.asarray(xT[:, :B])
    shn = np.asarray(shT[:, :B])
    wn_ = np.asarray(wT[:, :B])
    ref = np.zeros((wide, B), np.float32)
    row = 0
    for ki, p_ins in enumerate(instrs):
        so = p_ins['sh_off']
        for (m, n, p, c) in p_ins['nz']:
            ref[(row + p) * mul:(row + p + 1) * mul, :] += (
                c * xTn[m * mul:(m + 1) * mul, :]
                * shn[so + n:so + n + 1, :]
            )
        for p in range(p_ins['dim3']):
            ref[(row + p) * mul:(row + p + 1) * mul, :] *= (
                wn_[ki * mul:(ki + 1) * mul, :]
            )
        row += p_ins['dim3']
    for name, y in (('st', y_st), ('outer', y_outer)):
        if y is not None:
            err = float(np.abs(np.asarray(y[:, :B]) - ref).max())
            print(f'max|{name}-oracle| = {err:.3e}  '
                  f'(max|oracle| = {np.abs(ref).max():.3e})')


if __name__ == '__main__':
    main()
