"""Core equivariant-op tests: wigner 3j (incl. golden e3nn buffers stored in
the reference's committed checkpoint), spherical harmonics, irreps algebra,
and TP normalization conventions."""

import os

import numpy as np
import pytest

from sevennet_exp_tpu.irreps import Irrep, Irreps, infer_irreps_out
from sevennet_exp_tpu.ops.spherical import sh_coefficients, spherical_harmonics
from sevennet_exp_tpu.ops.wigner import real_wigner_D, wigner_3j

CP0 = '/root/reference/tests/data/checkpoints/cp_0.pth'


def test_irreps_parse_and_dims():
    irr = Irreps('128x0e+64x1e+32x2e')
    assert irr.dim == 128 + 64 * 3 + 32 * 5
    assert irr.num_irreps == 224
    assert irr.lmax == 2
    assert Irrep(0, 1) in irr
    assert Irrep(1, -1) not in irr


def test_irreps_sort_order():
    # e3nn canonical: 0e < 0o < 1o < 1e < 2e < 2o
    irr = Irreps('1x2o+1x0o+1x1e+1x0e+1x1o+1x2e')
    srt, p, inv = irr.sort()
    assert repr(srt) == '1x0e+1x0o+1x1o+1x1e+1x2e+1x2o'
    # p[old] = new
    assert [srt[p[i]].ir for i in range(len(irr))] == [mi.ir for mi in irr]


def test_infer_irreps_out():
    x = Irreps('4x0e')
    f = Irreps('1x0e+1x1o+1x2e')
    out = infer_irreps_out(x, f, 2, 'full', fix_multiplicity=4)
    assert repr(out) == '4x0e+4x1o+4x2e'
    out = infer_irreps_out(Irreps('4x0e+4x1o+4x2e'), f, 0, 'even')
    assert repr(out) == '12x0e'


def test_wigner_orthogonality_and_equivariance():
    rng = np.random.default_rng(0)
    for (a, b, c) in [(1, 1, 1), (2, 1, 2), (3, 2, 1), (2, 2, 2)]:
        C = wigner_3j(a, b, c)
        assert abs(np.linalg.norm(C) - 1.0) < 1e-12
        ax, ang = rng.normal(size=3), 0.9
        Da = real_wigner_D(a, ax, ang)
        Db = real_wigner_D(b, ax, ang)
        Dc = real_wigner_D(c, ax, ang)
        rot = np.einsum('il,jm,kn,lmn->ijk', Da, Db, Dc, C)
        assert np.abs(rot - C).max() < 1e-12


@pytest.mark.skipif(not os.path.exists(CP0), reason='reference cp_0 absent')
def test_wigner_matches_e3nn_buffers():
    """The reference's committed checkpoint stores e3nn's actual w3j tensors
    as TorchScript buffers -- a ground-truth convention check."""
    torch = pytest.importorskip('torch')
    cp = torch.load(CP0, map_location='cpu', weights_only=False)
    found = 0
    for k, v in cp['model_state_dict'].items():
        if '_w3j_' not in k:
            continue
        l1, l2, l3 = (int(x) for x in k.split('_w3j_')[1].split('_'))
        np.testing.assert_allclose(
            wigner_3j(l1, l2, l3), v.numpy(), atol=1e-7
        )
        found += 1
    assert found >= 8


def test_sh_l2_closed_form():
    # e3nn generated polynomial check (o3/_spherical_harmonics.py l=2)
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    v = rng.normal(size=(7, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    s3 = np.sqrt(3)
    expect = np.stack([
        s3 * x * z, s3 * x * y, y**2 - 0.5 * (x**2 + z**2),
        s3 * y * z, s3 / 2 * (z**2 - x**2),
    ], axis=1)
    got = np.asarray(spherical_harmonics(2, jnp.asarray(v), True, 'norm'))
    np.testing.assert_allclose(got[:, 4:9], expect, atol=1e-6)


def test_sh_equivariance_and_component_norm():
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    v = rng.normal(size=(5, 3))
    ax, ang = rng.normal(size=3), 1.37
    D1 = real_wigner_D(1, ax, ang)
    sh0 = np.asarray(spherical_harmonics(3, jnp.asarray(v), True, 'component'))
    shr = np.asarray(
        spherical_harmonics(3, jnp.asarray(v @ D1.T), True, 'component')
    )
    off = 0
    for l in range(4):
        d = 2 * l + 1
        Dl = real_wigner_D(l, ax, ang)
        np.testing.assert_allclose(
            shr[:, off:off + d], sh0[:, off:off + d] @ Dl.T, atol=1e-5
        )
        np.testing.assert_allclose(
            np.linalg.norm(sh0[:, off:off + d], axis=1),
            np.sqrt(d) * np.ones(len(v)), atol=1e-5,
        )
        off += d


def test_sh_zero_vector_safe():
    import jax.numpy as jnp
    v = jnp.zeros((2, 3))
    out = np.asarray(spherical_harmonics(2, v, True, 'component'))
    assert np.isfinite(out).all()


def test_package_pins_fp32_matmul_precision():
    """Importing the package must pin fp32 matmuls: TPU's default
    bf16-input MXU passes inflate trained-potential force RMSE 35x
    (tools/accuracy_probe.py; BENCH_NOTES round 3)."""
    import jax

    import sevennet_exp_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == 'float32'
