"""Transform math tests (SURVEY.md §4 item 1).

The encode/decode matrices must reproduce the reference's orthonormal 3D DCT
(scale sqrt(8/cube) with 1/sqrt(2) DC factors, Transform.java:20-21,
3dDCT.cl:109-140).  scipy.fft.dctn(norm="ortho") is the independent oracle.
"""

import numpy as np
import scipy.fft

from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import dct, quant, zigzag


def test_basis_orthonormal():
    for n in (2, 4, 8, 16):
        d = dct.dct_basis_1d(n)
        np.testing.assert_allclose(d @ d.T, np.eye(n), atol=1e-12)


def test_basis_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=16)
    d = dct.dct_basis_1d(16)
    np.testing.assert_allclose(
        d @ x, scipy.fft.dct(x, type=2, norm="ortho"), atol=1e-12
    )


def test_dense_3d_matches_scipy_dctn():
    rng = np.random.default_rng(2)
    cube = rng.normal(size=(8, 8, 8))  # [z][y][x]
    m = dct._dct3d_dense(8, 8, 8)
    got = (m @ cube.reshape(-1)).reshape(8, 8, 8)
    want = scipy.fft.dctn(cube, type=2, norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_reference_normalization():
    """Spot-check one coefficient against the reference's literal formula
    (DCT.java:112: scale * c0*c1*c2 * cos products with scale = sqrt(8)/sqrt(512))."""
    rng = np.random.default_rng(3)
    cube = rng.normal(size=(8, 8, 8))
    m = dct._dct3d_dense(8, 8, 8)
    flat = cube.reshape(-1)
    for (k0, k1, k2) in [(0, 0, 0), (1, 0, 0), (3, 5, 7), (0, 2, 0)]:
        scale = np.sqrt(8.0) / np.sqrt(512.0)
        c = scale
        for k in (k0, k1, k2):
            if k == 0:
                c *= 1 / np.sqrt(2)
        acc = 0.0
        for n0 in range(8):
            for n1 in range(8):
                for n2 in range(8):
                    acc += (
                        cube[n0, n1, n2]
                        * np.cos(np.pi / 8 * (n0 + 0.5) * k0)
                        * np.cos(np.pi / 8 * (n1 + 0.5) * k1)
                        * np.cos(np.pi / 8 * (n2 + 0.5) * k2)
                    )
        want = c * acc
        got = (m @ flat)[k0 * 64 + k1 * 8 + k2]
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_quant_divisors():
    d = quant.quant_divisors(8, 8, 8, 5).reshape(8, 8, 8)
    assert d[0, 0, 0] == 1.0  # DC passes unscaled (max(1, .) floor)
    assert d[0, 0, 1] == 5.0 and d[1, 0, 0] == 5.0 and d[0, 1, 0] == 5.0
    assert d[7, 7, 7] == 5 * 21
    assert d[2, 3, 4] == 5 * 9


def test_encode_decode_matrices_inverse_without_quant():
    """With strength 0 all divisors are 1 -> matrices are exact inverses."""
    cfg = CodecConfig(quant_strength=0)
    e = dct.encode_matrix(cfg, np.float64)
    d = dct.decode_matrix(cfg, np.float64)
    np.testing.assert_allclose(e @ d, np.eye(512), atol=1e-10)


def test_encode_matrix_folds_zigzag_and_quant():
    cfg = CodecConfig()
    rng = np.random.default_rng(4)
    cube = rng.normal(size=512) * 100
    e = dct.encode_matrix(cfg, np.float64)
    got = cube @ e
    coeffs = dct._dct3d_dense(8, 8, 8) @ cube
    div = quant.quant_divisors(8, 8, 8, 5)
    perm = zigzag.zigzag_flat_indices(8, 8, 8)
    want = (coeffs / div)[perm]
    np.testing.assert_allclose(got, want, atol=1e-9)
