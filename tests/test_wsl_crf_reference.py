"""Golden-behavior check of wsl.ops.crf_mean_field against an exact dense-CRF.

The reference wraps Krähenbühl & Koltun's densecrf (csrc/crf/crf_cpu.cpp);
that library is not available here, so this test implements the exact
O((HW)^2) mean-field update (Gaussian + bilateral kernels, Potts
compatibility) in numpy on a tiny image and verifies the repo's separable
approximation reaches the same answer:

* both must denoise a corrupted unary toward the true two-region labeling,
* the per-pixel argmax of the approximation must agree with the exact
  dense-CRF on almost all pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jtsm_tpu.wsl.ops import crf_mean_field


def exact_dense_crf(unary, image, num_iter, pos_w, pos_xy_std, bi_w, bi_xy_std, bi_rgb_std):
    """Brute-force mean field with Potts compatibility: at each iteration
    Q_i(l) <- softmax_l(log U_i(l) + sum_m w_m sum_{j != i} k_m(i,j) Q_j(l)).
    Kernels are normalized per-pixel (sum_j k(i,j) = 1), matching the
    normalized-convolution messages of the approximation."""
    h, w, k = unary.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    rgb = image.reshape(n, -1).astype(np.float64)

    d_pos = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
    d_rgb = ((rgb[:, None] - rgb[None, :]) ** 2).sum(-1)
    k_pos = np.exp(-d_pos / (2 * pos_xy_std**2))
    k_bi = np.exp(-d_pos / (2 * bi_xy_std**2) - d_rgb / (2 * bi_rgb_std**2))
    np.fill_diagonal(k_pos, 0.0)
    np.fill_diagonal(k_bi, 0.0)
    k_pos /= k_pos.sum(1, keepdims=True)
    k_bi /= k_bi.sum(1, keepdims=True)

    log_u = np.log(np.clip(unary.reshape(n, k), 1e-8, None))
    q = unary.reshape(n, k).astype(np.float64)
    for _ in range(num_iter):
        energy = log_u + pos_w * (k_pos @ q) + bi_w * (k_bi @ q)
        energy -= energy.max(1, keepdims=True)
        q = np.exp(energy)
        q /= q.sum(1, keepdims=True)
    return q.reshape(h, w, k)


def _two_region_fixture(h=16, w=20, noise_frac=0.22, seed=3):
    rng = np.random.RandomState(seed)
    gt = (np.arange(w)[None, :] >= w // 2).astype(np.int32) * np.ones((h, 1), np.int32)
    image = np.where(gt[..., None] > 0, 200.0, 40.0) + rng.randn(h, w, 3) * 3.0
    unary = np.where(gt[..., None] > 0, np.asarray([0.1, 0.9]), np.asarray([0.9, 0.1]))
    flip = rng.rand(h, w) < noise_frac
    unary = np.where(flip[..., None], unary[..., ::-1], unary).astype(np.float32)
    return gt, image.astype(np.float32), unary


def test_crf_mean_field_matches_exact_dense_crf():
    gt, image, unary = _two_region_fixture()
    params = dict(
        num_iter=5, pos_w=3.0, pos_xy_std=3.0, bi_w=4.0, bi_xy_std=16.0, bi_rgb_std=30.0
    )
    q_exact = exact_dense_crf(unary, image, **params)
    q_ours = np.asarray(
        crf_mean_field(jnp.asarray(unary), jnp.asarray(image), **params)
    )

    noisy_acc = (unary.argmax(-1) == gt).mean()
    exact_acc = (q_exact.argmax(-1) == gt).mean()
    ours_acc = (q_ours.argmax(-1) == gt).mean()
    agree = (q_ours.argmax(-1) == q_exact.argmax(-1)).mean()

    # the exact CRF denoises the unary; the approximation must too
    assert exact_acc > noisy_acc
    assert ours_acc > noisy_acc
    assert ours_acc >= 0.95, ours_acc
    # and the approximation must land on the exact CRF's labeling
    assert agree >= 0.93, agree
    # probabilities stay normalized
    np.testing.assert_allclose(q_ours.sum(-1), 1.0, atol=1e-3)


def test_crf_mean_field_respects_edges():
    """Mass must not bleed across a strong color edge: a unary that is
    uncertain only near the boundary resolves toward the side its color
    matches."""
    gt, image, _ = _two_region_fixture(noise_frac=0.0)
    h, w = gt.shape
    unary = np.where(gt[..., None] > 0, np.asarray([0.2, 0.8]), np.asarray([0.8, 0.2]))
    # uncertain band straddling the edge
    unary[:, w // 2 - 2 : w // 2 + 2] = 0.5
    q = np.asarray(
        crf_mean_field(
            jnp.asarray(unary.astype(np.float32)),
            jnp.asarray(image),
            num_iter=5,
            pos_w=3.0,
            pos_xy_std=3.0,
            bi_w=4.0,
            bi_xy_std=16.0,
            bi_rgb_std=30.0,
        )
    )
    assert (q.argmax(-1) == gt).mean() >= 0.95
