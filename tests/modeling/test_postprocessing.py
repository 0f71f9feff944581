"""detector_postprocess_batched (reference postprocessing.py
detector_postprocess): boxes AND keypoints rescale from network-input to
original-image coordinates."""

import jax.numpy as jnp
import numpy as np

from jtsm_tpu.modeling.postprocessing import detector_postprocess_batched


def test_boxes_and_keypoints_rescale_together():
    # network input 100x200, original 200x400 -> scale 2x both axes
    dets = {
        "boxes": jnp.asarray([[[10.0, 20.0, 50.0, 80.0]]]),
        "scores": jnp.asarray([[0.9]]),
        "keypoints": jnp.asarray([[[[30.0, 40.0, 1.5, 0.8], [50.0, 80.0, 2.5, 0.9]]]]),
    }
    out = detector_postprocess_batched(
        dets,
        image_sizes=jnp.asarray([[100, 200]], jnp.int32),
        orig_sizes=jnp.asarray([[200, 400]], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), [20, 40, 100, 160])
    kp = np.asarray(out["keypoints"][0, 0])
    # x/y scale with the image; logit/prob untouched (regression: keypoints
    # were emitted in resized coords -> OKS AP was 0 on any resized input)
    np.testing.assert_allclose(kp[:, 0], [60, 100])
    np.testing.assert_allclose(kp[:, 1], [80, 160])
    np.testing.assert_allclose(kp[:, 2:], [[1.5, 0.8], [2.5, 0.9]])


def test_keypoints_rescale_batch_gt1():
    # regression: with B > 1 the keypoint scale factor was (B, 1, 1) which
    # rank-promotes to (1, B, 1, 1) and fails to broadcast against
    # (B, D, K, 4) — only B = 1 happened to work
    b, d, k = 3, 5, 17
    kp = jnp.ones((b, d, k, 4))
    dets = {
        "boxes": jnp.ones((b, d, 4)),
        "keypoints": kp,
    }
    out = detector_postprocess_batched(
        dets,
        image_sizes=jnp.tile(jnp.asarray([[100, 200]], jnp.int32), (b, 1)),
        orig_sizes=jnp.tile(jnp.asarray([[200, 400]], jnp.int32), (b, 1)),
    )
    np.testing.assert_allclose(np.asarray(out["keypoints"][..., 0]), 2.0)
    np.testing.assert_allclose(np.asarray(out["keypoints"][..., 1]), 2.0)
    np.testing.assert_allclose(np.asarray(out["keypoints"][..., 2:]), 1.0)


def test_anisotropic_rescale():
    dets = {
        "boxes": jnp.asarray([[[8.0, 10.0, 16.0, 20.0]]]),
        "keypoints": jnp.asarray([[[[8.0, 10.0, 0.0, 0.5]]]]),
    }
    out = detector_postprocess_batched(
        dets,
        image_sizes=jnp.asarray([[100, 160]], jnp.int32),
        orig_sizes=jnp.asarray([[300, 320]], jnp.int32),  # sy=3, sx=2
    )
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), [16, 30, 32, 60])
    np.testing.assert_allclose(np.asarray(out["keypoints"][0, 0, 0, :2]), [16, 30])


def test_rotated_boxes_anisotropic_rescale_matches_structures_scale():
    """Batched postprocess of rotated detections must match the
    reference-correct RotatedBoxes.scale fit (angle changes under
    anisotropic scaling)."""
    from jtsm_tpu.structures.rotated_boxes import RotatedBoxes

    raw = jnp.asarray([[[30.0, 40.0, 20.0, 10.0, 30.0],
                        [10.0, 10.0, 8.0, 4.0, -45.0]]])
    out = detector_postprocess_batched(
        {"boxes": raw},
        image_sizes=jnp.asarray([[100, 160]], jnp.int32),
        orig_sizes=jnp.asarray([[300, 320]], jnp.int32),  # sy=3, sx=2
    )
    want = RotatedBoxes(raw[0]).scale(2.0, 3.0).tensor
    np.testing.assert_allclose(np.asarray(out["boxes"][0]), np.asarray(want), rtol=1e-5)
