"""Dedicated H2RBoxHead (reference roi_heads/h2rbox_head.py:31-860) +
AnchorGeneratorYangXue (anchor_generator.py:756)."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from jdet_tpu.models.builder import build_detector

rng = np.random.RandomState(11)


def _detector():
    return build_detector(
        dict(
            type="H2RBox",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1),
            neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                      add_extra_convs="on_output",
                      relu_before_extra_convs=True),
            bbox_head=dict(type="H2RBoxHead", num_classes=15, in_channels=32,
                           feat_channels=32, stacked_convs=1,
                           rotation_agnostic_classes=[1],
                           rect_classes=[1],
                           test_cfg=dict(nms_pre=128, max_per_img=16)),
        ),
        seed=0,
    )


def _targets():
    gt = np.zeros((2, 8, 5), np.float32)
    gt[:, 0] = [64, 64, 40, 20, 0.4]
    gt[:, 1] = [30, 90, 24, 12, -0.3]
    return {
        "gt_bboxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(np.full((2, 8), 3, np.int32)),
        "gt_mask": jnp.asarray(
            np.array([[True, True] + [False] * 6] * 2)
        ),
    }


def test_h2rbox_head_loss_keys_and_finiteness():
    m = _detector()
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    losses = m.loss(images, _targets(), key=jax.random.PRNGKey(0))
    assert set(losses) == {
        "loss_cls", "loss_bbox", "loss_centerness", "loss_bbox_aug"
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = m.predict(images)
    assert det["polys"].shape == (2, 16, 8)


def test_h2rbox_head_aug_index_map_quarter_turn():
    """rot = pi/2 maps cell (x, y) of a square level to (W-1-y, x)."""
    m = _detector()
    head = m.bbox_head
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    # image of 16*8=128 px; center (127/2, 127/2)
    idx, ok = head._aug_index_map(sizes, jnp.float32(np.pi / 2), (63.5, 63.5))
    idx = np.asarray(idx)
    ok = np.asarray(ok)
    # level 0: point (x, y) -> (-(y-c)+c, (x-c)+c) with c the grid center
    w = 16
    for (x, y) in [(0, 0), (5, 3), (15, 15), (8, 8)]:
        src_flat = y * w + x
        tx, ty = w - 1 - y, x
        assert ok[src_flat]
        assert idx[src_flat] == ty * w + tx, (x, y, idx[src_flat])


def test_h2rbox_head_grad_flows_to_theta_branch():
    """The consistency loss must produce gradient signal on conv_theta —
    the whole point of H2RBox (angle learned without rotated labels)."""
    m = _detector()
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    targets = _targets()

    def lf(mm):
        return mm.loss(images, targets, key=jax.random.PRNGKey(1))[
            "loss_bbox_aug"
        ]

    grads = nnx.grad(lf)(m)
    gstate = nnx.to_flat_state(grads)
    theta_grads = [
        np.abs(np.asarray(v.value)).sum()
        for path, v in gstate
        if "conv_theta" in "/".join(str(p) for p in path)
    ]
    assert theta_grads and sum(theta_grads) > 0


def test_yangxue_anchor_quantization():
    from jdet_tpu.models.boxes.anchor_generator import AnchorGeneratorYangXue

    g = AnchorGeneratorYangXue(
        base_size=32, yx_base_size=4.0, scales=[1.0],
        ratios=[1.0, 0.5, 2.0], angles=[0.0],
    )
    b = g.base_anchors
    # ws0 = round([1, 1.414, 0.707]*4) = [4, 6, 3]; hs0 = round(ws0*r)
    # = [4, 3, 6]; scale 32/4 = 8
    np.testing.assert_allclose(b[:, 2], [32, 48, 24])
    np.testing.assert_allclose(b[:, 3], [32, 24, 48])
    np.testing.assert_allclose(b[:, 0], 1.5)  # 0.5 * (4 - 1)

    grid = g.grid_anchors((2, 2), 8)
    assert grid.shape == (2 * 2 * 3, 5)
    # second column of cells shifted by stride
    np.testing.assert_allclose(grid[3, 0] - grid[0, 0], 8)


def test_retina_head_accepts_yangxue_generator():
    from jdet_tpu.models.heads import RotatedRetinaHead

    h = RotatedRetinaHead(
        num_classes=16, in_channels=32, feat_channels=32, stacked_convs=1,
        anchor_generator_cfg=dict(type="yangxue", yx_base_size=4.0),
        rngs=nnx.Rngs(0),
    )
    from jdet_tpu.models.boxes.anchor_generator import AnchorGeneratorYangXue

    assert isinstance(h.anchor_generators[0], AnchorGeneratorYangXue)
