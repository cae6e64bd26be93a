"""Pretrained-import round trips.

Synthetic reference-format state dicts (torchvision / jittor-JDet naming,
reference backbones/resnet.py + runner.py:224-261 payload shape) are
generated from the architecture specs, imported through
jdet_tpu.models.pretrained, and verified tensor-for-tensor against the
module variables.
"""
import os
import pickle

import numpy as np
import pytest
from flax import nnx

from jdet_tpu.models.pretrained import (
    assign_flat,
    backbone_to_flat,
    detector_sd_to_flat,
    flat_paths,
    import_jdet_checkpoint,
    load_pretrained_backbone,
    lsknet_to_flat,
    reresnet_to_flat,
    resnet_to_flat,
    vgg16_to_flat,
)
from jdet_tpu.utils.registry import BACKBONES
from jdet_tpu.models import builder  # noqa: F401  (registration)
from jdet_tpu.models.builder import build_detector

RNG = np.random.RandomState(7)


def _t(shape):
    return RNG.randn(*shape).astype(np.float32)


def _bn_keys(sd, prefix, c):
    sd[f"{prefix}.weight"] = _t((c,))
    sd[f"{prefix}.bias"] = _t((c,))
    sd[f"{prefix}.running_mean"] = _t((c,))
    sd[f"{prefix}.running_var"] = np.abs(_t((c,))) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.array(100)


def _torch_resnet_sd(depth=18, v1d=False):
    """torchvision (plain) / jittor (v1d, C1 Sequential) naming."""
    blocks = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}[depth]
    bottleneck = depth >= 50
    exp = 4 if bottleneck else 1
    sd = {}
    if v1d:
        for i, (name, cin, cout) in enumerate(
            [(0, 3, 32), (3, 32, 32), (6, 32, 64)]
        ):
            sd[f"C1.{name}.weight"] = _t((cout, cin, 3, 3))
            _bn_keys(sd, f"C1.{name + 1}", cout)
    else:
        sd["conv1.weight"] = _t((64, 3, 7, 7))
        _bn_keys(sd, "bn1", 64)
    in_ch = 64
    for i, n in enumerate(blocks):
        ch = 64 * 2**i
        for b in range(n):
            p = f"layer{i + 1}.{b}"
            stride = 2 if (i > 0 and b == 0) else 1
            if bottleneck:
                sd[f"{p}.conv1.weight"] = _t((ch, in_ch, 1, 1))
                _bn_keys(sd, f"{p}.bn1", ch)
                sd[f"{p}.conv2.weight"] = _t((ch, ch, 3, 3))
                _bn_keys(sd, f"{p}.bn2", ch)
                sd[f"{p}.conv3.weight"] = _t((ch * 4, ch, 1, 1))
                _bn_keys(sd, f"{p}.bn3", ch * 4)
            else:
                sd[f"{p}.conv1.weight"] = _t((ch, in_ch, 3, 3))
                _bn_keys(sd, f"{p}.bn1", ch)
                sd[f"{p}.conv2.weight"] = _t((ch, ch, 3, 3))
                _bn_keys(sd, f"{p}.bn2", ch)
            if b == 0 and (stride != 1 or in_ch != ch * exp):
                if v1d:
                    sd[f"{p}.downsample.1.weight"] = _t((ch * exp, in_ch, 1, 1))
                    _bn_keys(sd, f"{p}.downsample.2", ch * exp)
                else:
                    sd[f"{p}.downsample.0.weight"] = _t((ch * exp, in_ch, 1, 1))
                    _bn_keys(sd, f"{p}.downsample.1", ch * exp)
            in_ch = ch * exp
    sd["fc.weight"] = _t((1000, in_ch))
    sd["fc.bias"] = _t((1000,))
    return sd


def _check_loaded(model, mapping, loaded, missing, unexpected):
    assert not unexpected, unexpected[:5]
    _, params = flat_paths(model)
    for path in loaded:
        np.testing.assert_allclose(
            np.asarray(params[path].get_value()), mapping[path], rtol=1e-6
        )
    return params


def test_resnet18_roundtrip():
    sd = _torch_resnet_sd(18)
    model = BACKBONES.get("ResNet")(depth=18, rngs=nnx.Rngs(0))
    mapping = resnet_to_flat(sd)
    loaded, missing, unexpected = assign_flat(model, mapping, strict=True)
    params = _check_loaded(model, mapping, loaded, missing, unexpected)
    # spot-check the OIHW->HWIO transpose
    np.testing.assert_allclose(
        np.asarray(model.conv1.kernel.get_value()),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6,
    )
    assert not missing  # every backbone param covered


def test_resnet50_v1d_roundtrip():
    sd = _torch_resnet_sd(50, v1d=True)
    model = BACKBONES.get("ResNet_v1d")(depth=50, rngs=nnx.Rngs(0))
    mapping = resnet_to_flat(sd, deep_stem=True)
    loaded, missing, unexpected = assign_flat(model, mapping, strict=True)
    _check_loaded(model, mapping, loaded, missing, unexpected)
    np.testing.assert_allclose(
        np.asarray(model.conv1b.kernel.get_value()),
        np.transpose(sd["C1.3.weight"], (2, 3, 1, 0)), rtol=1e-6,
    )
    assert not missing


def test_reresnet_filter_roundtrip():
    """Export our own C8 expansion as the reference `filter` buffers, then
    re-import: the recovered base weights must match exactly (the r=0
    output-orientation block is the unrotated base)."""
    model = BACKBONES.get("ReResNet")(depth=18, base_fields=2,
                                      rngs=nnx.Rngs(3))
    sd = {}
    # stem lifting conv: filter (F*8, 3, 7, 7) = 8 rotated copies
    from jdet_tpu.models.equivariant.econv import (
        N_ORIENT, lifting_expand, _rot_mats_cached,
    )

    w_stem = np.asarray(model.conv1.weight.get_value())  # (F, 3, 7, 7)
    filt = np.asarray(
        lifting_expand(w_stem, _rot_mats_cached(7))
    ).transpose(3, 2, 0, 1)  # HWIO -> OIHW = (F*8, 3, 7, 7)
    sd["conv1.filter"] = filt
    _bn_keys(sd, "bn1.batch_norm_[8]", 2)

    # one regular conv: expand our base through the module's own LUT
    blk = model.layer1[0]
    w = np.asarray(blk.conv2.weight.get_value())  # (O, I, 8, 3, 3)
    hwio = np.asarray(
        __import__("jdet_tpu.ops.orn", fromlist=["rotate_arf"]).rotate_arf(
            blk.conv2.weight.get_value(), blk.conv2._src
        )
    )  # (k, k, I*8, O*8)
    sd["layer1.0.conv2.filter"] = hwio.transpose(3, 2, 0, 1)

    mapping = reresnet_to_flat(sd)
    loaded, missing, unexpected = assign_flat(model, mapping, strict=True)
    assert not unexpected
    np.testing.assert_allclose(
        np.asarray(model.conv1.weight.get_value()), w_stem, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(blk.conv2.weight.get_value()), w, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(model.bn1.bn.mean.get_value()),
        sd["bn1.batch_norm_[8].running_mean"], rtol=1e-6,
    )


def test_reresnet_zero_filter_raises():
    sd = {"conv1.filter": np.zeros((16, 3, 7, 7), np.float32)}
    with pytest.raises(ValueError, match="all-zero"):
        reresnet_to_flat(sd)


def test_lsknet_roundtrip():
    model = BACKBONES.get("LSKNet")(arch="t", rngs=nnx.Rngs(0))
    dims = (32, 64, 160, 256)
    depths = (3, 3, 5, 2)
    mlp_ratios = (8, 8, 4, 4)
    sd = {}
    for i, (dim, depth) in enumerate(zip(dims, depths)):
        cin = 3 if i == 0 else dims[i - 1]
        p = 7 if i == 0 else 3
        sd[f"patch_embed{i + 1}.proj.weight"] = _t((dim, cin, p, p))
        sd[f"patch_embed{i + 1}.proj.bias"] = _t((dim,))
        _bn_keys(sd, f"patch_embed{i + 1}.norm", dim)
        for j in range(depth):
            b = f"block{i + 1}.{j}"
            _bn_keys(sd, f"{b}.norm1", dim)
            _bn_keys(sd, f"{b}.norm2", dim)
            for nm, shape in (
                ("attn.proj_1", (dim, dim, 1, 1)),
                ("attn.proj_2", (dim, dim, 1, 1)),
                ("attn.spatial_gating_unit.conv0", (dim, 1, 5, 5)),
                ("attn.spatial_gating_unit.conv_spatial", (dim, 1, 7, 7)),
                ("attn.spatial_gating_unit.conv1", (dim // 2, dim, 1, 1)),
                ("attn.spatial_gating_unit.conv2", (dim // 2, dim, 1, 1)),
                ("attn.spatial_gating_unit.conv_squeeze", (2, 2, 7, 7)),
                ("attn.spatial_gating_unit.conv", (dim, dim // 2, 1, 1)),
                ("mlp.fc1", (dim * mlp_ratios[i], dim, 1, 1)),
                ("mlp.fc2", (dim, dim * mlp_ratios[i], 1, 1)),
                ("mlp.dwconv.dwconv", (dim * mlp_ratios[i], 1, 3, 3)),
            ):
                sd[f"{b}.{nm}.weight"] = _t(shape)
                sd[f"{b}.{nm}.bias"] = _t((shape[0],))
            sd[f"{b}.layer_scale_1"] = _t((dim,))
            sd[f"{b}.layer_scale_2"] = _t((dim,))
        sd[f"norm{i + 1}.weight"] = _t((dim,))
        sd[f"norm{i + 1}.bias"] = _t((dim,))
    mapping = lsknet_to_flat(sd)
    loaded, missing, unexpected = assign_flat(model, mapping, strict=True)
    _check_loaded(model, mapping, loaded, missing, unexpected)
    np.testing.assert_allclose(
        np.asarray(model.stages[0][0].ls1.get_value()),
        sd["block1.0.layer_scale_1"], rtol=1e-6,
    )
    assert not missing


def test_vgg16_roundtrip():
    model = BACKBONES.get("SSDVGG")(rngs=nnx.Rngs(0))
    cfg = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
           (10, 128, 256), (12, 256, 256), (14, 256, 256),
           (17, 256, 512), (19, 512, 512), (21, 512, 512),
           (24, 512, 512), (26, 512, 512), (28, 512, 512)]
    sd = {}
    for idx, cin, cout in cfg:
        sd[f"features.{idx}.weight"] = _t((cout, cin, 3, 3))
        sd[f"features.{idx}.bias"] = _t((cout,))
    sd["features.31.weight"] = _t((1024, 512, 3, 3))
    sd["features.31.bias"] = _t((1024,))
    sd["features.33.weight"] = _t((1024, 1024, 1, 1))
    sd["features.33.bias"] = _t((1024,))
    mapping = vgg16_to_flat(sd)
    loaded, missing, unexpected = assign_flat(model, mapping, strict=True)
    _check_loaded(model, mapping, loaded, missing, unexpected)
    # only the l2norm scale should remain at init
    assert missing == ["l2norm.weight"]


def test_builder_pretrained_path(tmp_path):
    """backbone.pretrained=<file> wires through build_detector."""
    sd = _torch_resnet_sd(18)
    path = os.path.join(tmp_path, "r18.pkl")
    with open(path, "wb") as f:
        pickle.dump(sd, f)
    model = build_detector(dict(
        type="RotatedRetinaNet",
        backbone=dict(type="ResNet", depth=18, pretrained=path),
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="RotatedRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1),
    ), seed=0)
    np.testing.assert_allclose(
        np.asarray(model.backbone.conv1.kernel.get_value()),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6,
    )


def test_detector_checkpoint_import(tmp_path):
    """Reference pkl payload ({'meta': {'jdet_version': ...}, 'model': sd})
    routes through the importer inside load_checkpoint."""
    from jdet_tpu.runner.checkpoint import load_checkpoint

    model = build_detector(dict(
        type="RotatedRetinaNet",
        backbone=dict(type="ResNet", depth=18),
        neck=dict(type="FPN", out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="RotatedRetinaHead", num_classes=16,
                       in_channels=32, feat_channels=32, stacked_convs=1),
    ), seed=0)
    sd = {f"backbone.{k}": v for k, v in _torch_resnet_sd(18).items()}
    # neck: 3 lateral+fpn convs used, extras appended to fpn_convs
    # (reference necks/fpn.py:102-140)
    for i, cin in enumerate((128, 256, 512)):  # start_level=1 of r18
        sd[f"neck.lateral_convs.{i}.conv.weight"] = _t((32, cin, 1, 1))
        sd[f"neck.lateral_convs.{i}.conv.bias"] = _t((32,))
        sd[f"neck.fpn_convs.{i}.conv.weight"] = _t((32, 32, 3, 3))
        sd[f"neck.fpn_convs.{i}.conv.bias"] = _t((32,))
    sd["neck.fpn_convs.3.conv.weight"] = _t((32, 512, 3, 3))
    sd["neck.fpn_convs.3.conv.bias"] = _t((32,))
    sd["neck.fpn_convs.4.conv.weight"] = _t((32, 32, 3, 3))
    sd["neck.fpn_convs.4.conv.bias"] = _t((32,))
    n_anchors = model.bbox_head.num_anchors
    sd["bbox_head.cls_convs.0.conv.weight"] = _t((32, 32, 3, 3))
    sd["bbox_head.cls_convs.0.conv.bias"] = _t((32,))
    sd["bbox_head.reg_convs.0.conv.weight"] = _t((32, 32, 3, 3))
    sd["bbox_head.reg_convs.0.conv.bias"] = _t((32,))
    sd["bbox_head.retina_cls.weight"] = _t((n_anchors * 15, 32, 1, 1))
    sd["bbox_head.retina_cls.bias"] = _t((n_anchors * 15,))
    sd["bbox_head.retina_reg.weight"] = _t((n_anchors * 5, 32, 1, 1))
    sd["bbox_head.retina_reg.bias"] = _t((n_anchors * 5,))

    path = os.path.join(tmp_path, "ref_ckpt.pkl")
    with open(path, "wb") as f:
        pickle.dump({"meta": {"jdet_version": "1.0", "epoch": 12},
                     "model": sd}, f)
    meta = load_checkpoint(path, model)
    assert meta.get("epoch") == 12
    np.testing.assert_allclose(
        np.asarray(model.neck.extra_convs[0].kernel.get_value()),
        np.transpose(sd["neck.fpn_convs.3.conv.weight"], (2, 3, 1, 0)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.bbox_head.retina_cls.kernel.get_value()),
        np.transpose(sd["bbox_head.retina_cls.weight"], (2, 3, 1, 0)),
        rtol=1e-6,
    )
