"""Pretrained-weight import: torch/jittor state dicts -> jdet_tpu modules.

The reference auto-loads ImageNet backbones in every factory
(`python/jdet/models/backbones/resnet.py:192-235`, jittorhub pickles) and
resumes full detectors from its pkl checkpoints
(`python/jdet/runner/runner.py:224-261`). This module is the file-based
counterpart (no egress in this environment): converters from the
reference's/torchvision's parameter naming into our nnx paths, for

  * ResNet / ResNet-v1d  (torchvision + jittor naming)
  * ReResNet             (e2cnn/jdet `filter` buffers -> C8 base weights)
  * LSKNet / StripNet    (mmcls-style patch_embed{i}/block{i}/norm{i})
  * VGG16 (SSD)          (torchvision `features.N` / mmdet SSDVGG)
  * full detector checkpoints (reference pkl payload {"meta","model",...})

Layout rules: torch conv OIHW -> flax HWIO; depthwise (dim,1,k,k) ->
(k,k,1,dim) by the same transpose; linear (out,in) -> (in,out); BN
weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""
from __future__ import annotations

import pickle
import re

import jax.numpy as jnp
import numpy as np
from flax import nnx

N_ORIENT = 8


# ---------------------------------------------------------------------------
# generic plumbing
# ---------------------------------------------------------------------------

def _np(v):
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv_w(v):
    """Torch OIHW (incl. depthwise (dim,1,k,k)) -> flax HWIO."""
    return np.transpose(_np(v), (2, 3, 1, 0))


def flat_paths(model):
    """(state, {'a.b.0.kernel': variable}) for every variable in model."""
    state = nnx.state(model)
    out = {}
    for path, var in state.flat_state():
        out[".".join(str(p) for p in path)] = var
    return state, out


def assign_flat(model, mapping, strict=True, prefix=""):
    """Assign {our_path: np.ndarray} into the model's variables.

    Returns (loaded, missing, unexpected) path lists. `missing` = model
    params not covered (excluding non-Param state like rng counts).
    """
    state, params = flat_paths(model)
    loaded, unexpected = [], []
    for path, arr in mapping.items():
        var = params.get(path)
        if var is None:
            unexpected.append(path)
            continue
        cur = var.get_value()
        if tuple(cur.shape) != tuple(arr.shape):
            raise ValueError(
                f"{prefix}{path}: shape {tuple(arr.shape)} != model "
                f"{tuple(cur.shape)}"
            )
        var.set_value(jnp.asarray(arr, dtype=cur.dtype))
        loaded.append(path)
    missing = [
        p for p, v in params.items()
        if p not in mapping
        and getattr(v, "type", None) in (nnx.Param, nnx.BatchStat)
    ]
    if strict and unexpected:
        raise KeyError(f"{prefix}unmatched source keys: {unexpected[:8]}"
                       f" (+{max(0, len(unexpected) - 8)} more)")
    # flat_state() variables alias the snapshot — push mutated values back
    # into the live module tree
    nnx.update(model, state)
    return loaded, missing, unexpected


def load_blob(path):
    """Read a .pth (torch) or .pkl/.bin (pickle) state-dict file."""
    if str(path).endswith((".pth", ".pt")):
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)
    else:
        with open(path, "rb") as f:
            blob = pickle.load(f)
    if isinstance(blob, dict):
        for key in ("state_dict", "model"):
            if key in blob and isinstance(blob[key], dict):
                return {k: _np(v) for k, v in blob[key].items()}
    return {k: _np(v) for k, v in blob.items()}


def _bn(dst, src_prefix, sd):
    """BN name translation into {dst+...: arr}."""
    out = {}
    for s, d in (("weight", "scale"), ("bias", "bias"),
                 ("running_mean", "mean"), ("running_var", "var")):
        k = f"{src_prefix}.{s}"
        if k in sd:
            out[f"{dst}.{d}"] = _np(sd[k])
    return out


# ---------------------------------------------------------------------------
# ResNet / ResNet-v1d
# ---------------------------------------------------------------------------

def resnet_to_flat(sd, deep_stem=False):
    """torchvision/jittor ResNet state dict -> our paths.

    Plain stem: conv1/bn1. v1d (jittor `C1` Sequential,
    reference resnet.py:284-295): C1.{0,1,3,4,6,7} -> conv1a/bn1a/../bn1c;
    v1d downsample Sequential(pool, conv, bn) -> indices {1,2}.
    """
    out = {}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked") or key.startswith("fc."):
            continue
        k = key
        if deep_stem:
            m = re.match(r"^(?:C1|stem)\.(\d+)\.(.+)$", k)
            if m:
                idx, rest = int(m.group(1)), m.group(2)
                name = {0: "conv1a", 1: "bn1a", 3: "conv1b", 4: "bn1b",
                        6: "conv1c", 7: "bn1c"}[idx]
                k = f"{name}.{rest}"
            k = re.sub(r"\.downsample\.1\.", ".downsample.conv.", k)
            k = re.sub(r"\.downsample\.2\.", ".downsample.bn.", k)
        else:
            k = re.sub(r"\.downsample\.0\.", ".downsample.conv.", k)
            k = re.sub(r"\.downsample\.1\.", ".downsample.bn.", k)
        arr = _np(v)
        if arr.ndim == 4:
            out[k.replace(".weight", ".kernel")] = conv_w(arr)
        elif ".weight" in k:  # bn scale
            out[k.replace(".weight", ".scale")] = arr
        elif "running_mean" in k:
            out[k.replace(".running_mean", ".mean")] = arr
        elif "running_var" in k:
            out[k.replace(".running_var", ".var")] = arr
        else:  # bias
            out[k] = arr
    return out


# ---------------------------------------------------------------------------
# ReResNet (C8 regular fields)
# ---------------------------------------------------------------------------

def _refilter_to_base(filt):
    """e2cnn expanded filter (O*8, I*8, k, k) -> our base (O, I, 8, k, k).

    The r=0 output-orientation block of a C8-equivariant filter IS the
    unrotated base: expanded[o*8+r, i*8+s] = rot_r(base[o, i, (s-r)%8]),
    so base[o, i, s] = expanded[o*8, i*8+s]. Our REConv2d regenerates the
    other 7 orientation copies with its own (exact, ORN-table) rotation.
    """
    O8, I8, k, _ = filt.shape
    O, I = O8 // N_ORIENT, I8 // N_ORIENT
    f = filt.reshape(O, N_ORIENT, I, N_ORIENT, k, k)
    return np.ascontiguousarray(f[:, 0])  # (O, I, 8, k, k)


def _ds_rename(k):
    """Reference downsample Sequential(conv1x1, norm) -> our .conv/.bn."""
    return re.sub(r"\.downsample\.0\.", ".downsample.conv.",
                  re.sub(r"\.downsample\.1\.", ".downsample.bn.", k))


def _expand_r2conv_weights(key, coeff, shapes):
    """Expand R2Conv basis coefficients (`<conv>.weights`, saved by
    train-mode reference checkpoints, e2conv.py:258) into the full
    filter tensor through the exact C8 steerable basis
    (equivariant/c8_basis.py). `shapes` maps our target paths to the
    model's parameter shapes (from flat_paths) so the conv geometry
    (fields in/out, kernel size, lifting vs regular) can be recovered
    from the flat coefficient vector."""
    from .equivariant.c8_basis import expand_filter

    base = key[: -len(".weights")]
    ours = _ds_rename(f"{base}.weight")
    shape = shapes.get(ours)
    if shape is None:
        raise KeyError(
            f"{key}: basis-coefficient conv has no target param {ours}")
    if len(shape) == 5:  # regular REConv2d (O, I, 8, k, k)
        of, infl, _, k, _ = shape
        return expand_filter(coeff, int(k), out_fields=int(of),
                             in_fields=int(infl), in_kind="regular")
    of, in_ch, k, _ = shape  # lifting stem (O, in_ch, k, k)
    return expand_filter(coeff, int(k), out_fields=int(of),
                         in_fields=int(in_ch), in_kind="trivial")


def reresnet_to_flat(sd, shapes=None):
    """Reference ReResNet state dict -> our paths.

    Prefers the R2Conv `filter` buffers (populated by any eval() pass;
    jdet's jittor port keeps them as attributes, e2conv.py:255). When a
    conv has no usable filter — a train-mode checkpoint carries only the
    steerable-basis `weights` coefficients — the filter is rebuilt
    through the exact C8 basis (`equivariant/c8_basis.py`), which needs
    the target parameter `shapes` (supplied by backbone_to_flat).
    """
    filters = {}
    for key, v in sd.items():
        if key.endswith(".filter"):
            filt = _np(v)
            if np.any(filt):
                filters[key[: -len(".filter")]] = filt
    for key, v in sd.items():
        if key.endswith(".weights"):
            base = key[: -len(".weights")]
            if base in filters:
                continue
            if shapes is None:
                raise ValueError(
                    f"{key}: checkpoint has basis coefficients but no "
                    "materialized filter, and no target shapes were "
                    "given — convert via load_pretrained_backbone / "
                    "backbone_to_flat(backbone, sd)"
                )
            filters[base] = _expand_r2conv_weights(key, _np(v), shapes)

    out = {}
    for key in list(sd) + [f"{b}.filter" for b in filters
                           if f"{b}.filter" not in sd]:
        if key.endswith(".filter"):
            base = key[: -len(".filter")]
            filt = filters.get(base)
            if filt is None:
                raise ValueError(
                    f"{key}: filter buffer is all-zero and no basis "
                    "coefficients are present — re-save the reference "
                    "checkpoint after one eval() pass"
                )
            if filt.shape[1] % N_ORIENT:  # lifting conv (trivial input)
                O = filt.shape[0] // N_ORIENT
                w = filt.reshape(O, N_ORIENT, filt.shape[1], *filt.shape[2:])
                out[f"{base}.weight"] = np.ascontiguousarray(w[:, 0])
            else:
                out[f"{base}.weight"] = _refilter_to_base(filt)
        elif ".batch_norm_[8]." in key:
            pre, post = key.split(".batch_norm_[8].")
            if post == "num_batches_tracked":
                continue
            d = {"weight": "scale", "bias": "bias",
                 "running_mean": "mean", "running_var": "var"}[post]
            out[f"{pre}.bn.{d}"] = _np(sd[key])
        # index buffers: regenerated
    return {_ds_rename(k): v for k, v in out.items()}


# ---------------------------------------------------------------------------
# LSKNet / StripNet
# ---------------------------------------------------------------------------

def lsknet_to_flat(sd):
    """mmcls-style LSKNet/StripNet (patch_embed{i}/block{i}/norm{i},
    reference lsknet.py:250-270) -> our paths (patch_embeds/stages/
    stage_norms lists)."""
    out = {}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked") or key.startswith("head."):
            continue
        k = key
        k = re.sub(r"^patch_embed(\d)\.", lambda m: f"patch_embeds.{int(m.group(1)) - 1}.", k)
        k = re.sub(r"^block(\d)\.", lambda m: f"stages.{int(m.group(1)) - 1}.", k)
        k = re.sub(r"^norm(\d)\.", lambda m: f"stage_norms.{int(m.group(1)) - 1}.", k)
        k = k.replace(".spatial_gating_unit.", ".gate.")
        k = k.replace(".mlp.dwconv.dwconv.", ".mlp.dwconv.")
        k = k.replace(".layer_scale_1", ".ls1").replace(".layer_scale_2", ".ls2")
        arr = _np(v)
        if arr.ndim == 4:
            out[k.replace(".weight", ".kernel")] = conv_w(arr)
        elif k.endswith(".weight"):
            # BN and LayerNorm both map weight->scale in flax
            out[k.replace(".weight", ".scale")] = arr
        elif "running_mean" in k:
            out[k.replace(".running_mean", ".mean")] = arr
        elif "running_var" in k:
            out[k.replace(".running_var", ".var")] = arr
        else:
            out[k] = arr
    return out


# ---------------------------------------------------------------------------
# VGG16 (SSD backbone)
# ---------------------------------------------------------------------------

_VGG16_CONV_IDX = [(0, 0, 0), (2, 0, 1), (5, 1, 0), (7, 1, 1),
                   (10, 2, 0), (12, 2, 1), (14, 2, 2),
                   (17, 3, 0), (19, 3, 1), (21, 3, 2),
                   (24, 4, 0), (26, 4, 1), (28, 4, 2)]


def vgg16_to_flat(sd):
    """torchvision vgg16 `features.N` (+ mmdet SSDVGG extra fc6/fc7 at
    features.31/33 when present) -> our SSDVGG paths."""
    out = {}
    for feat_i, b, j in _VGG16_CONV_IDX:
        w = sd.get(f"features.{feat_i}.weight")
        if w is None:
            continue
        out[f"blocks.{b}.{j}.kernel"] = conv_w(w)
        out[f"blocks.{b}.{j}.bias"] = _np(sd[f"features.{feat_i}.bias"])
    for feat_i, name in ((31, "fc6"), (33, "fc7")):
        w = sd.get(f"features.{feat_i}.weight")
        if w is not None:
            out[f"{name}.kernel"] = conv_w(w)
            out[f"{name}.bias"] = _np(sd[f"features.{feat_i}.bias"])
    return out


# ---------------------------------------------------------------------------
# backbone dispatch + detector checkpoints
# ---------------------------------------------------------------------------

def backbone_to_flat(backbone, sd):
    """Pick the converter matching the backbone module class."""
    name = type(backbone).__name__
    if name in ("ReResNet",):
        _, params = flat_paths(backbone)
        shapes = {
            p: tuple(np.shape(v.get_value() if hasattr(v, "get_value")
                              else v))
            for p, v in params.items()
        }
        return reresnet_to_flat(sd, shapes=shapes)
    if name in ("LSKNet", "StripNet"):
        return lsknet_to_flat(sd)
    if name in ("SSDVGG",):
        return vgg16_to_flat(sd)
    if name in ("ResNet", "ResNet_v1d", "Res2Net"):
        return resnet_to_flat(sd, deep_stem=getattr(backbone, "deep_stem",
                                                    False))
    raise ValueError(f"no pretrained converter for backbone {name}")


def load_pretrained_backbone(backbone, path, strict=False):
    """Load a backbone state-dict file: either a torch/jittor ImageNet
    dict (converted on the fly) or an already-converted jdet_tpu file
    (from tools/convert_weights.py)."""
    sd = load_blob(path)
    if any(k.endswith(("/kernel", "/scale", ".kernel", ".scale"))
           for k in sd):
        # already in our naming (state_to_numpy uses '/' separators)
        mapping = {k.replace("/", "."): _np(v) for k, v in sd.items()}
    else:
        mapping = backbone_to_flat(backbone, sd)
    return assign_flat(backbone, mapping, strict=strict,
                       prefix=f"{type(backbone).__name__}: ")


def detector_sd_to_flat(model, sd):
    """Reference detector state dict (backbone./neck./bbox_head./rpn_head.
    prefixes) -> our paths.

    The backbone sub-dict routes through its family converter; neck/head
    keys translate mechanically (conv OIHW->HWIO, linear transpose,
    BN renames) — our module attribute names deliberately mirror the
    reference's (lateral_convs, fpn_convs, cls_convs, retina_cls, ...).
    FPN extra convs: the reference appends them to `fpn_convs`
    (necks/fpn.py:102-140); we keep them in a separate `extra_convs` list,
    so overflowing indices shift lists.
    """
    groups = {}
    for key, v in sd.items():
        if "." not in key:
            continue
        head, rest = key.split(".", 1)
        groups.setdefault(head, {})[rest] = v
    _, params = flat_paths(model)
    out = {}
    if "backbone" in groups and hasattr(model, "backbone"):
        for k, arr in backbone_to_flat(model.backbone,
                                       groups.pop("backbone")).items():
            out[f"backbone.{k}"] = arr
    n_fpn = None
    neck = getattr(model, "neck", None)
    if neck is not None and hasattr(neck, "fpn_convs"):
        n_fpn = len(neck.fpn_convs)
    def _put(head, k, arr):
        full = f"{head}.{k}"
        if full not in params:
            # where the reference wraps convs in ConvModule (.conv.) but
            # our module holds a bare conv (e.g. FPN laterals), collapse
            # the wrapper segment
            alt = full.replace(".conv.kernel", ".kernel").replace(
                ".conv.bias", ".bias"
            )
            if alt in params:
                full = alt
        out[full] = arr

    for head, sub in groups.items():
        for key, v in sub.items():
            k = key
            if head == "neck" and n_fpn is not None:
                m = re.match(r"^fpn_convs\.(\d+)\.(.+)$", k)
                if m and int(m.group(1)) >= n_fpn:
                    k = f"extra_convs.{int(m.group(1)) - n_fpn}.{m.group(2)}"
            arr = _np(v)
            if k.endswith("num_batches_tracked"):
                continue
            if arr.ndim == 4:
                _put(head, k.replace(".weight", ".kernel"), conv_w(arr))
            elif arr.ndim == 2 and k.endswith(".weight"):  # linear
                _put(head, k.replace(".weight", ".kernel"), arr.T)
            elif "running_mean" in k:
                _put(head, k.replace(".running_mean", ".mean"), arr)
            elif "running_var" in k:
                _put(head, k.replace(".running_var", ".var"), arr)
            elif k.endswith(".weight") and arr.ndim == 1:
                # BN/GN scale vs plain 1-D weights (e.g. L2Norm.weight):
                # scale only when running stats sit alongside
                base = key[: -len(".weight")]
                if f"{base}.running_mean" in sub:
                    _put(head, k.replace(".weight", ".scale"), arr)
                else:
                    _put(head, k, arr)
            else:
                _put(head, k, arr)
    return out


def import_jdet_checkpoint(model, path_or_payload, strict=False):
    """Import a reference-format detector checkpoint
    ({"meta", "model", ...} pkl, runner.py:224-261) into our detector."""
    if isinstance(path_or_payload, (str, bytes)):
        sd = load_blob(path_or_payload)
    else:
        payload = path_or_payload
        sd = payload.get("model", payload.get("state_dict", payload))
        sd = {k: _np(v) for k, v in sd.items()}
    mapping = detector_sd_to_flat(model, sd)
    return assign_flat(model, mapping, strict=strict, prefix="detector: ")
