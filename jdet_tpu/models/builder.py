"""Config-driven model construction.

Counterpart of the reference's `build_from_cfg(cfg.model, MODELS)` entry
(`python/jdet/runner/runner.py:37`): detector configs keep the reference's
shape — {type, backbone{type,...}, neck{...}, bbox_head{...}} (plus
rpn_head/roi_heads for two-stage) — and are assembled with explicit nnx
Rngs threading.
"""
from __future__ import annotations

from flax import nnx

from ..utils.registry import BACKBONES, HEADS, MODELS, NECKS

# imports for registration side effects
from . import backbones as _backbones  # noqa: F401
from . import necks as _necks  # noqa: F401
from . import heads as _heads  # noqa: F401
from . import detectors as _detectors  # noqa: F401


def build_detector(cfg, rngs=None, seed=0, load_pretrained=True):
    """Build a detector from a reference-style model config dict.

    load_pretrained=False builds the architecture but skips loading
    `backbone.pretrained` weights (tests / weight-conversion tooling —
    the reference's `pretrained=False` factory arg,
    backbones/resnet.py:192-235).
    """
    if rngs is None:
        rngs = nnx.Rngs(seed)
    cfg = dict(cfg)
    det_type = cfg.pop("type")
    parts = {}
    if "backbone" in cfg:
        bcfg = dict(cfg.pop("backbone"))
        bcls = BACKBONES.get(bcfg.pop("type"))
        pretrained = bcfg.pop("pretrained", None)
        backbone = bcls(rngs=rngs, **bcfg)
        if isinstance(pretrained, str) and load_pretrained:
            # file-based counterpart of the reference's jittorhub auto-load
            # (backbones/resnet.py:192-235); no egress here, so configs
            # point at a local state-dict file
            import os

            if not os.path.exists(pretrained):
                raise FileNotFoundError(
                    f"backbone.pretrained={pretrained!r} not found. "
                    "Convert ImageNet weights once with "
                    "`python tools/convert_weights.py --family <fam> "
                    f"--src <weights> --out {pretrained}` (no network "
                    "egress here), or remove the key to train from "
                    "scratch."
                )
            from .pretrained import load_pretrained_backbone

            load_pretrained_backbone(backbone, pretrained)
        elif pretrained and not isinstance(pretrained, str):
            raise ValueError(
                "backbone.pretrained must be a local state-dict path "
                "(this environment has no network egress)"
            )
        parts["backbone"] = backbone
    if cfg.get("neck") is not None:
        ncfg = dict(cfg.pop("neck"))
        ncls = NECKS.get(ncfg.pop("type"))
        if "in_channels" not in ncfg and "backbone" in parts:
            ncfg["in_channels"] = parts["backbone"].out_channels
        parts["neck"] = ncls(rngs=rngs, **ncfg)
    else:
        cfg.pop("neck", None)
    for key in ("bbox_head", "rpn_head", "roi_head", "bbox_head_2"):
        if cfg.get(key) is not None:
            hcfg = dict(cfg.pop(key))
            hcls = HEADS.get(hcfg.pop("type"))
            parts[key] = hcls(rngs=rngs, **hcfg)
        else:
            cfg.pop(key, None)
    if cfg.get("teacher") is not None:
        tcfg = cfg.pop("teacher")
        ckpt = cfg.pop("teacher_ckpt", None)
        parts["teacher"] = build_detector(dict(tcfg), rngs=rngs,
                                          load_pretrained=load_pretrained)
        if ckpt:
            parts["teacher_ckpt"] = ckpt
    else:
        cfg.pop("teacher", None)
        cfg.pop("teacher_ckpt", None)
    det_cls = MODELS.get(det_type)
    import inspect

    if "rngs" in inspect.signature(det_cls.__init__).parameters:
        return det_cls(**parts, **cfg, rngs=rngs)
    return det_cls(**parts, **cfg)
