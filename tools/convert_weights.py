"""Convert reference/torch weight files into jdet_tpu checkpoints.

Counterpart of the reference's jittorhub auto-download + pkl checkpoint
loading (`python/jdet/models/backbones/resnet.py:192-235`,
`python/jdet/runner/runner.py:224-261`): reads a torchvision `.pth`, a
jittor/JDet `.pkl` (backbone state dict or full detector checkpoint) and
writes a jdet_tpu-format checkpoint that `Runner.load` / configs'
`backbone.pretrained=` consume directly.

Usage:
  # ImageNet backbone -> importable backbone state file
  python tools/convert_weights.py --src resnet50.pth --family resnet50 \
      --out work/pretrained/resnet50.jtp.pkl

  # reference detector checkpoint -> jdet_tpu checkpoint
  python tools/convert_weights.py --src ckpt_12.pkl \
      --config-file configs/s2anet_r50_fpn_1x_dota.py \
      --out work/s2anet_imported.jtp.pkl
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FAMILIES = {
    "resnet18": dict(type="ResNet", depth=18),
    "resnet34": dict(type="ResNet", depth=34),
    "resnet50": dict(type="ResNet", depth=50),
    "resnet101": dict(type="ResNet", depth=101),
    "resnet50_v1d": dict(type="ResNet_v1d", depth=50),
    "resnet101_v1d": dict(type="ResNet_v1d", depth=101),
    "reresnet50": dict(type="ReResNet", depth=50, base_fields=8),
    "lsknet_t": dict(type="LSKNet", arch="t"),
    "lsknet_s": dict(type="LSKNet", arch="s"),
    "stripnet_s": dict(type="StripNet", arch="s"),
    "vgg16": dict(type="SSDVGG"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".pth/.pkl source weights")
    ap.add_argument("--family", choices=sorted(FAMILIES),
                    help="backbone family (for ImageNet state dicts)")
    ap.add_argument("--config-file",
                    help="detector config (for full detector checkpoints)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--strict", action="store_true",
                    help="fail on unmatched source keys")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import nnx

    from jdet_tpu.models.pretrained import (
        backbone_to_flat,
        import_jdet_checkpoint,
        load_blob,
    )
    from jdet_tpu.runner.checkpoint import save_checkpoint, state_to_numpy
    from jdet_tpu.utils.registry import BACKBONES
    from jdet_tpu.models import builder as _b  # noqa: F401 (registration)

    if args.config_file:
        from jdet_tpu.config.config import load_cfg_file
        from jdet_tpu.models.builder import build_detector

        cfg = load_cfg_file(args.config_file)
        # skip backbone.pretrained auto-load: the imported checkpoint
        # replaces every weight anyway
        model = build_detector(dict(cfg["model"]), seed=0,
                               load_pretrained=False)
        loaded, missing, unexpected = import_jdet_checkpoint(
            model, args.src, strict=args.strict
        )
        save_checkpoint(args.out, model,
                        meta={"imported_from": args.src})
    elif args.family:
        bcfg = dict(FAMILIES[args.family])
        bcls = BACKBONES.get(bcfg.pop("type"))
        model = bcls(rngs=nnx.Rngs(0), **bcfg)
        sd = load_blob(args.src)
        mapping = backbone_to_flat(model, sd)
        from jdet_tpu.models.pretrained import assign_flat

        loaded, missing, unexpected = assign_flat(
            model, mapping, strict=args.strict
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "wb") as f:
            pickle.dump(
                {"meta": {"jdet_tpu_version": "0.1.0",
                          "family": args.family,
                          "imported_from": args.src},
                 "model": state_to_numpy(nnx.state(model))},
                f, protocol=4,
            )
    else:
        ap.error("pass --family (backbone) or --config-file (detector)")

    print(f"loaded {len(loaded)} tensors -> {args.out}"
          f" ({len(missing)} model params left at init,"
          f" {len(unexpected)} source keys unused)")


if __name__ == "__main__":
    main()
