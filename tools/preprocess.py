"""Dataset preprocessing CLI: tile + convert to labels.pkl.

Mirror of the reference entry (`tools/preprocess.py:99-122`): reads the
`dataset.preprocess` section of a config (source dirs, subsize, gap,
rates, tasks) and produces tiled images/labelTxt plus labels.pkl.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--clear", action="store_true",
                        help="remove existing outputs first")
    args = parser.parse_args()

    from jdet_tpu.config import init_cfg, get_cfg
    from jdet_tpu.config.constants import get_classes_by_name
    from jdet_tpu.data.devkits.tiling import process, convert_to_pkl

    init_cfg(args.config_file)
    cfg = get_cfg()
    pcfg = cfg.preprocess or cfg.dataset.get("preprocess")
    assert pcfg, "config needs a `preprocess` section"
    classes = get_classes_by_name(pcfg.get("dataset_type", "DOTA"))

    # optional format-conversion step before tiling (reference
    # tools/preprocess.py:23-55): SSDD/SSDD+ -> DOTA (+labels.pkl, no
    # tiling needed), FAIR -> DOTA (then tiled below).
    conv = pcfg.get("convert")
    if conv:
        ctype = conv["type"]
        if ctype in ("SSDD", "SSDD+"):
            from jdet_tpu.data.devkits.converters import ssdd_to_dota

            for task in conv["tasks"]:
                out_path = task["out_dir"]
                print(f"[preprocess] ssdd_to_dota -> {out_path}")
                ssdd_to_dota(
                    task["image_dir"], task["label_dir"], out_path,
                    resize=conv.get("resize", 512), plus=ctype == "SSDD+",
                )
                convert_to_pkl(out_path, os.path.join(out_path, "labels.pkl"),
                               classes, trainval=True,
                               filter_empty_gt=task.get("filter_empty_gt", True))
        elif ctype in ("FAIR", "FAIR1M_1_5"):
            from jdet_tpu.data.devkits.converters import fair_to_dota

            for task in conv["tasks"]:
                print(f"[preprocess] fair_to_dota -> {task['out_dir']}")
                fair_to_dota(task["in_dir"], task["out_dir"])
        else:
            raise ValueError(f"unknown convert type {ctype}")

    for task in pcfg.get("tasks", []):
        out_dir = task["out_dir"]
        if args.clear and os.path.exists(out_dir):
            import shutil

            shutil.rmtree(out_dir)
        print(f"[preprocess] tiling {task['image_dir']} -> {out_dir}")
        process(
            task["image_dir"],
            task.get("label_dir"),
            out_dir,
            subsize=pcfg.get("subsize", 1024),
            gap=pcfg.get("gap", 200),
            rates=tuple(pcfg.get("rates", [1.0])),
            thresh=pcfg.get("iou_thresh", 0.7),
        )
        if task.get("label_dir"):
            pkl = os.path.join(out_dir, "labels.pkl")
            convert_to_pkl(out_dir, pkl, classes,
                           trainval=True,
                           filter_empty_gt=task.get("filter_empty_gt", True))
            print(f"[preprocess] wrote {pkl}")


if __name__ == "__main__":
    main()
