"""Merge per-tile detection pickles into whole-image DOTA submissions.

Mirror of the reference entry (`tools/merge_results.py:66`): loads a
Runner test pickle (tile-level results), runs tile-merge NMS, writes the
per-class submission txts and a zip.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True, help="test_*.pkl path")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--dataset-type", default="DOTA")
    parser.add_argument("--nms-thr", type=float, default=0.1)
    parser.add_argument("--zip", default=None)
    parser.add_argument("--images-dir", default="",
                        help="test images dir (FAIR conversions key every "
                        "image, even empty ones)")
    parser.add_argument("--name", default="submission",
                        help="submission artifact name")
    args = parser.parse_args()

    from jdet_tpu.config.constants import get_classes_by_name
    from jdet_tpu.data.devkits.result_merge import (
        merge_results,
        write_dota_submission,
    )

    classes = get_classes_by_name(args.dataset_type)
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    merged = merge_results(results, classes, iou_thr=args.nms_thr)
    files = write_dota_submission(merged, classes, args.out_dir)
    print(f"wrote {len(files)} submission files to {args.out_dir}")

    if args.dataset_type in ("FAIR", "FAIR1M_1_5") or args.zip:
        # FAIR flavors convert to XML/csv before packaging
        # (reference devkits/data_merge.py:68-104)
        from jdet_tpu.data.devkits.converters import finalize_submission

        artifact = finalize_submission(
            args.out_dir, args.out_dir, args.name, args.dataset_type,
            images_dir=args.images_dir, zip_path=args.zip,
        )
        print(f"submission artifact: {artifact}")


if __name__ == "__main__":
    main()
