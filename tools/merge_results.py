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
    files = write_dota_submission(
        merged, classes, args.out_dir, zip_path=args.zip
    )
    print(f"wrote {len(files)} submission files to {args.out_dir}")


if __name__ == "__main__":
    main()
