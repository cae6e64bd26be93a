"""Training/eval CLI.

Mirror of the reference entry (`tools/run_net.py:8-53`):
  python tools/run_net.py --config-file <cfg> --task {train,val,test,vis_test}
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument(
        "--task", default="train",
        choices=["train", "val", "test", "vis_test", "test_time"],
    )
    parser.add_argument("--save_dir", default=None)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from jdet_tpu.config import init_cfg, get_cfg
    from jdet_tpu.runner import Runner

    init_cfg(args.config_file)
    cfg = get_cfg()
    if args.save_dir:
        cfg["work_dir"] = args.save_dir

    runner = Runner(cfg)
    if args.task == "train":
        runner.run()
    elif args.task == "val":
        print(runner.val())
    elif args.task == "test":
        print(runner.test())
    elif args.task == "test_time":
        print(runner.test_time())
    elif args.task == "vis_test":
        runner.run_on_images(
            cfg.images_dir, os.path.join(runner.work_dir, "vis")
        )


if __name__ == "__main__":
    main()
