"""Run loggers: timestamped text file, TensorBoard scalars, composite.

Mirror of the reference logger hooks (`python/jdet/utils/logger.py:10-66`):
TextLogger writes `k: v` lines with a timestamp; TensorboardLogger logs
scalars keyed on `iter`; RunLogger composes both and pretty-prints to
console.
"""
from __future__ import annotations

import os
import time

from ..utils.registry import HOOKS


@HOOKS.register_module()
class TextLogger:
    def __init__(self, work_dir):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(
            work_dir, f"log_{time.strftime('%Y%m%d_%H%M%S')}.txt"
        )
        self._f = open(self.path, "a")

    def log(self, data):
        line = time.strftime("%Y-%m-%d %H:%M:%S") + " " + ", ".join(
            f"{k}: {v}" for k, v in data.items()
        )
        self._f.write(line + "\n")
        self._f.flush()


@HOOKS.register_module()
class TensorboardLogger:
    def __init__(self, work_dir):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(os.path.join(work_dir, "tensorboard"))

    def log(self, data):
        step = int(data.get("iter", 0))
        for k, v in data.items():
            if isinstance(v, (int, float)) and k != "iter":
                self.writer.add_scalar(k, v, step)


@HOOKS.register_module()
class RunLogger:
    def __init__(self, work_dir, loggers=("TextLogger", "TensorboardLogger")):
        self.loggers = []
        for name in loggers:
            try:
                self.loggers.append(HOOKS.get(name)(work_dir))
            except Exception as e:  # tensorboard optional
                print(f"[logger] {name} disabled: {e}")

    def log(self, data):
        data = {
            k: (round(float(v), 5) if hasattr(v, "dtype") or isinstance(v, float) else v)
            for k, v in data.items()
        }
        for lg in self.loggers:
            lg.log(data)
        msg = ", ".join(f"{k}: {v}" for k, v in data.items())
        print(msg, flush=True)

    def print_on_screen(self, data):
        print(", ".join(f"{k}: {v}" for k, v in data.items()), flush=True)
