"""General utilities.

Mirrors of the reference helpers (`python/jdet/utils/general.py`):
`multi_apply` (:50), `parse_losses` (:67, sums values whose key contains
"loss"), `check_interval` (:117), `search_ckpt` (:158), `build_file`
(:105), `list_images` (:147), `set_random_seed` (:82).
"""
from __future__ import annotations

import glob
import os
import random
import re

import numpy as np


def multi_apply(func, *args, **kwargs):
    """Apply func over zipped lists, transpose results (general.py:50)."""
    from functools import partial

    pfunc = partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))


def parse_losses(losses):
    """Sum every entry whose key contains 'loss' (general.py:67-80).
    List-valued entries are summed elementwise first."""
    total = 0.0
    log_vars = {}
    for k, v in losses.items():
        if isinstance(v, (list, tuple)):
            v = sum(v)
        log_vars[k] = v
        if "loss" in k:
            total = total + v
    log_vars["total_loss"] = total
    return total, log_vars


def check_interval(step, interval):
    """True every `interval` steps (general.py:117)."""
    if interval is None or interval <= 0:
        return False
    return step % interval == 0


def build_file(work_dir, prefix):
    """work_dir/prefix path with directories created (general.py:105)."""
    path = os.path.join(work_dir, prefix)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def search_ckpt(work_dir):
    """Newest checkpoint by epoch number in work_dir/checkpoints
    (general.py:158-163)."""
    files = glob.glob(os.path.join(work_dir, "checkpoints", "ckpt_*.pkl"))
    if not files:
        return None

    def epoch_of(f):
        m = re.search(r"ckpt_(\d+)", os.path.basename(f))
        return int(m.group(1)) if m else -1

    return max(files, key=epoch_of)


def list_images(path):
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, names in os.walk(path):
        out.extend(
            os.path.join(root, n) for n in names if n.lower().endswith(exts)
        )
    return sorted(out)


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def to_numpy(tree):
    """Device tree -> host numpy tree."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
