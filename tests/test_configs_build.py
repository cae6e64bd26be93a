"""Every zoo config must load (base-merge) and build its detector."""
import glob
import os

import pytest

from jdet_tpu.config.config import load_cfg_file
from jdet_tpu.models.builder import build_detector

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CFG_DIR, "*.py"))
    if "_base_" not in os.path.basename(p)
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    cfg = load_cfg_file(path)
    assert "model" in cfg and "dataset" in cfg and "optimizer" in cfg
    # shrink the model so init is fast but construction paths all run
    m = dict(cfg["model"])
    # architecture only: pretrained files are converted per-machine
    # (tools/convert_weights.py) and absent in CI
    model = build_detector(m, seed=0, load_pretrained=False)
    assert model is not None
