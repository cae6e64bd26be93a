"""Run the per-model golden-loss regression suite.

Capability mirror of the reference `tools/test_models.py:1-20`, which
downloads a frozen `test_datas.zip` fixture bundle and runs each
project's 11-iteration loss-trajectory test. Here the fixtures live in
`tests/fixtures/golden_losses.json` (committed, self-regenerating for
new families) and the per-model tests are pytest parametrizations of
`tests/test_golden_loss.py` — same protocol: pinned seed, 11 train
iterations, per-iteration loss match within 5% (reference
`docs/add_model_tests.md`, `projects/s2anet/test_s2anet.py:19-74`).

Usage:
    python tools/test_models.py            # all families
    python tools/test_models.py s2anet yolo  # a subset
"""
import os
import sys
import subprocess


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    if args:
        targets = [
            f"tests/test_golden_loss.py::test_golden_loss_trajectory[{t}]"
            for t in args
        ]
    else:
        targets = ["tests/test_golden_loss.py"]
    cmd = [sys.executable, "-m", "pytest", "-v", *targets]
    raise SystemExit(subprocess.call(cmd, cwd=repo))


if __name__ == "__main__":
    main()
