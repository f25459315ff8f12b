#!/usr/bin/env python
"""Drop-in training entry point (same CLI surface as the reference's
train_mvs4.py; see deep_reconstruction_with_epipolar_lines_mvster_tpu/cli/train.py)."""

from deep_reconstruction_with_epipolar_lines_mvster_tpu.cli.train import main

if __name__ == "__main__":
    main()
