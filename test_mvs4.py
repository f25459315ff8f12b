#!/usr/bin/env python
"""Drop-in eval/reconstruction entry point (same CLI surface as the
reference's test_mvs4.py; see
deep_reconstruction_with_epipolar_lines_mvster_tpu/cli/test.py)."""

from deep_reconstruction_with_epipolar_lines_mvster_tpu.cli.test import main

if __name__ == "__main__":
    main()
