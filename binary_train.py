#!/usr/bin/env python
"""Launcher for action_detection_tpu.cli.binary_train (reference-compatible CLI)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from action_detection_tpu.cli.binary_train import main

if __name__ == "__main__":
    main()
