#!/usr/bin/env python
"""Thin shim for the hadisst_gpnh case-study driver
(mirrors reference bin/run_hadisst_gpnh.py)."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

from convex_dim_red_tpu.cli.drivers import hadisst_gpnh_main

if __name__ == '__main__':
    sys.exit(hadisst_gpnh_main() or 0)
