#!/usr/bin/env python
"""Thin shim for the jra55_pca_aa case-study driver
(mirrors reference bin/run_jra55_pca_aa.py)."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

from convex_dim_red_tpu.cli.drivers import jra55_pca_aa_main

if __name__ == '__main__':
    sys.exit(jra55_pca_aa_main() or 0)
