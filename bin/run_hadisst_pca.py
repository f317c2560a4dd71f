#!/usr/bin/env python
"""Thin shim for the hadisst_pca case-study driver (mirrors the
reference notebooks/hadisst_pca.ipynb run_pca product)."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

from convex_dim_red_tpu.cli.drivers import hadisst_pca_main

if __name__ == '__main__':
    sys.exit(hadisst_pca_main() or 0)
