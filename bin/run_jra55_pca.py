#!/usr/bin/env python
"""Thin shim for the jra55_pca driver: produces the PCs netCDF the
jra55_pca_{aa,gpnh,kmeans} drivers consume (the reference's jra55 PCA
notebook is a stripped large blob, .MISSING_LARGE_BLOBS:1)."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

from convex_dim_red_tpu.cli.drivers import jra55_pca_main

if __name__ == '__main__':
    sys.exit(jra55_pca_main() or 0)
