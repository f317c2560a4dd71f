#!/usr/bin/env python
"""Generate a synthetic HadISST-schema SST dataset.

Zero-egress stand-in for bin/get_hadisst.sh: produces a netCDF file with
(time, latitude, longitude) monthly SST containing a seasonal cycle,
linear trend, low-rank anomaly structure, and land NaNs — the same
variable/coordinate layout the anomaly pipeline and case-study drivers
expect.
"""

import argparse

import numpy as np

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from convex_dim_red_tpu.pipelines.dataset import Dataset, Variable


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('output_file')
    parser.add_argument('--start-year', type=int, default=1870)
    parser.add_argument('--n-years', type=int, default=149)
    parser.add_argument('--n-lat', type=int, default=180)
    parser.add_argument('--n-lon', type=int, default=360)
    parser.add_argument('--land-frac', type=float, default=0.3)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    n_t = args.n_years * 12
    lats = np.linspace(89.5, -89.5, args.n_lat)
    lons = np.linspace(-179.5, 179.5, args.n_lon)

    t = np.arange(n_t)
    month = t % 12

    # Seasonal cycle scaled by |latitude|, hemisphere-antisymmetric.
    seasonal = (np.cos(2 * np.pi * (month[:, None] - 1) / 12)[..., None]
                * np.sign(lats)[None, :, None]
                * (np.abs(lats) / 90.0)[None, :, None]
                * np.ones(args.n_lon)[None, None, :]) * 5.0
    trend = 0.8 * (t / n_t)[:, None, None]
    base = 20.0 * np.cos(np.deg2rad(lats))[None, :, None]

    # Low-rank anomaly structure (a few large-scale modes).
    k = 5
    modes = rng.standard_normal((k, args.n_lat, args.n_lon))
    from scipy.ndimage import gaussian_filter
    modes = np.stack([gaussian_filter(m, sigma=8) for m in modes])
    pcs = rng.standard_normal((n_t, k)) * np.array([3, 2, 1.5, 1, 0.8])
    anom = np.tensordot(pcs, modes, axes=(1, 0))
    noise = 0.2 * rng.standard_normal((n_t, args.n_lat, args.n_lon))

    sst = base + seasonal + trend + anom + noise

    # Land mask: random blobs.
    land = gaussian_filter(
        rng.standard_normal((args.n_lat, args.n_lon)), sigma=6)
    thresh = np.quantile(land, 1 - args.land_frac)
    sst[:, land > thresh] = np.nan

    # CF monthly time axis: days since start (30.44-day months approx).
    time = np.round(np.arange(n_t) * 30.4375).astype('f8')

    ds = Dataset(
        data_vars={'sst': Variable(('time', 'latitude', 'longitude'),
                                   sst.astype('f4'),
                                   {'units': 'degC'})},
        coords={
            'time': Variable(('time',), time,
                             {'units': 'days since %d-1-1'
                              % args.start_year}),
            'latitude': Variable(('latitude',), lats,
                                 {'units': 'degrees_north'}),
            'longitude': Variable(('longitude',), lons,
                                  {'units': 'degrees_east'}),
        },
        attrs={'title': 'synthetic HadISST-schema SST'})
    ds.to_netcdf(args.output_file)
    print('wrote', args.output_file, 'shape', sst.shape)


if __name__ == '__main__':
    main()
