#!/usr/bin/env python
"""Generate synthetic JRA-55-schema datasets.

Zero-egress stand-ins for the JRA-55 hgt500 products: a gridded
anomaly file (dims ``initial_time0_hours, g0_lat_2, g0_lon_3``,
variable ``HGT_GDS0_ISBL_anom``) and a principal-components file
(variable ``PCs`` over ``initial_time0_hours, mode`` with the attrs the
PCA drivers expect).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from convex_dim_red_tpu.pipelines.dataset import Dataset, Variable


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('output_file')
    parser.add_argument('--kind', choices=['grid', 'pcs'], default='grid')
    parser.add_argument('--start-year', type=int, default=1958)
    parser.add_argument('--n-years', type=int, default=20)
    parser.add_argument('--n-lat', type=int, default=36)
    parser.add_argument('--n-lon', type=int, default=72)
    parser.add_argument('--n-modes', type=int, default=30)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    n_t = args.n_years * 12
    time = np.arange(n_t) * 730.5  # ~hourly CF axis, monthly spacing
    time_var = Variable(('initial_time0_hours',), time.astype('f8'),
                        {'units': 'hours since %d-1-1' % args.start_year})

    if args.kind == 'grid':
        lats = np.linspace(90.0, -90.0, args.n_lat)
        lons = np.linspace(0.0, 360.0 - 360.0 / args.n_lon, args.n_lon)
        k = 4
        from scipy.ndimage import gaussian_filter
        modes = np.stack([gaussian_filter(
            rng.standard_normal((args.n_lat, args.n_lon)), sigma=4)
            for _ in range(k)])
        pcs = rng.standard_normal((n_t, k)) * np.array([40, 25, 15, 10])
        anom = np.tensordot(pcs, modes, axes=(1, 0)) \
            + 5.0 * rng.standard_normal((n_t, args.n_lat, args.n_lon))
        ds = Dataset(
            data_vars={'HGT_GDS0_ISBL_anom': Variable(
                ('initial_time0_hours', 'g0_lat_2', 'g0_lon_3'),
                anom.astype('f4'), {'units': 'gpm'})},
            coords={
                'initial_time0_hours': time_var,
                'g0_lat_2': Variable(('g0_lat_2',), lats,
                                     {'units': 'degrees_north'}),
                'g0_lon_3': Variable(('g0_lon_3',), lons,
                                     {'units': 'degrees_east'}),
            },
            attrs={'title': 'synthetic JRA-55-schema hgt500 anomalies'})
    else:
        variance = 100.0 / (1.0 + np.arange(args.n_modes))
        pcs = rng.standard_normal((n_t, args.n_modes)) * np.sqrt(variance)
        ds = Dataset(
            data_vars={'PCs': Variable(
                ('initial_time0_hours', 'mode'), pcs.astype('f8'))},
            coords={
                'initial_time0_hours': time_var,
                'mode': Variable(('mode',), np.arange(args.n_modes)),
            },
            attrs={'title': 'synthetic JRA-55 hgt500 PCs',
                   'eofs_start_year': str(args.start_year),
                   'eofs_end_year': str(args.start_year + args.n_years - 1)})

    ds.to_netcdf(args.output_file)
    print('wrote', args.output_file)


if __name__ == '__main__':
    main()
