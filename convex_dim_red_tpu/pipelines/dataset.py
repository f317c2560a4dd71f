"""Minimal self-contained dataset container + netCDF4 (HDF5) IO.

The reference's drivers are built on xarray/netCDF4; neither is
installed in this image, but netCDF4 files are HDF5 files, so ``h5py``
(present) can read and write them.  This module provides a small
xarray-like ``Dataset`` (named dims, coords, attrs) sufficient for the
case-study pipelines, with CF-time decoding for the year/month filters
the drivers need.  If xarray *is* importable it is used transparently
for IO fidelity.
"""

import datetime
import re

import numpy as np

try:  # pragma: no cover - depends on environment
    import xarray as _xr
except Exception:  # pragma: no cover
    _xr = None

__all__ = ["Variable", "Dataset", "open_dataset", "decode_cf_time"]


class Variable:
    """A named array with dimension names and attributes."""

    def __init__(self, dims, data, attrs=None):
        self.dims = tuple(dims)
        self.data = np.asarray(data)
        self.attrs = dict(attrs or {})

    def __repr__(self):
        return f"Variable(dims={self.dims}, shape={self.data.shape})"


class Dataset:
    """Dict-of-variables container with named dimensions.

    Supports the subset of the xarray surface the drivers use:
    ``ds[name]``, ``ds.attrs``, ``ds.dims``, ``ds.coords``,
    ``sel_time_years``/``sel_range`` filters, and ``to_netcdf``.
    """

    def __init__(self, data_vars=None, coords=None, attrs=None):
        self.data_vars = dict(data_vars or {})
        self.coords = dict(coords or {})
        self.attrs = dict(attrs or {})

    def __getitem__(self, name):
        if name in self.data_vars:
            return self.data_vars[name]
        if name in self.coords:
            return self.coords[name]
        raise KeyError(name)

    def __contains__(self, name):
        return name in self.data_vars or name in self.coords

    @property
    def dims(self):
        sizes = {}
        for v in list(self.data_vars.values()) + list(self.coords.values()):
            for d, s in zip(v.dims, v.data.shape):
                sizes[d] = s
        return sizes

    # -- filtering ---------------------------------------------------------

    def isel(self, dim, indexer):
        """Integer-index along one dimension (returns a new Dataset)."""
        def take(var):
            if dim not in var.dims:
                return var
            axis = var.dims.index(dim)
            return Variable(var.dims, np.take(var.data, indexer, axis=axis),
                            var.attrs)

        return Dataset({k: take(v) for k, v in self.data_vars.items()},
                       {k: take(v) for k, v in self.coords.items()},
                       self.attrs)

    def sel_range(self, coord_name, vmin, vmax):
        """Keep indices where coord in [vmin, vmax]."""
        coord = self.coords[coord_name]
        if len(coord.dims) != 1:
            raise ValueError("sel_range needs a 1-D coordinate")
        mask = (coord.data >= vmin) & (coord.data <= vmax)
        return self.isel(coord.dims[0], np.where(mask)[0])

    def sel_time_years(self, time_name, start_year, end_year):
        """Keep samples whose decoded calendar year is in range."""
        years, _ = decode_cf_time(self.coords[time_name])
        mask = (years >= start_year) & (years <= end_year)
        return self.isel(self.coords[time_name].dims[0], np.where(mask)[0])

    # -- IO ----------------------------------------------------------------

    def to_netcdf(self, path):
        if _xr is not None:
            self._to_xarray().to_netcdf(path)
            return
        import h5py

        with h5py.File(path, "w") as f:
            dim_sizes = self.dims
            # Coordinate variables double as netCDF dimension scales.
            for name, var in self.coords.items():
                d = f.create_dataset(name, data=var.data)
                for k, v in var.attrs.items():
                    d.attrs[k] = v
                d.attrs["_Netcdf4Coordinates"] = [
                    list(dim_sizes).index(dim) for dim in var.dims]
                d.make_scale(name)
            for name, var in self.data_vars.items():
                d = f.create_dataset(name, data=var.data)
                d.attrs["_ARRAY_DIMENSIONS"] = [
                    s.encode() for s in var.dims]
                for k, v in var.attrs.items():
                    d.attrs[k] = v
                for axis, dim in enumerate(var.dims):
                    if dim in self.coords and dim in f:
                        d.dims[axis].attach_scale(f[dim])
            for k, v in self.attrs.items():
                f.attrs[k] = v

    def _to_xarray(self):  # pragma: no cover - xarray path
        coords = {k: (v.dims, v.data, v.attrs)
                  for k, v in self.coords.items()}
        data_vars = {k: (v.dims, v.data, v.attrs)
                     for k, v in self.data_vars.items()}
        return _xr.Dataset(data_vars, coords=coords, attrs=self.attrs)


_UNITS_RE = re.compile(
    r"^\s*(seconds|minutes|hours|days|months|years)\s+since\s+"
    r"(\d{1,4})-(\d{1,2})-(\d{1,2})")


def decode_cf_time(time_var):
    """Decode a CF-convention time variable to (years, months) arrays.

    Handles the unit bases used by HadISST/JRA-55 products.  Raw
    integer/float values with no CF units are passed through as years
    with month 1.
    """
    data = np.asarray(time_var.data)
    units = time_var.attrs.get("units", "")
    if isinstance(units, bytes):
        units = units.decode()

    if np.issubdtype(data.dtype, np.datetime64):
        dt = data.astype("datetime64[M]")
        years = dt.astype("datetime64[Y]").astype(int) + 1970
        months = (dt.astype(int) % 12) + 1
        return years, months

    m = _UNITS_RE.match(units)
    if not m:
        return data.astype(int), np.ones(data.shape, dtype=int)

    unit, y0, m0, d0 = (m.group(1), int(m.group(2)), int(m.group(3)),
                        int(m.group(4)))
    base = np.datetime64(
        datetime.datetime(max(y0, 1), m0, d0), "s")

    if unit == "months":
        total = (y0 * 12 + (m0 - 1)) + np.round(data).astype(int)
        return total // 12, total % 12 + 1
    if unit == "years":
        years = y0 + np.floor(data).astype(int)
        return years, np.ones(data.shape, dtype=int)

    seconds_per = {"seconds": 1, "minutes": 60, "hours": 3600,
                   "days": 86400}[unit]
    stamps = base + (data * seconds_per).astype("timedelta64[s]")
    months_abs = stamps.astype("datetime64[M]").astype(int)
    years = months_abs // 12 + 1970
    months = months_abs % 12 + 1
    return years, months


def open_dataset(path):
    """Open a netCDF4/HDF5 file as a :class:`Dataset`."""
    if _xr is not None:  # pragma: no cover - xarray path
        xds = _xr.open_dataset(path)
        coords = {k: Variable(v.dims, v.values, dict(v.attrs))
                  for k, v in xds.coords.items()}
        data_vars = {k: Variable(v.dims, v.values, dict(v.attrs))
                     for k, v in xds.data_vars.items()}
        return Dataset(data_vars, coords, dict(xds.attrs))

    import h5py

    coords = {}
    data_vars = {}
    attrs = {}

    def decode_attrs(h5attrs):
        out = {}
        for k, v in h5attrs.items():
            if k.startswith("_Netcdf4") or k in ("CLASS", "NAME",
                                                 "DIMENSION_LIST",
                                                 "REFERENCE_LIST",
                                                 "_ARRAY_DIMENSIONS"):
                continue
            if isinstance(v, bytes):
                v = v.decode(errors="replace")
            out[k] = v
        return out

    with h5py.File(path, "r") as f:
        attrs = decode_attrs(f.attrs)

        def dims_of(name, dset):
            # Prefer attached dimension scales; fall back to
            # _ARRAY_DIMENSIONS (zarr convention) or generated names.
            dims = []
            if dset.attrs.get("CLASS", b"") == b"DIMENSION_SCALE":
                return (name,)
            if "_ARRAY_DIMENSIONS" in dset.attrs:
                return tuple(
                    d.decode() if isinstance(d, bytes) else d
                    for d in dset.attrs["_ARRAY_DIMENSIONS"])
            for axis in range(dset.ndim):
                scales = dset.dims[axis] if hasattr(dset, "dims") else []
                label = None
                try:
                    for scale in scales:
                        label = scale.name.lstrip("/")
                        break
                except Exception:
                    label = None
                dims.append(label or f"{name}_dim{axis}")
            return tuple(dims)

        def visit(name, obj):
            import h5py as _h
            if not isinstance(obj, _h.Dataset):
                return
            var = Variable(dims_of(name, obj), obj[()],
                           decode_attrs(obj.attrs))
            fill = obj.attrs.get("_FillValue")
            if fill is not None and np.issubdtype(var.data.dtype,
                                                  np.floating):
                var.data = np.where(var.data == fill, np.nan, var.data)
            if obj.attrs.get("CLASS", b"") == b"DIMENSION_SCALE":
                coords[name] = var
            else:
                data_vars[name] = var

        f.visititems(visit)

    return Dataset(data_vars, coords, attrs)
