"""Lightweight NetCDF read/write.

Replaces the reference's easy_netcdf wrapper (utilities/easy_netcdf.F90).
All the reference test inputs are classic NetCDF3 (CDF-1), which
scipy.io.netcdf handles without external dependencies; outputs are written
as NetCDF3 classic, matching the reference driver's default output format.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file


class InputFile:
    """Read-only NetCDF3 file with numpy-native variable access."""

    def __init__(self, path: str):
        self._f = netcdf_file(path, "r", mmap=False)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def exists(self, name: str) -> bool:
        return name in self._f.variables

    def rank(self, name: str) -> int:
        return len(self._f.variables[name].dimensions)

    def get(self, name: str, dtype=np.float64) -> np.ndarray:
        v = self._f.variables[name]
        data = np.array(v[:])
        return data.astype(dtype)

    def dimensions(self) -> dict:
        return dict(self._f.dimensions)


class OutputFile:
    """NetCDF3-classic writer mirroring the easy_netcdf create/define/put
    API used by the output writer (radsurf/radsurf_save.F90)."""

    def __init__(self, path: str):
        self._f = netcdf_file(path, "w")
        self._attrs: dict = {}

    def define_dimension(self, name: str, size: int):
        self._f.createDimension(name, size)

    def put_global_attributes(self, **attrs):
        for key, val in attrs.items():
            name = key[:-4] if key.endswith("_str") else key
            setattr(self._f, name, val)

    def define_variable(self, name, dims, dtype="d", units=None,
                        long_name=None, fill_value=None, **attrs):
        var = self._f.createVariable(name, dtype, dims)
        if units is not None:
            var.units = units
        if long_name is not None:
            var.long_name = long_name
        if fill_value is not None:
            var._FillValue = fill_value
        for key, val in attrs.items():
            setattr(var, key, val)
        return var

    def put(self, name, data):
        self._f.variables[name][:] = np.asarray(data)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
