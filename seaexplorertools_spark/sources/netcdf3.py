"""Minimal pure-python NetCDF3 *classic* (CDF-1) writer/reader.

Implements the public NetCDF classic file-format specification
(https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html):
big-endian header with dim/attr/var lists, fixed-size data section, 4-byte
alignment. Only what the AD2CP ingestion fallback needs: fixed dimensions
(no record/unlimited dim), numeric types, global attributes.

Why it exists: the reference ingests NetCDF4/HDF5 groups via xarray
(``process_adcp.py:161-163``), but neither netCDF4 nor xarray is available
in every runtime. Groups do not exist in the classic model, so the fallback
uses the standard flattening convention: a variable ``VelocityBeam1`` in
group ``Data/Average`` is stored as ``Data_Average_VelocityBeam1`` and the
``Config`` group's attributes become global attributes prefixed
``Config_``. ``sources.netcdf.ingest_ad2cp`` consumes either layout.
"""

from __future__ import annotations

import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_TYPE_OF_DTYPE = {
    np.dtype(">i1"): NC_BYTE,
    np.dtype(">i2"): NC_SHORT,
    np.dtype(">i4"): NC_INT,
    np.dtype(">f4"): NC_FLOAT,
    np.dtype(">f8"): NC_DOUBLE,
}
_DTYPE_OF_TYPE = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_SIZE_OF_TYPE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _name_bytes(name: str) -> bytes:
    raw = name.encode("utf-8")
    return struct.pack(">i", len(raw)) + raw + b"\x00" * _pad4(len(raw))


def _nc_type_for(arr: np.ndarray) -> int:
    be = arr.dtype.newbyteorder(">")
    if be not in _TYPE_OF_DTYPE:
        raise TypeError(f"unsupported dtype {arr.dtype} (use i1/i2/i4/f4/f8)")
    return _TYPE_OF_DTYPE[be]


def _attr_bytes(name: str, value) -> bytes:
    out = _name_bytes(name)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return out + struct.pack(">ii", NC_CHAR, len(raw)) + raw + b"\x00" * _pad4(len(raw))
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i":
        arr = arr.astype(">i4")
    elif arr.dtype.kind == "f":
        arr = arr.astype(">f8")
    else:
        raise TypeError(f"unsupported attribute type {arr.dtype}")
    t = _TYPE_OF_DTYPE[arr.dtype]
    raw = arr.tobytes()
    return out + struct.pack(">ii", t, arr.size) + raw + b"\x00" * _pad4(len(raw))


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    attrs: dict | None = None,
) -> None:
    """Write a classic (CDF-1) NetCDF file with fixed dimensions.

    ``variables`` maps name -> (dim-name tuple, ndarray); array shapes must
    match the named dims. ``attrs`` are global attributes (str, int, float,
    or numeric sequences).
    """
    attrs = attrs or {}
    dim_ids = {name: i for i, name in enumerate(dims)}
    for name, (vdims, arr) in variables.items():
        shape = tuple(dims[d] for d in vdims)
        if tuple(np.asarray(arr).shape) != shape:
            raise ValueError(f"{name}: shape {np.asarray(arr).shape} != dims {shape}")

    header = bytearray()
    header += b"CDF\x01"
    header += struct.pack(">i", 0)  # numrecs (no record vars)
    if dims:
        header += struct.pack(">ii", NC_DIMENSION, len(dims))
        for name, size in dims.items():
            header += _name_bytes(name) + struct.pack(">i", size)
    else:
        header += struct.pack(">ii", 0, 0)
    if attrs:
        header += struct.pack(">ii", NC_ATTRIBUTE, len(attrs))
        for name, value in attrs.items():
            header += _attr_bytes(name, value)
    else:
        header += struct.pack(">ii", 0, 0)

    var_meta = []
    for name, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        t = _nc_type_for(arr)
        data = arr.astype(arr.dtype.newbyteorder(">")).tobytes()
        vsize = len(data) + _pad4(len(data))
        var_meta.append((name, vdims, t, vsize, data))

    if var_meta:
        body = bytearray()
        body += struct.pack(">ii", NC_VARIABLE, len(var_meta))
        # first pass with placeholder begins to learn the header length
        fixed = bytearray()
        for name, vdims, t, vsize, _ in var_meta:
            fixed += _name_bytes(name)
            fixed += struct.pack(">i", len(vdims))
            for d in vdims:
                fixed += struct.pack(">i", dim_ids[d])
            fixed += struct.pack(">ii", 0, 0)  # no var attrs
            fixed += struct.pack(">iii", t, vsize, 0)  # begin placeholder
        header_len = len(header) + len(body) + len(fixed)
        begin = header_len
        for name, vdims, t, vsize, _ in var_meta:
            body += _name_bytes(name)
            body += struct.pack(">i", len(vdims))
            for d in vdims:
                body += struct.pack(">i", dim_ids[d])
            body += struct.pack(">ii", 0, 0)
            body += struct.pack(">iii", t, vsize, begin)
            begin += vsize
        header += body
    else:
        header += struct.pack(">ii", 0, 0)

    with open(path, "wb") as fh:
        fh.write(header)
        for _, _, _, vsize, data in var_meta:
            fh.write(data + b"\x00" * (vsize - len(data)))


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def name(self) -> str:
        n = self.i4()
        raw = self.take(n)
        self.take(_pad4(n))
        return raw.decode("utf-8")

    def attr_value(self):
        t = self.i4()
        nelems = self.i4()
        size = nelems * _SIZE_OF_TYPE[t]
        raw = self.take(size)
        self.take(_pad4(size))
        if t == NC_CHAR:
            return raw.decode("utf-8")
        vals = np.frombuffer(raw, dtype=_DTYPE_OF_TYPE[t])
        return vals[0].item() if nelems == 1 else vals


def read_netcdf3(path: str):
    """Read a classic (CDF-1/CDF-2) NetCDF file written by any conforming
    writer. Returns ``(dims, variables, attrs)`` where ``variables`` maps
    name -> ndarray (native byte order). Record variables (unlimited dim)
    are out of scope for the ingestion fallback and rejected."""
    with open(path, "rb") as fh:
        buf = fh.read()
    c = _Cursor(buf)
    magic = c.take(4)
    if magic[:3] != b"CDF" or magic[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF3 file (magic {magic!r})")
    offset64 = magic[3] == 2
    numrecs = c.i4()
    if numrecs not in (0,):
        raise NotImplementedError("record (unlimited) dimensions not supported")

    tag, n = c.i4(), c.i4()
    dims: dict[str, int] = {}
    dim_sizes: list[int] = []
    if tag == NC_DIMENSION:
        for _ in range(n):
            name = c.name()
            size = c.i4()
            dims[name] = size
            dim_sizes.append(size)
    attrs: dict = {}
    tag, n = c.i4(), c.i4()
    if tag == NC_ATTRIBUTE:
        for _ in range(n):
            name = c.name()
            attrs[name] = c.attr_value()
    variables: dict[str, np.ndarray] = {}
    tag, n = c.i4(), c.i4()
    if tag == NC_VARIABLE:
        for _ in range(n):
            name = c.name()
            ndims = c.i4()
            shape = tuple(dim_sizes[c.i4()] for _ in range(ndims))
            vtag, vn = c.i4(), c.i4()
            if vtag == NC_ATTRIBUTE:
                for _ in range(vn):
                    c.name()
                    c.attr_value()
            t = c.i4()
            c.i4()  # vsize
            begin = struct.unpack(">q", c.take(8))[0] if offset64 else c.i4()
            count = int(np.prod(shape)) if shape else 1
            raw = buf[begin : begin + count * _SIZE_OF_TYPE[t]]
            arr = np.frombuffer(raw, dtype=_DTYPE_OF_TYPE[t]).reshape(shape)
            variables[name] = arr.astype(arr.dtype.newbyteorder("="))
    return dims, variables, attrs
