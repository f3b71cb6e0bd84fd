"""Minimal pure-python NetCDF3 *classic* (CDF-1) writer/reader.

Implements the public NetCDF classic file-format specification
(https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html):
big-endian header with dim/attr/var lists, fixed-size data section, 4-byte
alignment, and the RECORD (unlimited) dimension with interleaved record
slabs — real ad2cp mission files append along an unlimited time dimension
(the reference's own fixtures, tests/test_adcp_processing.py:13, are that
shape), so the reader handles both layouts. Numeric types and global
attributes; groups flattened per the convention below.

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
    dims: dict[str, int | None],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
    attrs: dict | None = None,
) -> None:
    """Write a classic (CDF-1) NetCDF file.

    ``variables`` maps name -> (dim-name tuple, ndarray); array shapes must
    match the named dims. ``attrs`` are global attributes (str, int, float,
    or numeric sequences). A dim with size ``None`` (or 0) is the RECORD
    (unlimited) dimension — at most one, and it may only appear as a
    variable's FIRST dimension; record variables are stored interleaved
    per the classic spec (one slab per record, each variable's per-record
    chunk padded to 4 bytes unless it is the only record variable)."""
    attrs = attrs or {}
    dim_ids = {name: i for i, name in enumerate(dims)}
    rec_dims = [d for d, s in dims.items() if s is None or s == 0]
    if len(rec_dims) > 1:
        raise ValueError(f"at most one record dimension allowed, got {rec_dims}")
    rec_dim = rec_dims[0] if rec_dims else None

    numrecs = None  # None = no record var seen yet (0 is a VALID count)
    for name, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        if rec_dim is not None and rec_dim in vdims:
            if vdims[0] != rec_dim or rec_dim in vdims[1:]:
                raise ValueError(
                    f"{name}: record dim {rec_dim!r} must be the first (and only"
                    f" record) dimension, got {vdims}"
                )
            shape = tuple(dims[d] for d in vdims[1:])
            if tuple(arr.shape[1:]) != shape:
                raise ValueError(f"{name}: shape {arr.shape} != dims (rec, {shape})")
            if numrecs is not None and arr.shape[0] != numrecs:
                raise ValueError(
                    f"{name}: {arr.shape[0]} records != {numrecs} in earlier vars"
                )
            numrecs = arr.shape[0]
        else:
            shape = tuple(dims[d] for d in vdims)
            if tuple(arr.shape) != shape:
                raise ValueError(f"{name}: shape {arr.shape} != dims {shape}")

    numrecs = numrecs or 0
    header = bytearray()
    header += b"CDF\x01"
    header += struct.pack(">i", numrecs)
    if dims:
        header += struct.pack(">ii", NC_DIMENSION, len(dims))
        for name, size in dims.items():
            header += _name_bytes(name) + struct.pack(">i", 0 if name == rec_dim else size)
    else:
        header += struct.pack(">ii", 0, 0)
    if attrs:
        header += struct.pack(">ii", NC_ATTRIBUTE, len(attrs))
        for name, value in attrs.items():
            header += _attr_bytes(name, value)
    else:
        header += struct.pack(">ii", 0, 0)

    # (name, vdims, nc_type, vsize, big-endian bytes, is_record)
    var_meta = []
    for name, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        t = _nc_type_for(arr)
        be = arr.astype(arr.dtype.newbyteorder(">"))
        is_rec = rec_dim is not None and len(vdims) > 0 and vdims[0] == rec_dim
        if is_rec:
            per_rec = int(np.prod(be.shape[1:], dtype=int)) * be.dtype.itemsize
            # spec: header vsize is ALWAYS rounded up to 4; only the actual
            # storage skips inter-record padding for a lone record var
            vsize = per_rec + _pad4(per_rec)
        else:
            vsize = be.nbytes + _pad4(be.nbytes)
        var_meta.append((name, vdims, t, vsize, be, is_rec))

    if var_meta:
        body = bytearray()
        body += struct.pack(">ii", NC_VARIABLE, len(var_meta))
        # first pass with placeholder begins to learn the header length
        fixed = bytearray()
        for name, vdims, t, vsize, _, _ in var_meta:
            fixed += _name_bytes(name)
            fixed += struct.pack(">i", len(vdims))
            for d in vdims:
                fixed += struct.pack(">i", dim_ids[d])
            fixed += struct.pack(">ii", 0, 0)  # no var attrs
            fixed += struct.pack(">iii", t, vsize, 0)  # begin placeholder
        header_len = len(header) + len(body) + len(fixed)
        begin = header_len
        # fixed vars first (spec: non-record data precedes the record section)
        begins: dict[str, int] = {}
        for name, vdims, t, vsize, _, is_rec in var_meta:
            if not is_rec:
                begins[name] = begin
                begin += vsize
        # record vars: begin = offset of the var's chunk in the FIRST slab
        for name, vdims, t, vsize, _, is_rec in var_meta:
            if is_rec:
                begins[name] = begin
                begin += vsize
        for name, vdims, t, vsize, _, _ in var_meta:
            body += _name_bytes(name)
            body += struct.pack(">i", len(vdims))
            for d in vdims:
                body += struct.pack(">i", dim_ids[d])
            body += struct.pack(">ii", 0, 0)
            body += struct.pack(">iii", t, vsize, begins[name])
        header += body
    else:
        header += struct.pack(">ii", 0, 0)

    with open(path, "wb") as fh:
        fh.write(header)
        for _, _, _, vsize, be, is_rec in var_meta:
            if not is_rec:
                data = be.tobytes()
                fh.write(data + b"\x00" * (vsize - len(data)))
        rec_vars = [(vsize, be) for _, _, _, vsize, be, is_rec in var_meta if is_rec]
        for r in range(numrecs):
            for vsize, be in rec_vars:
                # slice (not index): be[r] on a 1-D var is a numpy SCALAR,
                # which silently converts to native byte order
                chunk = be[r : r + 1].tobytes()
                pad_to = vsize if len(rec_vars) > 1 else len(chunk)
                fh.write(chunk + b"\x00" * (pad_to - len(chunk)))


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
    writer, INCLUDING record (unlimited-dimension) variables — the shape
    real appended ad2cp mission files have. Returns
    ``(dims, variables, attrs)`` where ``variables`` maps name -> ndarray
    (native byte order); the record dim reports the actual record count."""
    with open(path, "rb") as fh:
        buf = fh.read()
    c = _Cursor(buf)
    magic = c.take(4)
    if magic[:3] != b"CDF" or magic[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF3 file (magic {magic!r})")
    offset64 = magic[3] == 2
    numrecs = struct.unpack(">I", c.take(4))[0]  # 0xFFFFFFFF = STREAMING

    tag, n = c.i4(), c.i4()
    dims: dict[str, int] = {}
    dim_sizes: list[int] = []
    rec_dim_id = -1
    if tag == NC_DIMENSION:
        for i in range(n):
            name = c.name()
            size = c.i4()
            if size == 0:  # the record (unlimited) dimension
                rec_dim_id = i
            dims[name] = size
            dim_sizes.append(size)
    attrs: dict = {}
    tag, n = c.i4(), c.i4()
    if tag == NC_ATTRIBUTE:
        for _ in range(n):
            name = c.name()
            attrs[name] = c.attr_value()

    # first pass over the var list: metadata only (record decoding needs
    # recsize = Σ record-var vsizes, known only after the full list)
    var_list = []
    tag, n = c.i4(), c.i4()
    if tag == NC_VARIABLE:
        for _ in range(n):
            name = c.name()
            ndims = c.i4()
            dim_ids = [c.i4() for _ in range(ndims)]
            vtag, vn = c.i4(), c.i4()
            if vtag == NC_ATTRIBUTE:
                for _ in range(vn):
                    c.name()
                    c.attr_value()
            t = c.i4()
            vsize = c.i4()
            begin = struct.unpack(">q", c.take(8))[0] if offset64 else c.i4()
            is_rec = bool(dim_ids) and dim_ids[0] == rec_dim_id
            var_list.append((name, dim_ids, t, vsize, begin, is_rec))

    rec_vars = [v for v in var_list if v[5]]
    recsize = sum(v[3] for v in rec_vars)
    if len(rec_vars) == 1:
        # lone record var: stored UNPADDED (spec special case), while the
        # header vsize is always 4-padded — stride/recsize must use the
        # true per-record byte count or narrow types miscount records
        _, dim_ids1, t1, _, _, _ = rec_vars[0]
        rest1 = tuple(dim_sizes[i] for i in dim_ids1[1:])
        recsize = int(np.prod(rest1, dtype=int)) * _SIZE_OF_TYPE[t1] if rest1 else _SIZE_OF_TYPE[t1]
    if numrecs == 0xFFFFFFFF:  # STREAMING: derive the count from file size
        if rec_vars and recsize:
            first_begin = min(v[4] for v in rec_vars)
            numrecs = (len(buf) - first_begin) // recsize
        else:
            numrecs = 0

    variables: dict[str, np.ndarray] = {}
    for name, dim_ids, t, vsize, begin, is_rec in var_list:
        dt = _DTYPE_OF_TYPE[t]
        if is_rec:
            rest = tuple(dim_sizes[i] for i in dim_ids[1:])
            per_rec = int(np.prod(rest, dtype=int)) if rest else 1
            # record r of a var lives at begin + r·recsize (interleaved
            # slabs); a lone record var is stored contiguously (no pad)
            stride = recsize if len(rec_vars) > 1 else per_rec * _SIZE_OF_TYPE[t]
            if numrecs == 0:  # declared record dim, nothing appended yet
                variables[name] = np.empty((0, *rest), dtype=dt.newbyteorder("="))
                continue
            # strided view over the record slabs — no per-record python
            # loop, O(1) construction + one astype copy
            arr = np.ndarray(
                shape=(numrecs, per_rec),
                dtype=dt,
                buffer=buf,
                offset=begin,
                strides=(stride, dt.itemsize),
            ).reshape((numrecs, *rest))
        else:
            shape = tuple(dim_sizes[i] for i in dim_ids)
            count = int(np.prod(shape)) if shape else 1
            raw = buf[begin : begin + count * _SIZE_OF_TYPE[t]]
            arr = np.frombuffer(raw, dtype=dt).reshape(shape)
        variables[name] = arr.astype(arr.dtype.newbyteorder("="))
    if rec_dim_id >= 0:
        rec_name = list(dims)[rec_dim_id]
        dims[rec_name] = int(numrecs)
    return dims, variables, attrs
