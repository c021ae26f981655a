"""Esri ASCII grid (.asc) — the public plain-text raster interchange.

Header: six "name value" lines (ncols, nrows, xllcorner, yllcorner,
cellsize, NODATA_value — the first two mandatory, the rest with
standard defaults), then nrows lines of whitespace-separated samples,
north row first. Everything integer here stays integer: values parse
through int() when they have no fractional part, so checksums are
exact. The GIS sibling of the .hgt reader (kernels/hgt.py) for the
DEM-catalog story.
"""

from __future__ import annotations

import numpy as np

NODATA_DEFAULT = -9999


def encode_asc(grid: np.ndarray, xll: int = 0, yll: int = 0,
               cellsize: int = 1, nodata: int = NODATA_DEFAULT) -> bytes:
    a = np.asarray(grid)
    assert a.ndim == 2
    lines = [f"ncols {a.shape[1]}", f"nrows {a.shape[0]}",
             f"xllcorner {xll}", f"yllcorner {yll}",
             f"cellsize {cellsize}", f"NODATA_value {nodata}"]
    body = "\n".join(" ".join(str(int(v)) for v in row) for row in a)
    return ("\n".join(lines) + "\n" + body + "\n").encode("ascii")


def decode_asc(buf: bytes) -> "tuple[np.ndarray, dict]":
    """Returns (int64 grid, header dict with int values)."""
    text = buf.decode("ascii")
    toks = text.split()
    hdr: dict = {}
    pos = 0
    # header entries are name/value pairs; data starts at the first
    # token that is not a known header name
    names = {"ncols", "nrows", "xllcorner", "yllcorner", "cellsize",
             "nodata_value"}
    while pos + 1 < len(toks) and toks[pos].lower() in names:
        hdr[toks[pos].lower()] = int(float(toks[pos + 1]))
        pos += 2
    w, h = hdr["ncols"], hdr["nrows"]
    hdr.setdefault("nodata_value", NODATA_DEFAULT)
    vals = np.array([int(float(t)) for t in toks[pos:pos + w * h]],
                    dtype=np.int64)
    if len(vals) != w * h:
        raise ValueError("short grid body")
    return vals.reshape(h, w), hdr
