"""Minimal NIfTI-1 writer (no external deps).

The reference exports the reconstructed volume as .nii.gz via SimpleITK for
inspection in 3D Slicer (reference test.py:140-148). SimpleITK is a heavy
optional dependency; the NIfTI-1 format itself is a 352-byte header plus raw
little-endian voxel data, so we write it directly (gzipped when the filename
ends in .gz).

Layout convention: we store the volume as F-ordered (x fastest), i.e.
dim = (nx, ny, nz), matching what SimpleITK produces from the reference's
`vol.transpose(2, 1, 0)` C-array.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

_DT_FLOAT32 = 16
_DT_FLOAT64 = 64
_DT_INT16 = 4
_DT_UINT8 = 2

_DTYPES = {
    np.dtype(np.float32): (_DT_FLOAT32, 32),
    np.dtype(np.float64): (_DT_FLOAT64, 64),
    np.dtype(np.int16): (_DT_INT16, 16),
    np.dtype(np.uint8): (_DT_UINT8, 8),
}


def _build_header(shape, dtype, spacing) -> bytes:
    datatype, bitpix = _DTYPES[np.dtype(dtype)]
    dim = [3, shape[0], shape[1], shape[2], 1, 1, 1, 1]
    pixdim = [1.0, float(spacing[0]), float(spacing[1]), float(spacing[2]),
              0.0, 0.0, 0.0, 0.0]
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)  # sizeof_hdr
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, datatype)
    struct.pack_into("<h", hdr, 72, bitpix)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    # sform: identity scaled by spacing (RAS), sform_code = 1
    struct.pack_into("<h", hdr, 252, 0)  # qform_code
    struct.pack_into("<h", hdr, 254, 1)  # sform_code
    struct.pack_into("<4f", hdr, 280, spacing[0], 0, 0, 0)  # srow_x
    struct.pack_into("<4f", hdr, 296, 0, spacing[1], 0, 0)  # srow_y
    struct.pack_into("<4f", hdr, 312, 0, 0, spacing[2], 0)  # srow_z
    hdr[344:348] = b"n+1\x00"
    return bytes(hdr) + b"\x00\x00\x00\x00"  # 4-byte extension pad -> 352


def write_nifti(path: str, vol: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> None:
    """Write an [nx, ny, nz] volume to .nii / .nii.gz.

    `spacing` is the physical voxel size along (x, y, z).
    """
    vol = np.asarray(vol)
    if vol.ndim != 3:
        raise ValueError(f"expected a 3D volume, got shape {vol.shape}")
    if np.dtype(vol.dtype) not in _DTYPES:
        vol = vol.astype(np.float32)
    if vol.dtype.byteorder == ">":
        vol = vol.astype(vol.dtype.newbyteorder("<"))
    payload = _build_header(vol.shape, vol.dtype, spacing) + np.asfortranarray(
        vol
    ).tobytes(order="F")
    if str(path).endswith(".gz"):
        with gzip.open(path, "wb", compresslevel=4) as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
