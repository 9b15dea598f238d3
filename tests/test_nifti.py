"""Round-trip test for the built-in NIfTI-1 writer."""

import gzip
import struct

import numpy as np

from r2_gaussian_tpu.utils.nifti import write_nifti


def _read_nifti(path):
    with gzip.open(path, "rb") as f:
        raw = f.read()
    assert struct.unpack_from("<i", raw, 0)[0] == 348
    dim = struct.unpack_from("<8h", raw, 40)
    datatype = struct.unpack_from("<h", raw, 70)[0]
    pixdim = struct.unpack_from("<8f", raw, 76)
    vox_offset = int(struct.unpack_from("<f", raw, 108)[0])
    assert raw[344:348] == b"n+1\x00"
    assert datatype == 16  # float32
    shape = dim[1 : 1 + dim[0]]
    n = int(np.prod(shape))
    vol = np.frombuffer(raw[vox_offset : vox_offset + 4 * n], "<f4")
    return vol.reshape(shape, order="F"), pixdim[1:4]


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol, spacing=(0.5, 1.0, 2.0))
    back, spacing = _read_nifti(path)
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(spacing, (0.5, 1.0, 2.0))
