"""Raw medical volume preprocessing (reference
data_generator/synthetic_dataset/process_raw_data.py equivalent):
dcm/raw/nii/npy stacks -> HU clip [-1000, 2000] -> normalize [0,1] ->
resample to a cubic grid (default 256^3).

Heavy-format readers (DICOM, NIfTI) are gated on optional dependencies;
.npy and .raw always work.
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_volume(path, raw_shape=None, raw_dtype="int16"):
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".raw"):
        assert raw_shape is not None, "--raw_shape required for .raw input"
        vol = np.fromfile(path, dtype=np.dtype(raw_dtype))
        return vol.reshape(raw_shape).astype(np.float32)
    if path.endswith((".nii", ".nii.gz")):
        try:
            import SimpleITK as sitk
        except ImportError as e:
            raise RuntimeError("SimpleITK needed for NIfTI input") from e
        return sitk.GetArrayFromImage(sitk.ReadImage(path)).transpose(2, 1, 0).astype(
            np.float32
        )
    if osp.isdir(path):  # DICOM series
        try:
            import SimpleITK as sitk
        except ImportError as e:
            raise RuntimeError("SimpleITK needed for DICOM input") from e
        reader = sitk.ImageSeriesReader()
        reader.SetFileNames(reader.GetGDCMSeriesFileNames(path))
        return sitk.GetArrayFromImage(reader.Execute()).transpose(2, 1, 0).astype(
            np.float32
        )
    raise ValueError(f"unsupported input {path}")


def resample_to_cube(vol, n: int):
    """Trilinear resample to [n,n,n] (centered, preserving aspect by
    padding the short axes with the minimum value)."""
    from scipy.ndimage import zoom  # scipy ships with the environment

    side = max(vol.shape)
    pad = [(int((side - s) // 2), int(side - s - (side - s) // 2)) for s in vol.shape]
    vol = np.pad(vol, pad, constant_values=float(vol.min()))
    factors = [n / s for s in vol.shape]
    return zoom(vol, factors, order=1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--hu_min", type=float, default=-1000.0)
    parser.add_argument("--hu_max", type=float, default=2000.0)
    parser.add_argument("--raw_shape", type=int, nargs=3, default=None)
    parser.add_argument("--raw_dtype", type=str, default="int16")
    args = parser.parse_args()

    vol = load_volume(args.input, args.raw_shape, args.raw_dtype)
    vol = np.clip(vol, args.hu_min, args.hu_max)
    vol = (vol - args.hu_min) / (args.hu_max - args.hu_min)
    vol = resample_to_cube(vol, args.size).astype(np.float32)
    np.save(args.output, np.clip(vol, 0.0, 1.0))
    print(f"Wrote {args.output} {vol.shape}")


if __name__ == "__main__":
    main()
