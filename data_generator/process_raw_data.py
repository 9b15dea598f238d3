"""Raw medical volume preprocessing (reference
data_generator/synthetic_dataset/process_raw_data.py equivalent):
dcm/raw/nii/npy stacks -> HU clip [-1000, 2000] -> normalize [0,1] ->
resample to a cubic grid (default 256^3).

Heavy-format readers (DICOM, NIfTI) are gated on optional dependencies;
.npy and .raw always work.
"""

import argparse
import os
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


def _resample_iso(vol, spacing):
    """Resample to 1 mm isotropic spacing (physical scale preserved)."""
    from scipy.ndimage import zoom

    spacing = np.asarray(spacing, np.float64)
    if np.allclose(spacing, 1.0):
        return vol
    return zoom(vol, spacing, order=1)


def _crop_to_cube(vol):
    side = min(vol.shape)
    s = [(d - side) // 2 for d in vol.shape]
    return vol[s[0]:s[0] + side, s[1]:s[1] + side, s[2]:s[2] + side]


def _expand_to_cube(vol):
    side = max(vol.shape)
    pad = [((side - d) // 2, side - d - (side - d) // 2) for d in vol.shape]
    return np.pad(vol, pad, constant_values=0.0)


def _resize(vol, n):
    from scipy.ndimage import zoom

    return zoom(vol, [n / s for s in vol.shape], order=1)


def _minmax(vol):
    lo, hi = float(vol.min()), float(vol.max())
    return (vol - lo) / max(hi - lo, 1e-12)


def process_case(name, raw_root, target_size=256):
    """Decode + orient one case of the reference's 15-case synthetic
    protocol (see raw_metadata.py; reference
    data_generator/synthetic_dataset/process_raw_data.py:52-117 semantics:
    minmax to [0,1] (dcm: HU clip [-1000, 2000] first), resample to
    isotropic spacing, crop/expand to a cube, resize to target_size,
    transpose + z flip per the case table)."""
    from raw_metadata import RAW_CASES

    info = RAW_CASES[name]
    path = osp.join(raw_root, info["path"])
    kind = info["kind"]
    if kind == "dcm":
        try:
            import pydicom
        except ImportError as e:
            raise RuntimeError("pydicom needed for DICOM cases") from e
        import glob

        slices, spacing_z, pixel_spacing = [], None, None
        for p in sorted(glob.glob(osp.join(path, "*.dcm"))):
            ds = pydicom.dcmread(p)
            slices.append(np.asarray(ds.pixel_array, np.float64)
                          * float(ds.RescaleSlope) + float(ds.RescaleIntercept))
            spacing_z = info["thickness"] or float(ds.SliceThickness)
            pixel_spacing = [float(v) for v in ds.PixelSpacing]
        vol = np.stack(slices, axis=-1)[:, :, ::-1]
        vol = _minmax(vol.clip(-1000, 2000))
        vol = _resample_iso(vol, pixel_spacing + [spacing_z])
        vol = np.clip(_resize(vol, target_size), 0.0, 1.0)
        if info["xy_invert"]:
            vol = vol[::-1, ::-1, :]
        return vol.astype(np.float32)

    if kind == "raw":
        vol = (np.fromfile(path, dtype=np.dtype(info["dtype"]))
               .reshape(info["shape"][::-1]).astype(np.float64)
               .transpose(2, 1, 0))
    elif kind == "tif":
        try:
            import tifffile

            vol = tifffile.imread(path).astype(np.float64)
        except ImportError:
            from PIL import Image, ImageSequence

            im = Image.open(path)
            vol = np.stack([np.asarray(f, np.float64)
                            for f in ImageSequence.Iterator(im)])
    else:
        raise ValueError(f"unsupported kind {kind}")
    vol = _minmax(vol).clip(0.0, 1.0)
    aspect = info.get("aspect")
    if aspect is not None:
        vol = _resample_iso(vol, info["spacing"])
        vol = _crop_to_cube(vol) if aspect == "crop" else _expand_to_cube(vol)
    vol = np.clip(_resize(vol, target_size), 0.0, 1.0)
    vol = vol.transpose(info["transpose"])
    if info["z_invert"]:
        vol = vol[:, :, ::-1]
    return vol.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, default=None,
                        help="single volume (npy/raw/nii/dcm dir)")
    parser.add_argument("--case", type=str, nargs="+", default=None,
                        help="named case(s) from raw_metadata.py (or 'all')")
    parser.add_argument("--raw_root", type=str, default=None,
                        help="root dir holding the raw downloads (--case)")
    parser.add_argument("--output", type=str, required=True,
                        help="output .npy (--input) or output dir (--case)")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--hu_min", type=float, default=-1000.0)
    parser.add_argument("--hu_max", type=float, default=2000.0)
    parser.add_argument("--raw_shape", type=int, nargs=3, default=None)
    parser.add_argument("--raw_dtype", type=str, default="int16")
    args = parser.parse_args()

    if args.case:
        from raw_metadata import RAW_CASES

        assert args.raw_root, "--raw_root required with --case"
        names = (sorted(RAW_CASES) if args.case == ["all"] else args.case)
        os.makedirs(args.output, exist_ok=True)
        for name in names:
            out = osp.join(args.output, f"{name}.npy")
            if osp.exists(out):
                print(f"skip {name} (exists)")
                continue
            vol = process_case(name, args.raw_root, args.size)
            np.save(out, vol)
            print(f"Wrote {out} {vol.shape}")
        return

    assert args.input, "--input or --case required"
    vol = load_volume(args.input, args.raw_shape, args.raw_dtype)
    vol = np.clip(vol, args.hu_min, args.hu_max)
    vol = (vol - args.hu_min) / (args.hu_max - args.hu_min)
    vol = resample_to_cube(vol, args.size).astype(np.float32)
    np.save(args.output, np.clip(vol, 0.0, 1.0))
    print(f"Wrote {args.output} {vol.shape}")


if __name__ == "__main__":
    main()
