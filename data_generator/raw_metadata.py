"""Per-case loader metadata for the reference's 15-case synthetic protocol
(reference data_generator/synthetic_dataset/raw_metadata.py:1-155).

The raw volumes themselves (LIDC-IDRI / Pancreas-CT DICOM series, open
scivis .raw dumps, FIPS .tif stacks) are external downloads the reference
documents in its README; this table records how each one is decoded and
oriented so `process_raw_data.py --case <name>` reproduces the reference's
volume_gt layout bit-for-bit in conventions (axis order, z flip, aspect
handling) once the raw files are placed under --raw_root.

Fields:
  path        relative location under --raw_root
  kind        "dcm" (DICOM series dir) | "raw" (headerless dump) | "tif"
  dtype/shape raw-dump decode parameters (kind == "raw" only)
  spacing     voxel spacing in mm, [sx, sy, sz]; anisotropic spacing is
              resolved by resample_to_cube (aspect-preserving)
  aspect      "expand" -> pad short axes to a cube before resampling;
              "crop"  -> center-crop long axes; None -> direct resample
  transpose   axis permutation applied after decode
  z_invert    flip the z axis after transpose
  xy_invert   (dcm) flip x and y (patient orientation differs per series)
  thickness   (dcm) override slice thickness when the series metadata lies
"""

RAW_CASES = {
    "0_chest": {
        "path": "LIDC-IDRI-0001/01-01-2000-NA-NA-30178/3000566.000000-NA-03192",
        "kind": "dcm", "thickness": None, "xy_invert": False,
    },
    "0_foot": {
        "path": "foot_256x256x256_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [256, 256, 256],
        "spacing": [1.0, 1.0, 1.0], "aspect": "expand",
        "transpose": [0, 2, 1], "z_invert": False,
    },
    "0_head": {
        "path": "vis_male_128x256x256_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [128, 256, 256],
        "spacing": [1.57774, 0.995861, 1.00797], "aspect": "expand",
        "transpose": [1, 0, 2], "z_invert": True,
    },
    "0_jaw": {
        "path": "skull_256x256x256_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [256, 256, 256],
        "spacing": [1.0, 1.0, 1.0], "aspect": "expand",
        "transpose": [0, 1, 2], "z_invert": False,
    },
    "0_pancreas": {
        "path": "PANCREAS_0001/11-24-2015-PANCREAS0001-Pancreas-18957/Pancreas-99667",
        "kind": "dcm", "thickness": 2.0, "xy_invert": True,
    },
    "1_beetle": {
        "path": "stag_beetle_832x832x494_uint16.raw", "kind": "raw",
        "dtype": "uint16", "shape": [832, 832, 494],
        "spacing": [1.0, 1.0, 1.0], "aspect": None,
        "transpose": [0, 1, 2], "z_invert": True,
    },
    "1_bonsai": {
        "path": "bonsai_256x256x256_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [256, 256, 256],
        "spacing": [1.0, 1.0, 1.0], "aspect": None,
        "transpose": [0, 2, 1], "z_invert": False,
    },
    "1_broccoli": {
        "path": "brocoli-3d-1050um.tif", "kind": "tif",
        "spacing": [1.0, 1.0, 1.0], "aspect": "crop",
        "transpose": [1, 2, 0], "z_invert": True,
    },
    "1_kingsnake": {
        "path": "kingsnake_1024x1024x795_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [1024, 1024, 795],
        "spacing": [0.6348, 0.6348, 1.376], "aspect": "expand",
        "transpose": [0, 1, 2], "z_invert": False,
    },
    "1_pepper": {
        "path": "bell-pepper-3d-500um.tif", "kind": "tif",
        "spacing": [1.0, 1.0, 1.0], "aspect": None,
        "transpose": [1, 2, 0], "z_invert": True,
    },
    "2_backpack": {
        "path": "backpack_512x512x373_uint16.raw", "kind": "raw",
        "dtype": "uint16", "shape": [512, 512, 373],
        "spacing": [0.9766, 0.9766, 1.25], "aspect": "expand",
        "transpose": [1, 0, 2], "z_invert": False,
    },
    "2_engine": {
        "path": "engine_256x256x128_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [256, 256, 128],
        "spacing": [1.0, 1.0, 2.0], "aspect": "expand",
        "transpose": [0, 1, 2], "z_invert": False,
    },
    "2_mount": {
        "path": "zeiss_680x680x680_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [680, 680, 680],
        "spacing": [1.0, 1.0, 1.0], "aspect": "expand",
        "transpose": [2, 0, 1], "z_invert": False,
    },
    "2_present": {
        "path": "present_492x492x442_uint16.raw", "kind": "raw",
        "dtype": "uint16", "shape": [492, 492, 442],
        "spacing": [1.0, 1.0, 1.0], "aspect": "crop",
        "transpose": [0, 1, 2], "z_invert": True,
    },
    "2_teapot": {
        "path": "boston_teapot_256x256x178_uint8.raw", "kind": "raw",
        "dtype": "uint8", "shape": [256, 256, 178],
        "spacing": [1.0, 1.0, 1.0], "aspect": "expand",
        "transpose": [0, 2, 1], "z_invert": True,
    },
}
