"""Procedural anthropomorphic chest phantom in Hounsfield units.

Stand-in for a real chest CT acquisition in environments without access to
clinical data (the reference benchmarks on resampled organ CT volumes it
does not redistribute; its raw pipeline is data_generator/
synthetic_dataset/process_raw_data.py). The phantom reproduces the tissue
classes and spatial statistics that drive CT reconstruction difficulty:

  - body: soft-tissue superellipsoid (~40 HU) with band-limited texture
  - lungs: two air-density lobes (~-820 HU) with a random bronchovascular
    tree (branching filaments up to soft-tissue density)
  - airways: trachea splitting into main bronchi (-1000 HU)
  - skeleton: vertebral column with periodic vertebrae + spinal canal,
    ~10 rib pairs (slanted cortical-bone arcs), sternum
  - mediastinum: heart (~35 HU) and descending aorta (~45 HU)

Emitted as int16 HU on a non-cubic grid, i.e. exactly what a scanner
export looks like to process_raw_data.py (HU clip -> [0,1] -> 256^3 cube).
The final ~0.7-voxel PSF blur models the detector/recon band limit of real
CT (see RESULTS.md "Caveat on phantom choice").
"""

import argparse
import os
import os.path as osp

import numpy as np
from scipy.ndimage import gaussian_filter


def _mark_polyline(mask, pts, value=1.0):
    """Accumulate unit marks along straight segments between consecutive
    points (index space)."""
    nx, ny, nz = mask.shape
    for a, b in zip(pts[:-1], pts[1:]):
        n = int(np.linalg.norm(b - a) * 2) + 2
        ts = np.linspace(0.0, 1.0, n)[:, None]
        q = np.round(a[None, :] * (1 - ts) + b[None, :] * ts).astype(int)
        ok = ((q >= 0) & (q < [nx, ny, nz])).all(1)
        q = q[ok]
        mask[q[:, 0], q[:, 1], q[:, 2]] = value


def _vessel_tree(mask, root, direction, length, radius_marks, rng, depth=0):
    """Random branching filament tree: marks centerlines; thickness comes
    from a later blur whose sigma sets the mean vessel caliber."""
    if depth > 4 or length < 6:
        return
    end = root + direction * length
    _mark_polyline(mask, np.stack([root, end]), radius_marks)
    for _ in range(2):
        d = direction + rng.normal(0, 0.45, 3)
        d /= np.linalg.norm(d) + 1e-9
        _vessel_tree(mask, end, d, length * rng.uniform(0.55, 0.8),
                     radius_marks * 0.8, rng, depth + 1)


def chest_phantom(shape=(320, 320, 280), seed=0):
    nx, ny, nz = shape
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(
        np.linspace(-1, 1, nx), np.linspace(-1, 1, ny),
        np.linspace(-1, 1, nz), indexing="ij",
    )
    hu = np.full(shape, -1000.0, np.float32)  # air

    # body: soft-tissue superellipsoid, slightly tapered toward the neck
    taper = 1.0 - 0.12 * (z + 1) / 2
    body = (np.abs(x / (0.86 * taper)) ** 2.5
            + np.abs(y / (0.66 * taper)) ** 2.5) <= 1.0
    tex = gaussian_filter(rng.normal(0, 1, shape), 3.0).astype(np.float32)
    tex *= 30.0 / (np.abs(tex).max() + 1e-9)
    hu[body] = 40.0 + tex[body]

    # subcutaneous fat rim (between 88% and 100% of the body radius)
    r_body = (np.abs(x / (0.86 * taper)) ** 2.5
              + np.abs(y / (0.66 * taper)) ** 2.5)
    fat = body & (r_body > 0.72)
    hu[fat] = -90.0 + 0.3 * tex[fat]

    # lungs
    lung_val = -820.0
    for sx in (-1, 1):
        lung = ((x - sx * 0.38) ** 2 / 0.30 ** 2
                + (y + 0.02) ** 2 / 0.42 ** 2
                + (z - 0.05) ** 2 / 0.75 ** 2) <= 1.0
        hu[lung & body] = lung_val + 2.0 * tex[lung & body]

    # bronchovascular trees (marks blurred into ~1.5-voxel-caliber vessels)
    vessels = np.zeros(shape, np.float32)
    for sx in (-1, 1):
        hilum = np.array([(sx * 0.22 + 1) / 2 * nx, 0.5 * ny, 0.52 * nz])
        for _ in range(7):
            d = rng.normal(0, 1, 3)
            d[0] += sx * 1.2
            d /= np.linalg.norm(d)
            _vessel_tree(vessels, hilum, d, 0.16 * nx, 1.0, rng)
    vessels = gaussian_filter(vessels, 1.2)
    vessels *= 860.0 / (vessels.max() + 1e-9)  # up to ~+40 HU inside lung
    in_lung = hu < -500
    hu[in_lung] = np.minimum(hu[in_lung] + vessels[in_lung], 45.0)

    # trachea + main bronchi (carve air)
    air = np.zeros(shape, np.float32)
    top = np.array([0.5 * nx, 0.38 * ny, 0.97 * nz])
    carina = np.array([0.5 * nx, 0.40 * ny, 0.62 * nz])
    _mark_polyline(air, np.stack([top, carina]))
    for sx in (-1, 1):
        b_end = np.array([(sx * 0.25 + 1) / 2 * nx, 0.42 * ny, 0.45 * nz])
        _mark_polyline(air, np.stack([carina, b_end]))
    air = gaussian_filter(air, 2.8)
    hu[air > 0.12 * air.max()] = -1000.0

    # heart (left-of-center ellipsoid) + descending aorta
    heart = ((x + 0.10) ** 2 / 0.24 ** 2 + (y - 0.12) ** 2 / 0.22 ** 2
             + (z + 0.25) ** 2 / 0.34 ** 2) <= 1.0
    hu[heart] = 35.0 + 0.3 * tex[heart]
    aorta = (x ** 2 + (y - 0.30) ** 2) <= 0.045 ** 2
    hu[aorta & body & (z < 0.75)] = 45.0

    # vertebral column: cancellous cylinder, periodic denser vertebrae,
    # spinal canal
    spine_r2 = x ** 2 + (y - 0.46) ** 2
    spine = spine_r2 <= 0.105 ** 2
    vert = (np.sin(z * np.pi * 9.0) > -0.35)  # bodies with disc gaps
    hu[spine & vert] = 420.0 + 40.0 * tex[spine & vert] / 30.0
    hu[spine & ~vert] = 110.0  # intervertebral discs
    canal = spine_r2 <= 0.035 ** 2
    hu[canal] = 30.0

    # ribs: slanted cortical arcs hugging the body wall
    ribs = np.zeros(shape, np.float32)
    for k in range(9):
        z0 = 0.12 + 0.085 * k
        for sx in (-1, 1):
            th = np.linspace(0.15 * np.pi, 0.85 * np.pi, 40)
            rx = 0.74 * np.sin(th) * sx
            ry = 0.56 * -np.cos(th) + 0.02
            rz = z0 * 2 - 1 + 0.10 * (th - th[0]) / np.pi  # slope downward
            pts = np.stack([(rx + 1) / 2 * nx, (ry + 1) / 2 * ny,
                            (rz + 1) / 2 * nz], axis=1)
            _mark_polyline(ribs, pts)
    # sternum
    _mark_polyline(ribs, np.stack([
        np.array([0.5 * nx, 0.12 * ny, 0.30 * nz]),
        np.array([0.5 * nx, 0.10 * ny, 0.72 * nz]),
    ]))
    ribs = gaussian_filter(ribs, 1.6)
    rib_mask = ribs > 0.10 * ribs.max()
    hu[rib_mask & body] = 700.0

    # detector/recon band limit (real CT volumes are not ideal step edges)
    hu = gaussian_filter(hu, 0.7)
    return np.clip(hu, -1000.0, 2000.0).astype(np.int16)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", type=str, required=True, help=".raw (int16 HU)")
    p.add_argument("--shape", type=int, nargs=3, default=[320, 320, 280])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    vol = chest_phantom(tuple(args.shape), args.seed)
    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    vol.tofile(args.output)
    print(f"Wrote {args.output} shape={vol.shape} dtype=int16 "
          f"HU range [{vol.min()}, {vol.max()}]")


if __name__ == "__main__":
    main()
