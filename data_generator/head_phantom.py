"""Procedural anthropomorphic head phantom in Hounsfield units.

Stand-in for the reference's `0_head` case (vis_male raw volume, see
data_generator/raw_metadata.py) in environments without access to the raw
download. Like chest_phantom.py it reproduces the tissue classes and
contrast structure that drive CT reconstruction difficulty for a head:

  - skull: high-density cortical shell (~1400 HU) with a lower-density
    diploic layer between the tables, plus skull-base thickening
  - brain: gray/white matter at low mutual contrast (~38/28 HU) with
    band-limited texture, falx and a cortical-fold modulation
  - ventricles: CSF-density (~8 HU) paired lateral ventricles + third
    ventricle
  - sinuses/airways: frontal + maxillary sinuses and nasal cavity at air
    density inside facial bone
  - orbits: globes (vitreous ~5 HU) with a thin scleral shell, lenses
  - mandible + dental arch: cortical bone with very dense enamel marks
  - soft tissue scalp/face with a subcutaneous fat layer

Emitted as int16 HU on a non-cubic grid like a scanner export, consumed by
process_raw_data.py (HU clip -> [0,1] -> 256^3 cube). The final PSF blur
models the detector/recon band limit (see RESULTS.md "Caveat on phantom
choice").
"""

import argparse
import os
import os.path as osp

import numpy as np
from scipy.ndimage import gaussian_filter


def head_phantom(shape=(288, 288, 320), seed=0):
    nx, ny, nz = shape
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(
        np.linspace(-1, 1, nx), np.linspace(-1, 1, ny),
        np.linspace(-1, 1, nz), indexing="ij",
    )
    hu = np.full(shape, -1000.0, np.float32)  # air
    tex = gaussian_filter(rng.normal(0, 1, shape), 2.5).astype(np.float32)
    tex *= 1.0 / (np.abs(tex).max() + 1e-9)

    # head outline: cranial ovoid blended into a tapering face/neck column.
    # y is anterior(-)/posterior(+), z is inferior(-)/superior(+).
    cran = ((x / 0.62) ** 2 + ((y - 0.04) / 0.74) ** 2
            + ((z - 0.22) / 0.68) ** 2)
    face = (np.abs(x / 0.42) ** 2.2 + np.abs((y + 0.18) / 0.52) ** 2.2
            + np.maximum(-(z + 0.05), 0.0) * 0.0)
    face_col = (face <= 1.0) & (z < 0.15) & (z > -0.95)
    head = (cran <= 1.0) | face_col
    hu[head] = 45.0 + 25.0 * tex[head]  # scalp/facial soft tissue

    # subcutaneous fat layer just under the skin of the cranial ovoid
    fat = (cran <= 1.0) & (cran > 0.86)
    hu[fat] = -70.0 + 10.0 * tex[fat]

    # cranial vault: cortical shell with diploic (spongy) middle table
    outer = cran <= 0.82
    inner = ((x / 0.53) ** 2 + ((y - 0.04) / 0.65) ** 2
             + ((z - 0.22) / 0.59) ** 2) <= 1.0
    shell = outer & ~inner & (z > -0.32)
    mid = ((x / 0.575) ** 2 + ((y - 0.04) / 0.695) ** 2
           + ((z - 0.22) / 0.635) ** 2)
    diploe = shell & (mid > 0.90) & (mid < 1.10)
    hu[shell] = 1400.0 + 120.0 * tex[shell]
    hu[diploe] = 550.0 + 80.0 * tex[diploe]
    # skull base: thick irregular bone closing the vault inferiorly
    base = inner & (z < -0.18) & (z > -0.34)
    hu[base] = 1100.0 + 300.0 * tex[base]

    # brain: white matter fill, gray-matter cortical band (low contrast),
    # falx cerebri as a thin dense midline sheet
    brain = inner & (z > -0.18)
    hu[brain] = 28.0 + 4.0 * tex[brain]  # white matter
    rim = ((x / 0.53) ** 2 + ((y - 0.04) / 0.65) ** 2
           + ((z - 0.22) / 0.59) ** 2)
    folds = np.sin(np.arctan2(y - 0.04, x) * 14.0) * np.sin(z * 11.0)
    gray = brain & (rim > 0.62 - 0.05 * folds)
    hu[gray] = 38.0 + 3.0 * tex[gray]
    falx = brain & (np.abs(x) < 0.012) & (rim > 0.25) & (z > 0.05)
    hu[falx] = 60.0

    # ventricles: paired C-shaped lateral ventricles + midline third
    for sx in (-1, 1):
        lat = (((x - sx * 0.16) / 0.07) ** 2
               + ((y - 0.10 - 0.25 * (z - 0.25) ** 2) / 0.30) ** 2
               + ((z - 0.25) / 0.16) ** 2) <= 1.0
        hu[lat & brain] = 8.0
    third = ((x / 0.025) ** 2 + ((y - 0.02) / 0.10) ** 2
             + ((z - 0.12) / 0.10) ** 2) <= 1.0
    hu[third & brain] = 8.0

    # orbits: globes with scleral shell + lens, embedded in facial soft
    # tissue anterior-inferior to the vault
    for sx in (-1, 1):
        ge = (((x - sx * 0.24) / 0.105) ** 2 + ((y + 0.50) / 0.105) ** 2
              + ((z + 0.02) / 0.105) ** 2)
        hu[(ge <= 1.0) & head] = 5.0          # vitreous
        hu[(ge <= 1.0) & (ge > 0.78) & head] = 50.0  # sclera
        lens = (((x - sx * 0.24) / 0.035) ** 2 + ((y + 0.575) / 0.022) ** 2
                + ((z + 0.02) / 0.035) ** 2) <= 1.0
        hu[lens & head] = 90.0

    # paranasal sinuses + nasal cavity: air pockets inside facial bone
    sinus_bone = np.zeros(shape, bool)
    for sx in (-1, 1):
        mx = (((x - sx * 0.20) / 0.11) ** 2 + ((y + 0.42) / 0.10) ** 2
              + ((z + 0.28) / 0.12) ** 2) <= 1.0
        sinus_bone |= mx
        hu[mx & head] = -1000.0  # maxillary sinus
        fr = (((x - sx * 0.12) / 0.07) ** 2 + ((y + 0.52) / 0.05) ** 2
              + ((z - 0.34) / 0.08) ** 2) <= 1.0
        hu[fr & head] = -1000.0  # frontal sinus
    nasal = (np.abs(x) < 0.05) & (((y + 0.50) / 0.14) ** 2
                                  + ((z + 0.22) / 0.26) ** 2 <= 1.0)
    hu[nasal & head] = -1000.0
    septum = (np.abs(x) < 0.008) & nasal & head
    hu[septum] = 200.0

    # facial bone shells around the air spaces (thin cortical walls)
    walls = gaussian_filter((hu < -900).astype(np.float32) * head, 1.5)
    wall_band = (walls > 0.08) & (walls < 0.35) & head & (hu > -500) \
        & (z < 0.1) & (y < -0.15)
    hu[wall_band] = 900.0 + 150.0 * tex[wall_band]

    # mandible: U-shaped arch of cortical bone + dental enamel marks
    th = np.linspace(-0.45 * np.pi, 0.45 * np.pi, 60)
    arch_x = 0.30 * np.sin(th)
    arch_y = -0.46 - 0.16 * np.cos(th)
    for k, zk in enumerate((-0.62, -0.52)):  # body + alveolar line
        for xa, ya in zip(arch_x, arch_y):
            d2 = (x - xa) ** 2 + (y - ya) ** 2 + ((z - zk) / 1.6) ** 2
            hu[(d2 <= 0.045 ** 2) & head] = 1250.0
    for i in range(0, 60, 7):  # teeth: very dense enamel points
        d2 = ((x - arch_x[i]) ** 2 + (y - arch_y[i]) ** 2
              + ((z + 0.44) / 1.2) ** 2)
        hu[(d2 <= 0.030 ** 2) & head] = 1900.0

    # cervical spine entering at the skull base
    spine = (x ** 2 + (y - 0.18) ** 2 <= 0.085 ** 2) & (z < -0.30) & head
    vert = np.sin(z * np.pi * 10.0) > -0.3
    hu[spine & vert] = 500.0
    hu[spine & ~vert] = 120.0
    canal = (x ** 2 + (y - 0.18) ** 2 <= 0.030 ** 2) & (z < -0.30) & head
    hu[canal] = 30.0

    # detector/recon band limit
    hu = gaussian_filter(hu, 0.7)
    return np.clip(hu, -1000.0, 2000.0).astype(np.int16)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", type=str, required=True, help=".raw (int16 HU)")
    p.add_argument("--shape", type=int, nargs=3, default=[288, 288, 320])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    vol = head_phantom(tuple(args.shape), args.seed)
    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    vol.tofile(args.output)
    print(f"Wrote {args.output} shape={vol.shape} dtype=int16 "
          f"HU range [{vol.min()}, {vol.max()}]")


if __name__ == "__main__":
    main()
