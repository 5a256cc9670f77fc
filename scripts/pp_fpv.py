"""Preprocess UZH-FPV sequences (260x346 mDAVIS, equidistant fisheye).

Mirrors /root/reference/scripts/pp_fpv.py: reads the dataset's shipped
kalibr yaml (cam0 intrinsics + distortion_coeffs, get_calib_fpv), computes
the fisheye rectify map (balance=0, pp_fpv.py:103-104) and undistorts the
frames.

Usage: python scripts/pp_fpv.py --indir <seq_dir>...
       [--calib-yaml <camchain.yaml>]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from devo_tpu.data import calibs
from devo_tpu.data.preprocess import preprocess_with_calib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", required=True, nargs="+")
    p.add_argument("--calib-yaml", default=None)
    p.add_argument("--calib", default=None, help="JSON override")
    args = p.parse_args()
    for indir in args.indir:
        if args.calib:
            cam = calibs.from_user_json(args.calib, default_size=(260, 346))
        else:
            cy = args.calib_yaml or next(
                iter(glob.glob(os.path.join(indir, "*camchain*.yaml"))), None)
            if cy is None:
                raise SystemExit(f"{indir}: no kalibr camchain yaml found")
            cam = calibs.read_fpv_calib(cy)
        imgdir = ("img" if os.path.isdir(os.path.join(indir, "img"))
                  else "images" if os.path.isdir(os.path.join(indir, "images"))
                  else None)
        off = preprocess_with_calib(indir, cam, images_dir=imgdir)
        print(f"{indir}: offset {off} us, rectify map + calib written")


if __name__ == "__main__":
    main()
