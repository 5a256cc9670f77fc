"""Preprocess VECtor sequences (480x640 events + 1024x1224 grayscale).

Mirrors /root/reference/scripts/pp_vector.py: reads the dataset's shipped
ROS-style intrinsic yamls (0_calib/{side}_event_camera_intrinsic_results.yaml
and {side}_regular_camera_intrinsic_results.yaml, pp_vector.py:110-119),
computes the event rectify map (alpha=0 plumb-bob, load_utils.py:1041-1057)
and undistorts the grayscale frames.

Usage: python scripts/pp_vector.py --indir <seq_dir>... [--side left]
       [--calib-dir <0_calib dir>]   (default: <indir>/../0_calib)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from devo_tpu.data import calibs
from devo_tpu.data.preprocess import preprocess_with_calib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--indir", required=True, nargs="+")
    p.add_argument("--side", default="left", choices=["left", "right"])
    p.add_argument("--calib-dir", default=None)
    p.add_argument("--calib", default=None, help="JSON override")
    args = p.parse_args()
    for indir in args.indir:
        cdir = args.calib_dir or os.path.join(indir, "../0_calib")
        if args.calib:
            evs, gray = calibs.from_user_json(args.calib, default_size=(480, 640)), None
        else:
            evs = calibs.read_vector_calib(os.path.join(
                cdir, f"{args.side}_event_camera_intrinsic_results.yaml"))
            gp = os.path.join(
                cdir, f"{args.side}_regular_camera_intrinsic_results.yaml")
            gray = (calibs.read_vector_calib(gp, size=(1024, 1224))
                    if os.path.exists(gp) else None)
        # the grayscale camera is a DIFFERENT sensor (1024x1224): never
        # undistort frames with the event calibration
        imgdir = ("images" if gray is not None
                  and os.path.isdir(os.path.join(indir, "images"))
                  else None)
        off = preprocess_with_calib(
            indir, evs, suffix=f"_{args.side}",
            imgs_ts_file=f"tss_imgs_us_{args.side}.txt",
            images_dir=imgdir, img_calib=gray,
            normalize_times=False)
        print(f"{indir}: offset {off} us, rectify map + calib written")


if __name__ == "__main__":
    main()
