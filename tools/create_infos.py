"""Dataset bootstrap CLI: info-pkl + gt-database generation from raw data.

Reference equivalents: `python -m pcdet.datasets.kitti.kitti_dataset
create_kitti_infos ...` and `python -m pcdet.datasets.nuscenes.nuscenes_dataset
--func create_nuscenes_infos ...` (/root/reference). nuScenes runs
DEVKIT-FREE here (direct JSON table reading).

Usage:
  python tools/create_infos.py kitti --data_path data/kitti [--gt_database]
  python tools/create_infos.py nuscenes --data_path data/nuscenes \
      --version v1.0-trainval --max_sweeps 10 [--with_cam] [--gt_database]
  python tools/create_infos.py lyft --data_path data/lyft/trainval \
      --max_sweeps 10
  python tools/create_infos.py pandaset --data_path data/pandaset
  python tools/create_infos.py argo2 --data_path data/argo2/sensor
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["kitti", "nuscenes", "lyft",
                                        "pandaset", "argo2", "once",
                                        "waymo"])
    ap.add_argument("--sampled_interval", type=int, default=1)
    ap.add_argument("--single_return", action="store_true",
                    help="waymo: first lidar return only")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--save_path", default=None)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--max_sweeps", type=int, default=10)
    ap.add_argument("--with_cam", action="store_true")
    ap.add_argument("--gt_database", action="store_true")
    ap.add_argument("--classes", nargs="*", default=None)
    args = ap.parse_args()

    if args.dataset == "kitti":
        from findnpropagate_tpu.datasets.kitti import (
            create_groundtruth_database, create_kitti_infos,
        )

        out = create_kitti_infos(args.data_path, args.save_path)
        if args.gt_database and "train" in out:
            create_groundtruth_database(
                args.data_path, out["train"], args.save_path,
                used_classes=args.classes)
    elif args.dataset == "nuscenes":
        from findnpropagate_tpu.datasets.nuscenes_infos import (
            create_groundtruth_database, create_nuscenes_infos,
        )

        out = create_nuscenes_infos(
            args.data_path, args.save_path, version=args.version,
            max_sweeps=args.max_sweeps, with_cam=args.with_cam)
        if args.gt_database and "train" in out:
            create_groundtruth_database(
                args.data_path, out["train"], args.save_path,
                used_classes=args.classes)
    elif args.dataset == "lyft":
        from findnpropagate_tpu.datasets.misc_infos import create_lyft_infos

        create_lyft_infos(args.data_path, args.save_path,
                          max_sweeps=args.max_sweeps)
    elif args.dataset == "pandaset":
        from findnpropagate_tpu.datasets.misc_infos import (
            create_pandaset_infos,
        )

        create_pandaset_infos(args.data_path, args.save_path)
    elif args.dataset == "once":
        from findnpropagate_tpu.datasets.misc_infos import create_once_infos

        create_once_infos(args.data_path, args.save_path)
    elif args.dataset == "waymo":
        from findnpropagate_tpu.datasets.waymo_infos import (
            create_waymo_gt_database, create_waymo_infos,
        )

        create_waymo_infos(
            args.data_path, args.save_path,
            sampled_interval=args.sampled_interval,
            use_two_returns=not args.single_return)
        if args.gt_database:
            create_waymo_gt_database(args.data_path, args.save_path,
                                     used_classes=args.classes)
    else:
        from findnpropagate_tpu.datasets.misc_infos import create_argo2_infos

        create_argo2_infos(args.data_path, args.save_path)


if __name__ == "__main__":
    main()
