"""Pack a per-object gt-database into one shared monolith.

Parity target: /root/reference/tools/process_tools/create_integrated_database.py
(:9-54) — stacks every per-object .bin into a single .npy and stamps
`global_data_offset` row ranges into the db_infos, so dataloader workers
share the database through the OS page cache (np.load mmap) instead of
opening thousands of files. The sampler consumes the offsets directly
(datasets/augmentor/database_sampler.py).

Usage:
  python tools/process_tools/create_integrated_database.py \
      --src_db_info data/nuscenes/nuscenes_dbinfos_10sweeps_withvelo.pkl \
      --root_path data/nuscenes --new_db_name nuscenes_gt_database_global \
      --num_point_features 5
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from findnpropagate_tpu.datasets.augmentor.database_sampler import (  # noqa: E402
    build_shared_database,
)


def verify(db_infos, monolith_path, root_path, num_point_features,
           samples=16):
    """Spot-check: offset slices of the monolith match the source .bins
    (reference create_integrated_database.py:57-72)."""
    data = np.load(str(monolith_path), mmap_mode="r")
    rng = np.random.RandomState(0)
    flat = [i for lst in db_infos.values() for i in lst]
    for info in [flat[j] for j in
                 rng.choice(len(flat), min(samples, len(flat)),
                            replace=False)]:
        pts = np.fromfile(
            str(Path(root_path) / info["path"]), dtype=np.float32
        ).reshape(-1, num_point_features)
        s, e = info["global_data_offset"]
        np.testing.assert_allclose(np.asarray(data[s:e]), pts, rtol=0,
                                   atol=0)
    print(f"verified {min(samples, len(flat))} objects against the monolith")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_db_info", required=True,
                    help="db_infos pickle produced by create_infos")
    ap.add_argument("--root_path", required=True,
                    help="dataset root (db paths are relative to it)")
    ap.add_argument("--new_db_name", default="gt_database_global")
    ap.add_argument("--num_point_features", type=int, default=5)
    ap.add_argument("--dst_db_info", default=None,
                    help="output infos pickle (default: overwrite src, as "
                         "the reference does)")
    args = ap.parse_args()

    with open(args.src_db_info, "rb") as f:
        db_infos = pickle.load(f)
    out_path = Path(args.root_path) / f"{args.new_db_name}.npy"
    db_infos = build_shared_database(
        db_infos, args.root_path, out_path,
        num_point_features=args.num_point_features)
    dst = args.dst_db_info or args.src_db_info
    with open(dst, "wb") as f:
        pickle.dump(db_infos, f)
    print(f"integrated database: {out_path}\nstamped infos: {dst}")
    verify(db_infos, out_path, args.root_path, args.num_point_features)


if __name__ == "__main__":
    main()
