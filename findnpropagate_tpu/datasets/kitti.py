"""KittiDataset — info-pkl based KITTI loader.

Parity target: pcdet/datasets/kitti/kitti_dataset.py (/root/reference).
Loads preprocessed info pickles (same schema as the reference's
kitti_infos_*.pkl) + velodyne .bin files. Gated: raises a clear error if the
data root is missing so the rest of the framework imports cleanly.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, logger=None,
                 root_path=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, logger=logger, root_path=root_path,
        )
        self.root = Path(root_path or dataset_cfg.get("DATA_PATH", "data/kitti"))
        self.split = dataset_cfg["DATA_SPLIT"]["train" if training else "test"]
        self.infos = []
        info_paths = dataset_cfg.get("INFO_PATH", {}).get(
            "train" if training else "test", []
        )
        for p in info_paths:
            fp = self.root / p
            if fp.exists():
                with open(fp, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if not self.infos and logger is not None:
            logger.warning(f"KittiDataset: no infos found under {self.root}")

    def __len__(self):
        return len(self.infos)

    def get_lidar(self, idx):
        lidar_file = self.root / "training" / "velodyne" / f"{idx}.bin"
        return np.fromfile(str(lidar_file), dtype=np.float32).reshape(-1, 4)

    def __getitem__(self, index):
        info = self.infos[index]
        sample_idx = info["point_cloud"]["lidar_idx"]
        points = self.get_lidar(sample_idx)
        data_dict = {"points": points, "frame_id": sample_idx}
        if "annos" in info:
            annos = info["annos"]
            mask = annos["name"] != "DontCare"
            gt_boxes = annos["gt_boxes_lidar"][: mask.sum()]
            data_dict["gt_boxes"] = gt_boxes
            data_dict["gt_names"] = annos["name"][mask]
        return self.prepare_data(data_dict)

    def evaluation(self, det_annos, class_names, **kwargs):
        from .kitti_eval import kitti_eval

        gt_annos = [info.get("annos", {"name": np.array([])})
                    for info in self.infos[: len(det_annos)]]
        # attach class names to detections (labels are 1-indexed)
        for d in det_annos:
            if "name" not in d:
                labels = np.asarray(d.get("labels", []), int)
                d["name"] = np.asarray(
                    [class_names[l - 1] if 1 <= l <= len(class_names) else "?"
                     for l in labels]
                )
        return kitti_eval(gt_annos, det_annos, class_names)
