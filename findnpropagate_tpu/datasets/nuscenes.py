"""NuScenesDataset — info-pkl based nuScenes loader.

Parity target: pcdet/datasets/nuscenes/nuscenes_dataset.py (/root/reference):
info loading, CBGS class-balanced resampling, multi-sweep aggregation,
camera-matrix loading (CAM_WITHOUT_IMAGE mode), known/unknown class splits.
Official devkit evaluation is gated on nuscenes-devkit availability (absent
in this environment); the built-in BEV-AP evaluator with known/unknown
bucketing is always available.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, logger=None,
                 root_path=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, logger=logger, root_path=root_path,
        )
        self.root = Path(root_path or dataset_cfg.get("DATA_PATH", "data/nuscenes"))
        self.infos = []
        mode = "train" if training else "test"
        for p in dataset_cfg.get("INFO_PATH", {}).get(mode, []):
            fp = self.root / p
            if fp.exists():
                with open(fp, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if not self.infos and logger is not None:
            logger.warning(f"NuScenesDataset: no infos found under {self.root}")

        if training and dataset_cfg.get("BALANCED_RESAMPLING", False) and self.infos:
            self.infos = self.balanced_infos_resampling(self.infos)

        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.use_camera = "camera" in dataset_cfg.get("USED_DATA_TYPES", []) or \
            dataset_cfg.get("CAM_WITHOUT_IMAGE", False)

    def balanced_infos_resampling(self, infos):
        """CBGS duplication (nuscenes_dataset.py:51-86): resample so every
        class appears in ~1/num_classes of the samples."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info.get("gt_names", [])):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        sampled = []
        for v in cls_infos.values():
            if len(v) == 0:
                continue
            ratio = frac * duplicated / len(v)
            take = int(len(v) * ratio)
            idx = np.random.choice(len(v), take)
            sampled.extend([v[i] for i in idx])
        return sampled

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        lidar_path = self.root / info["lidar_path"]
        points = np.fromfile(str(lidar_path), dtype=np.float32).reshape(-1, 5)[:, :5]
        # strip ring index, keep (x, y, z, intensity, dt)
        points[:, 4] = 0
        sweep_list = [points]
        for k in np.random.choice(
            len(info.get("sweeps", [])),
            min(max_sweeps - 1, len(info.get("sweeps", []))),
            replace=False,
        ):
            sweep = info["sweeps"][k]
            pts = np.fromfile(
                str(self.root / sweep["lidar_path"]), dtype=np.float32
            ).reshape(-1, 5)
            pts[:, :3] = (
                pts[:, :3] @ sweep["sensor2lidar_rotation"].T
                + sweep["sensor2lidar_translation"]
            )
            pts[:, 4] = sweep.get("time_lag", 0.0)
            sweep_list.append(pts)
        return np.concatenate(sweep_list, axis=0)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = self.infos[index]
        points = self.get_lidar_with_sweeps(index, self.max_sweeps)
        data_dict = {
            "points": points,
            "frame_id": Path(info["lidar_path"]).stem,
            "metadata": {"token": info.get("token")},
        }
        if "gt_boxes" in info:
            data_dict["gt_boxes"] = info["gt_boxes"]
            data_dict["gt_names"] = info["gt_names"]
        if self.use_camera:
            for key in ("camera_intrinsics", "camera2lidar", "lidar2camera",
                        "lidar2image", "camera_imgs"):
                if key in info:
                    data_dict[key] = info[key]
        return self.prepare_data(data_dict)

    def evaluation(self, det_annos, class_names, eval_metric="nuscenes",
                   **kwargs):
        """Official-protocol mAP/NDS by default (reference delegates to the
        nuscenes devkit, nuscenes_dataset.py:281-344); `eval_metric="simple"`
        keeps the lightweight center-distance AP."""
        gts = [
            {"gt_boxes": info.get("gt_boxes", np.zeros((0, 7))),
             "gt_names": info.get("gt_names", np.array([])),
             "num_lidar_pts": info.get("num_lidar_pts", None),
             "gt_attrs": info.get("gt_attrs", None)}
            for info in self.infos
        ]
        if eval_metric == "simple":
            from .eval_utils import simple_map_eval

            slim = [{"gt_boxes": g["gt_boxes"], "gt_names": g["gt_names"]}
                    for g in gts]
            return simple_map_eval(det_annos, slim, class_names, **kwargs)
        from .nuscenes_eval import nuscenes_protocol_eval

        return nuscenes_protocol_eval(det_annos, gts, class_names, **kwargs)
