"""WaymoDataset — per-sequence info-pkl loader.

Parity target: pcdet/datasets/waymo/waymo_dataset.py (/root/reference):
ImageSets sequence lists, per-sequence `<seq>/<seq>.pkl` infos, `%04d.npy`
point files with NLZ filtering + tanh intensity, SAMPLED_INTERVAL
subsampling, zero-box / name filtering. Info GENERATION from tfrecords
needs the waymo-open-dataset devkit (absent in this environment) — the
loader consumes the standard preprocessed layout.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, logger=None,
                 root_path=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names,
            training=training, logger=logger, root_path=root_path,
        )
        self.root = Path(root_path or dataset_cfg.get("DATA_PATH",
                                                      "data/waymo"))
        self.split = dataset_cfg.get("DATA_SPLIT", {}).get(
            "train" if training else "test", "train")
        self.data_path = self.root / dataset_cfg.get(
            "PROCESSED_DATA_TAG", "waymo_processed_data")
        split_file = self.root / "ImageSets" / f"{self.split}.txt"
        self.sample_sequence_list = (
            [l.strip() for l in split_file.read_text().splitlines()
             if l.strip()] if split_file.exists() else [])
        self.infos = []
        self.include_waymo_data(logger)

        interval = int(dataset_cfg.get("SAMPLED_INTERVAL", {}).get(
            "train" if training else "test", 1))
        if interval > 1:
            self.infos = self.infos[::interval]

    def include_waymo_data(self, logger):
        skipped = 0
        for seq_file in self.sample_sequence_list:
            seq = Path(seq_file).stem
            info_path = self.data_path / seq / f"{seq}.pkl"
            if not info_path.exists():
                skipped += 1
                continue
            with open(info_path, "rb") as f:
                self.infos.extend(pickle.load(f))
        if logger is not None:
            logger.info(f"WaymoDataset: {len(self.infos)} samples "
                        f"({skipped} sequences missing)")

    def get_lidar(self, sequence_name, sample_idx):
        pts = np.load(self.data_path / sequence_name / f"{sample_idx:04d}.npy")
        points_all, nlz = pts[:, 0:5], pts[:, 5]
        if not self.dataset_cfg.get("DISABLE_NLZ_FLAG_ON_POINTS", False):
            points_all = points_all[nlz == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = self.infos[index]
        pc = info["point_cloud"]
        points = self.get_lidar(pc["lidar_sequence"], pc["sample_idx"])
        data_dict = {"points": points, "frame_id": info["frame_id"]}
        if "annos" in info:
            annos = info["annos"]
            mask = annos["name"] != "unknown"
            boxes = np.asarray(annos["gt_boxes_lidar"])[mask]
            names = np.asarray(annos["name"])[mask]
            if self.dataset_cfg.get("FILTER_EMPTY_BOXES_FOR_TRAIN", True) \
                    and self.training and "num_points_in_gt" in annos:
                keep = np.asarray(annos["num_points_in_gt"])[mask] > 0
                boxes, names = boxes[keep], names[keep]
            data_dict["gt_boxes"] = boxes[:, :7]
            data_dict["gt_names"] = names
        return self.prepare_data(data_dict)

    def evaluation(self, det_annos, class_names, eval_metric="waymo",
                   **kwargs):
        """Waymo LEVEL_1/2 AP/APH via the devkit-free protocol
        (datasets/waymo_eval.py); eval_metric='simple' keeps the
        center-distance proxy."""
        if eval_metric == "simple":
            from .eval_utils import simple_map_eval

            gts = [{"gt_boxes": info.get("annos", {}).get(
                        "gt_boxes_lidar", np.zeros((0, 7))),
                    "gt_names": info.get("annos", {}).get(
                        "name", np.array([]))}
                   for info in self.infos[: len(det_annos)]]
            return simple_map_eval(det_annos, gts, class_names, **kwargs)
        from .waymo_eval import waymo_eval

        gts = [info.get("annos", {"name": np.array([])})
               for info in self.infos[: len(det_annos)]]
        return waymo_eval(gts, det_annos, class_names)
