"""Detector assembly: cfg-driven module topology, like the reference's
Detector3DTemplate (pcdet/models/detectors/detector3d_template.py:36-194,
/root/reference) but functional.

A `Detector3D` is one flax module that runs the fixed topology
vfe -> map_to_bev -> backbone_2d -> dense_head over a dict-shaped batch
pytree (the reference's mutable batch_dict becomes a threaded dict of
arrays inside jit). Training losses and post-processing are exposed as pure
functions on the wrapper so the train step is a single `value_and_grad`.

Voxelization runs ON DEVICE inside the same jit (the reference voxelizes on
CPU in dataloader workers — data_processor.py:17-62).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.voxelize import voxelize, voxelize_mean
from ..backbones_2d import BACKBONE_2D_REGISTRY, MAP_TO_BEV_REGISTRY
from ..backbones_3d import BACKBONE_3D_REGISTRY
from ..dense_heads import DENSE_HEAD_REGISTRY
from ..dense_heads.anchor_head import make_anchor_head_tools
from ..dense_heads.center_head import make_center_head_tools
from ..dense_heads.transfusion_head import make_transfusion_tools
from ..pfe import PFE_REGISTRY
from ..post_processing import post_process
from ..roi_heads import ROI_HEAD_REGISTRY
from ..vfe import VFE_REGISTRY


class RoIProposalStage(nn.Module):
    """PV-RCNN++ pre-pfe proposal + ROI sampling stage
    (pv_rcnn_plusplus.py:16-27): writes rois / roi_labels / roi_valid (and
    the training target dict) into the batch so the pfe can sample
    keypoints proposal-centrically; the ROI head consumes them as-is."""

    model_cfg: Any

    @nn.compact
    def __call__(self, batch, train: bool):
        from ..roi_heads.roi_head_template import (
            proposal_layer,
            sample_rois_for_rcnn,
        )

        cfg = self.model_cfg
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = jax.vmap(
            lambda c, b: proposal_layer(c, b, nms_cfg)
        )(batch["batch_cls_preds"], batch["batch_box_preds"])
        if train:
            rng = self.make_rng("sampling")
            gt = batch["gt_boxes"]
            rngs = jax.random.split(rng, rois.shape[0])
            targets = jax.vmap(
                lambda r, ro, sc, la, va, gb, gl, gv: sample_rois_for_rcnn(
                    r, ro, sc, la, va, gb, gl, gv, cfg["TARGET_CONFIG"])
            )(rngs, rois, roi_scores, roi_labels, roi_valid,
              gt[..., :7], gt[..., -1].astype(jnp.int32), gt[..., -1] > 0)
            batch["rois"] = targets["rois"]
            batch["roi_labels"] = targets["roi_labels"]
            batch["roi_valid"] = targets["roi_valid"]
            batch["roi_targets"] = targets
        else:
            batch["rois"] = rois
            batch["roi_labels"] = roi_labels
            batch["roi_valid"] = roi_valid
            batch["roi_scores"] = roi_scores
        return batch


class DetectorModule(nn.Module):
    """The jittable forward: batch dict in, batch dict (with preds) out."""

    model_cfg: Any
    num_class: int
    class_names: tuple
    grid_size: tuple
    voxel_size: tuple
    point_cloud_range: tuple
    num_point_features: int
    max_voxels: int
    max_points_per_voxel: int

    def setup(self):
        cfg = self.model_cfg
        modules = []
        if "VFE" in cfg:
            vfe_cls = VFE_REGISTRY[cfg["VFE"]["NAME"]]
            self.vfe = vfe_cls(
                model_cfg=cfg["VFE"],
                num_point_features=self.num_point_features,
                voxel_size=tuple(self.voxel_size),
                point_cloud_range=tuple(self.point_cloud_range),
                grid_size=tuple(self.grid_size),
            )
            modules.append("vfe")
        if "BACKBONE_3D" in cfg:
            bb3_cls = BACKBONE_3D_REGISTRY[cfg["BACKBONE_3D"]["NAME"]]
            bb3_in = self.vfe.output_dim if "VFE" in cfg \
                else self.num_point_features  # point-based backbones
            bb3_kw = {}
            import dataclasses as _dc

            field_names = {f.name for f in _dc.fields(bb3_cls)}
            if "voxel_size" in field_names:
                bb3_kw["voxel_size"] = tuple(self.voxel_size)
                bb3_kw["point_cloud_range"] = tuple(self.point_cloud_range)
            self.backbone_3d = bb3_cls(
                model_cfg=cfg["BACKBONE_3D"],
                input_channels=bb3_in,
                grid_size=tuple(self.grid_size),
                **bb3_kw,
            )
            modules.append("backbone_3d")
        if "MAP_TO_BEV" in cfg:
            m2b_cls = MAP_TO_BEV_REGISTRY[cfg["MAP_TO_BEV"]["NAME"]]
            self.map_to_bev = m2b_cls(
                model_cfg=cfg["MAP_TO_BEV"], grid_size=tuple(self.grid_size)
            )
            modules.append("map_to_bev")
        if "PFE" in cfg:
            pfe_cls = PFE_REGISTRY[cfg["PFE"]["NAME"]]
            self.pfe = pfe_cls(
                model_cfg=cfg["PFE"],
                voxel_size=tuple(self.voxel_size),
                point_cloud_range=tuple(self.point_cloud_range),
                num_rawpoint_features=min(self.num_point_features, 4),
            )
            modules.append("pfe")
        # camera branch (BEVFusion topology, bevfusion.py:9-14)
        if "IMAGE_BACKBONE" in cfg:
            from ..backbones_image import IMAGE_BACKBONE_REGISTRY

            self.image_backbone = IMAGE_BACKBONE_REGISTRY[
                cfg["IMAGE_BACKBONE"]["NAME"]](
                model_cfg=cfg["IMAGE_BACKBONE"])
            modules.append("image_backbone")
        if "NECK" in cfg:
            from ..backbones_image import NECK_REGISTRY

            self.neck = NECK_REGISTRY[cfg["NECK"]["NAME"]](
                model_cfg=cfg["NECK"])
            modules.append("neck")
        if "VTRANSFORM" in cfg:
            from ..view_transforms import VTRANSFORM_REGISTRY

            self.vtransform = VTRANSFORM_REGISTRY[cfg["VTRANSFORM"]["NAME"]](
                model_cfg=cfg["VTRANSFORM"])
            modules.append("vtransform")
        if "FUSER" in cfg:
            from ..backbones_2d.fuser import FUSER_REGISTRY

            self.fuser = FUSER_REGISTRY[cfg["FUSER"]["NAME"]](
                model_cfg=cfg["FUSER"])
            modules.append("fuser")
        if "BACKBONE_2D" in cfg:
            bb_cls = BACKBONE_2D_REGISTRY[cfg["BACKBONE_2D"]["NAME"]]
            in_ch = (
                self.map_to_bev.num_bev_features
                if "MAP_TO_BEV" in cfg
                else int(cfg["BACKBONE_2D"].get("INPUT_CHANNELS", 64))
            )
            self.backbone_2d = bb_cls(
                model_cfg=cfg["BACKBONE_2D"], input_channels=in_ch
            )
            modules.append("backbone_2d")
        if "DENSE_HEAD" in cfg:
            head_cls = DENSE_HEAD_REGISTRY[cfg["DENSE_HEAD"]["NAME"]]
            if "BACKBONE_2D" in cfg:
                head_in = self.backbone_2d.num_bev_features
            else:
                # fully sparse heads (VoxelNeXt) read the backbone_3d output
                head_in = self.backbone_3d.num_bev_features
            head_kw = {}
            if (cfg["DENSE_HEAD"].get("PREDICT_BOXES_WHEN_TRAINING")
                    or "ROI_HEAD" in cfg) \
                    and cfg["DENSE_HEAD"]["NAME"] == "CenterHead":
                # PV-RCNN++-style CenterHead RPN: dense decode feeds the
                # proposal stage (center_head.py dense-decode branch)
                head_kw["predict_boxes_when_training"] = True
            self.dense_head = head_cls(
                model_cfg=cfg["DENSE_HEAD"],
                input_channels=head_in,
                num_class=self.num_class,
                class_names=tuple(self.class_names),
                grid_size=tuple(self.grid_size),
                point_cloud_range=tuple(self.point_cloud_range),
                voxel_size=tuple(self.voxel_size),
                **head_kw,
            )
            modules.append("dense_head")
        if "POINT_HEAD" in cfg:
            ph_name = cfg["POINT_HEAD"].get("NAME", "PointHeadSimple")
            if ph_name == "PointHeadBox":
                from ..dense_heads.point_head_box import PointHeadBox

                self.point_head = PointHeadBox(
                    model_cfg=cfg["POINT_HEAD"], input_channels=0)
            elif ph_name == "PointIntraPartOffsetHead":
                from ..dense_heads.point_intra_part_head import (
                    PointIntraPartOffsetHead,
                )

                self.point_head = PointIntraPartOffsetHead(
                    model_cfg=cfg["POINT_HEAD"], input_channels=0,
                    num_class=self.num_class)
            else:
                from ..dense_heads.point_head_simple import PointHeadSimple

                self.point_head = PointHeadSimple(
                    model_cfg=cfg["POINT_HEAD"],
                    input_channels=0,
                )
            modules.append("point_head")
        if "ROI_HEAD" in cfg:
            roi_cls = ROI_HEAD_REGISTRY[cfg["ROI_HEAD"]["NAME"]]
            self.roi_head = roi_cls(
                model_cfg=cfg["ROI_HEAD"],
                point_cloud_range=tuple(self.point_cloud_range),
                voxel_size=tuple(self.voxel_size),
                num_class=1 if cfg["ROI_HEAD"].get("CLASS_AGNOSTIC", True)
                else self.num_class,
            )
            modules.append("roi_head")
        if "ROI_HEAD" in cfg and cfg["ROI_HEAD"].get("PROPOSAL_BEFORE_PFE"):
            # PV-RCNN++ topology (pv_rcnn_plusplus.py:9-41): the proposal
            # layer + ROI sampling run BEFORE the pfe so the keypoints can
            # sample proposal-centrically
            self.roi_proposal = RoIProposalStage(
                model_cfg=cfg["ROI_HEAD"], name="roi_proposal")
            if "pfe" in modules:
                modules.remove("pfe")
            di = modules.index("dense_head")
            modules[di + 1:di + 1] = ["roi_proposal", "pfe"]
        self.module_order = tuple(modules)

    def _voxelize(self, batch):
        """Device-side voxelization for the whole batch (vmapped).

        MeanVFE models take the fused `voxelize_mean` path: the per-voxel
        mean IS the VFE output, and skipping the (V, T, C) bucket avoids its
        128-lane-padded layout (~20 GB at batch-32 nuScenes scale — the
        round-3 bench OOM)."""
        static = (
            tuple(self.point_cloud_range), tuple(self.voxel_size),
            tuple(int(g) for g in self.grid_size),
            self.max_voxels, self.max_points_per_voxel,
        )
        if self.model_cfg.get("VFE", {}).get("NAME") == "MeanVFE":
            out = jax.vmap(lambda pts, m: voxelize_mean(pts, m, *static))(
                batch["points"], batch["points_mask"])
            batch["voxel_features"] = out.means
        else:
            out = jax.vmap(lambda pts, m: voxelize(pts, m, *static))(
                batch["points"], batch["points_mask"])
            batch["voxels"] = out.voxels
        batch["voxel_coords"] = out.coords
        batch["voxel_num_points"] = out.num_points
        batch["voxel_mask"] = out.voxel_mask
        return batch

    def __call__(self, batch, train: bool = False, upto: int = None):
        """upto: run only the first `upto` modules (profiling hook)."""
        batch = dict(batch)
        if "voxels" not in batch and "VFE" in self.model_cfg \
                and self.model_cfg["VFE"]["NAME"] != "ImageVFE":
            batch = self._voxelize(batch)
        order = self.module_order if upto is None else self.module_order[:upto]
        for name in order:
            batch = getattr(self, name)(batch, train)
        return batch


@dataclass
class Detector3D:
    """Wrapper bundling the flax module with pure loss / post-process fns."""

    module: DetectorModule
    model_cfg: Any
    post_cfg: Any
    head_tools: Any  # AnchorHeadTools or head-specific equivalent

    def init(self, rng, example_batch):
        return self.module.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1),
             "sampling": jax.random.fold_in(rng, 2)},
            example_batch, train=True,
        )

    def apply(self, variables, batch, train: bool = False, rng=None, **kw):
        rngs = None
        if rng is not None:
            rngs = {"dropout": rng,
                    "sampling": jax.random.fold_in(rng, 7)}
        return self.module.apply(variables, batch, train=train, rngs=rngs, **kw)

    def loss(self, variables, batch, rng=None):
        """Pure (variables, batch) -> (loss, (tb_dict, mutated_collections))."""
        base = rng if rng is not None else jax.random.PRNGKey(0)
        rngs = {"dropout": base, "sampling": jax.random.fold_in(base, 7)}
        out, mut = self.module.apply(
            variables, batch, train=True, mutable=["batch_stats"], rngs=rngs
        )
        loss, tb = self.head_tools.compute_loss(out)
        if "sparse_window_overflow" in out:
            # runtime exactness sanitizer (PERF.md): a nonzero count means
            # the configured windows truncated true neighbor spans — the
            # trainer warns/raises on it (runtime/trainer.py)
            tb = dict(tb)
            tb["sparse_window_overflow"] = out["sparse_window_overflow"]
        return loss, (tb, mut)

    def post_process(self, out_batch, max_det: int = 256):
        if "mppnet_preds" in out_batch:
            from ..post_processing import post_process_mppnet

            pc = self.post_cfg
            nms_cfg = pc["NMS_CONFIG"]
            return post_process_mppnet(
                out_batch["batch_cls_preds"][..., 0],
                out_batch["batch_box_preds"],
                out_batch["batch_roi_labels"],
                out_batch.get("roi_valid"),
                float(nms_cfg["NMS_THRESH"]),
                score_thresh=float(pc.get("SCORE_THRESH", 0.1)),
                nms_pre=int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024)),
                nms_post=int(nms_cfg.get("NMS_POST_MAXSIZE", 256)),
                not_apply_nms_for_vel=bool(
                    pc.get("NOT_APPLY_NMS_FOR_VEL", False)),
            )
        if "rcnn_iou" in out_batch:
            # two-stage IoU head: stage-2 scores on stage-1 boxes
            from ..post_processing import post_process_two_stage

            pc = self.post_cfg
            nms_cfg = pc["NMS_CONFIG"]
            return post_process_two_stage(
                out_batch["batch_cls_preds"],
                out_batch["batch_box_preds"],
                out_batch["batch_roi_labels"],
                out_batch.get("roi_valid"),
                float(nms_cfg["NMS_THRESH"]),
                score_thresh=float(pc.get("SCORE_THRESH", 0.1)),
                nms_pre=int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024)),
                nms_post=int(nms_cfg.get("NMS_POST_MAXSIZE", 256)),
            )
        if "transfusion_preds" in out_batch:
            # TransFusion decodes its own queries; no dense NMS needed
            return self.head_tools.get_bboxes(
                out_batch["transfusion_preds"], max_det=max_det
            )
        if "center_preds" in out_batch:
            return self.head_tools.get_bboxes(out_batch)
        if "voxelnext_preds" in out_batch:
            return self.head_tools.get_bboxes(out_batch)
        if "center_clip_preds" in out_batch:
            return self.head_tools.get_bboxes(out_batch)
        pc = self.post_cfg
        nms_cfg = pc["NMS_CONFIG"]
        return post_process(
            out_batch["batch_cls_preds"],
            out_batch["batch_box_preds"],
            float(nms_cfg["NMS_THRESH"]),
            score_thresh=float(pc.get("SCORE_THRESH", 0.1)),
            nms_pre=int(nms_cfg.get("NMS_PRE_MAXSIZE", 1024)),
            nms_post=int(nms_cfg.get("NMS_POST_MAXSIZE", 256)),
            normalized=bool(out_batch.get("cls_preds_normalized", False)),
        )


def build_detector(model_cfg, num_class, dataset):
    """dataset provides: class_names, grid_size, voxel_size, point_cloud_range,
    num_point_features, max_voxels, max_points_per_voxel (mirrors
    detector3d_template.py:57-65)."""
    # point-based pipelines (PointRCNN) have no voxelization step
    grid_size = dataset.grid_size if dataset.grid_size is not None else (1, 1, 1)
    voxel_size = dataset.voxel_size if dataset.voxel_size is not None \
        else (1.0, 1.0, 1.0)
    module = DetectorModule(
        model_cfg=model_cfg,
        num_class=num_class,
        class_names=tuple(dataset.class_names),
        grid_size=tuple(int(g) for g in grid_size),
        voxel_size=tuple(float(v) for v in voxel_size),
        point_cloud_range=tuple(float(v) for v in dataset.point_cloud_range),
        num_point_features=int(dataset.num_point_features),
        max_voxels=int(dataset.max_voxels),
        max_points_per_voxel=int(dataset.max_points_per_voxel),
    )
    head_tools = None
    head_name = model_cfg.get("DENSE_HEAD", {}).get("NAME")
    if head_name == "CenterHeadCLIP":
        from ..dense_heads.center_head_clip import make_center_head_clip_tools

        head_tools = make_center_head_clip_tools(
            model_cfg["DENSE_HEAD"], num_class,
            tuple(int(g) for g in grid_size),
            tuple(float(v) for v in dataset.point_cloud_range),
            tuple(float(v) for v in voxel_size),
            class_names=tuple(dataset.class_names),
        )
    elif head_name == "CenterHead":
        head_tools = make_center_head_tools(
            model_cfg["DENSE_HEAD"], num_class,
            tuple(int(g) for g in dataset.grid_size),
            tuple(float(v) for v in dataset.point_cloud_range),
            tuple(float(v) for v in dataset.voxel_size),
            class_names=tuple(dataset.class_names),
        )
    elif head_name in ("AnchorHeadSingle", "AnchorHeadMulti"):
        head_tools = make_anchor_head_tools(
            model_cfg["DENSE_HEAD"], num_class,
            tuple(int(g) for g in dataset.grid_size),
            tuple(float(v) for v in dataset.point_cloud_range),
        )
    elif head_name == "VoxelNeXtHead":
        from ..dense_heads.voxelnext_head import make_voxelnext_head_tools

        head_tools = make_voxelnext_head_tools(
            model_cfg["DENSE_HEAD"], num_class,
            tuple(int(g) for g in dataset.grid_size),
            tuple(float(v) for v in dataset.point_cloud_range),
            tuple(float(v) for v in dataset.voxel_size),
            class_names=tuple(dataset.class_names),
        )
    elif head_name in ("TransFusionHead", "TransFusionHeadAM"):
        head_cfg = model_cfg["DENSE_HEAD"]
        if head_name == "TransFusionHeadAM":
            # the AM head's class space is its anchor-prior table
            # (transfusion_head_am.py:154-173)
            from ..dense_heads.transfusion_head_am import DEFAULT_ANCHORS

            num_class = len(head_cfg.get("ANCHOR_SIZES", DEFAULT_ANCHORS))
        unknown_labels = tuple(head_cfg.get("UNKNOWN_LABELS", ()))
        relabel_lut = tuple(head_cfg.get("RELABEL_LUT", ()))
        if "KNOWN_CLASS_NAMES" in head_cfg and "FULL_CLASS_NAMES" in head_cfg:
            known = list(head_cfg["KNOWN_CLASS_NAMES"])
            full = list(head_cfg["FULL_CLASS_NAMES"])
            lut = [0] + [full.index(n) + 1 for n in known]
            relabel_lut = tuple(lut)
            unknown_labels = tuple(
                i + 1 for i, n in enumerate(full) if n not in known
            )
        head_tools = make_transfusion_tools(
            head_cfg, num_class,
            tuple(int(g) for g in dataset.grid_size),
            tuple(float(v) for v in dataset.point_cloud_range),
            tuple(float(v) for v in dataset.voxel_size),
            class_names=tuple(dataset.class_names),
            unknown_labels=unknown_labels,
            relabel_lut=relabel_lut,
        )
    if head_tools is not None \
            and model_cfg.get("VFE", {}).get("NAME") == "ImageVFE":
        # CaDDN: dense-head loss + depth-distribution supervision
        from ..vfe.image_vfe import ddn_loss

        vfe_cfg = model_cfg["VFE"]

        @dataclass
        class CaddnTools:
            stage1: Any

            def __getattr__(self, name):
                return getattr(self.stage1, name)

            def compute_loss(self, out_batch):
                loss1, tb = self.stage1.compute_loss(out_batch)
                loss_d, tb_d = ddn_loss(out_batch, vfe_cfg)
                tb = dict(tb)
                tb.update(tb_d)
                return loss1 + loss_d, tb

        head_tools = CaddnTools(head_tools)

    if head_tools is not None and model_cfg.get("BACKBONE_3D", {}).get(
            "NAME") == "VoxelBackBone8xFocal":
        # Focals Conv: head loss + importance supervision
        # (spconv_backbone_focal.py:201-208 get_loss)
        @dataclass
        class FocalTools:
            stage1: Any

            def __getattr__(self, name):
                return getattr(self.stage1, name)

            def compute_loss(self, out_batch):
                loss1, tb = self.stage1.compute_loss(out_batch)
                lbp = out_batch.get("loss_box_of_pts")
                if lbp is None:
                    return loss1, tb
                tb = dict(tb)
                tb["loss_box_of_pts"] = lbp
                return loss1 + lbp, tb

        head_tools = FocalTools(head_tools)

    if model_cfg.get("ROI_HEAD", {}).get("NAME") == "MPPNetHead":
        # MPPNet: proposal-refinement only, no first stage inside the model
        # (mppnet.py:36-42 — loss is the roi head's alone)
        from ..roi_heads.mppnet_head import mppnet_loss

        roi_cfg = model_cfg["ROI_HEAD"]

        @dataclass
        class MPPNetTools:
            def compute_loss(self, out_batch):
                return mppnet_loss(out_batch, roi_cfg)

        head_tools = MPPNetTools()
    elif "ROI_HEAD" in model_cfg and (
            head_tools is not None or "POINT_HEAD" in model_cfg):
        roi_name = model_cfg["ROI_HEAD"]["NAME"]
        if roi_name == "SECONDHead":
            from ..roi_heads.second_head import rcnn_iou_loss as roi_loss_fn
        else:
            from ..roi_heads.pvrcnn_head import (
                pvrcnn_rcnn_loss as roi_loss_fn,
            )
        point_cfg = model_cfg.get("POINT_HEAD")
        point_head_name = (point_cfg or {}).get("NAME", "PointHeadSimple")

        @dataclass
        class TwoStageTools:
            stage1: Any
            roi_loss_cfg: Any

            def compute_loss(self, out_batch):
                if self.stage1 is not None:
                    loss1, tb = self.stage1.compute_loss(out_batch)
                else:
                    loss1, tb = 0.0, {}
                loss2, tb2 = roi_loss_fn(out_batch, self.roi_loss_cfg)
                tb = dict(tb)
                tb.update(tb2)
                total = loss1 + loss2
                if point_cfg is not None:
                    if point_head_name == "PointHeadBox":
                        from ..dense_heads.point_head_box import (
                            point_head_box_loss,
                        )

                        lp, tbp = point_head_box_loss(out_batch, point_cfg)
                    elif point_head_name == "PointIntraPartOffsetHead":
                        from ..dense_heads.point_intra_part_head import (
                            point_part_head_loss,
                        )

                        lp, tbp = point_part_head_loss(
                            out_batch, point_cfg, num_class)
                    else:
                        from ..dense_heads.point_head_simple import (
                            point_head_loss,
                        )

                        lp, tbp = point_head_loss(
                            out_batch, point_cfg["LOSS_CONFIG"],
                            extra_width=tuple(
                                point_cfg.get("TARGET_CONFIG", {}).get(
                                    "GT_EXTRA_WIDTH", (0.2, 0.2, 0.2))),
                        )
                    total = total + lp
                    tb.update(tbp)
                return total, tb

        head_tools = TwoStageTools(head_tools,
                                   model_cfg["ROI_HEAD"]["LOSS_CONFIG"])

    return Detector3D(
        module=module,
        model_cfg=model_cfg,
        post_cfg=model_cfg.get("POST_PROCESSING", {}),
        head_tools=head_tools,
    )
