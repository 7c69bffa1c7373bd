"""MPPNet: multi-frame proposal refinement over proposal trajectories.

Parity targets (/root/reference):
  pcdet/models/roi_heads/mppnet_head.py:15-296 (ProposalTargetLayerMPPNet),
  298-799 (MPPNetHead forward), 801-959 (losses);
  pcdet/models/detectors/mppnet.py:12-180 (detector shell + NMS rules).

TPU redesign: the reference is per-sample Python — batch loops for
trajectory IoU matching, per-roi while-loops for noise augmentation, and
dynamic point crops. Here the whole head is ONE jitted program:
  * trajectory generation = F-1 static steps of batched rotated IoU
    (velocity-propagated boxes vs next-frame proposals);
  * roi noise aug = aug_times parallel candidates + first-above-threshold
    selection (replaces the data-dependent while loop, same distribution);
  * point cropping = masked first-K selection per (roi, frame) at fixed
    shapes (cylinder radius crop, frame 0 untimed, frames >0 time-gated);
  * proxy pooling = the existing batched SALayer over a (B*S*F) axis;
  * the grouped transformer keeps groups on their own axis (see
    model_utils/mppnet_utils.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.rotated_iou import boxes_iou3d
from ...utils.box_coders import ResidualCoder
from ...utils.geometry import rotate_points_along_z
from ...utils.losses import smooth_l1, corner_loss_lidar
from ..model_utils.mppnet_utils import (
    MLPStack,
    MPPNetTransformer,
    SeqBoxPointNet,
)
from ..pfe.voxel_set_abstraction import SALayer
from .roi_head_template import sample_rois_for_rcnn


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def box_anchor_points(boxes):
    """8 corners + center of each box in the global frame
    (mppnet_head.py:367-401). boxes (..., 7) -> (..., 9, 3)."""
    lwh = boxes[..., 3:6]
    # corner offsets in {0,1}^3 * lwh - lwh/2 (meshgrid row-major order)
    unit = jnp.asarray(
        [[i, j, k] for i in (0.0, 1.0) for j in (0.0, 1.0)
         for k in (0.0, 1.0)], jnp.float32)                   # (8, 3)
    local = unit[None] * lwh[..., None, :] - lwh[..., None, :] / 2.0
    shape = local.shape
    rot = rotate_points_along_z(
        local.reshape(-1, 8, 3), boxes[..., 6].reshape(-1)).reshape(shape)
    corners = rot + boxes[..., None, 0:3]
    return jnp.concatenate([corners, boxes[..., None, 0:3]], axis=-2)


def spherical_offsets(points, anchors, diag):
    """Per-point offsets to the 9 anchor points in spherical form
    (mppnet_head.py:454-468). points (..., P, 3); anchors (..., 9, 3);
    diag (...,) -> (..., P, 27) = [dis*9, phi*9, theta*9]."""
    rel = points[..., :, None, :] - anchors[..., None, :, :]  # (...,P,9,3)
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    dis = jnp.sqrt(x * x + y * y + z * z)
    phi = jnp.arctan(y / (x + 1e-5))
    theta = jnp.arccos(jnp.clip(z / (dis + 1e-5), -1.0, 1.0))
    dis = dis / (diag[..., None, None] + 1e-5)
    return jnp.concatenate([dis, phi, theta], axis=-1)


def proxy_grid_points(boxes, grid_size: int):
    """Dense grid_size^3 proxy points inside each box, global frame
    (mppnet_head.py:380-389,444-452). boxes (..., 7) -> (..., G, 3)."""
    g = grid_size
    idx = jnp.asarray(
        [[i, j, k] for i in range(g) for j in range(g) for k in range(g)],
        jnp.float32)                                          # (G, 3)
    lwh = boxes[..., 3:6]
    local = (idx[None] + 0.5) / g * lwh[..., None, :] \
        - lwh[..., None, :] / 2.0
    shape = local.shape
    rot = rotate_points_along_z(
        local.reshape(-1, g ** 3, 3),
        boxes[..., 6].reshape(-1)).reshape(shape)
    return rot + boxes[..., None, 0:3]


# ---------------------------------------------------------------------------
# trajectory generation (mppnet_head.py:635-659)
# ---------------------------------------------------------------------------

def generate_trajectory(proposals, proposals_valid, iou_thresh: float = 0.5):
    """Single sample. proposals (F, R, C>=9) frame-major (frame 0 =
    current, frame i = i*0.1s in the past), channels [x y z dx dy dz ry
    vx vy ...].

    Returns (trajectory (F, R, C), valid_length (F, R) bool,
    assignment (F, R) int32 — the matched index into frame i's proposal
    list, the memory-bank "matching table"): frame i>0 is the best-IoU
    proposal of frame i against the velocity-propagated frame i-1 box
    (valid when IoU >= 0.5), else the propagated box itself."""
    num_frames = proposals.shape[0]
    r = proposals.shape[1]
    traj = [proposals[0]]
    valid = [proposals_valid[0]]
    assigns = [jnp.arange(r, dtype=jnp.int32)]
    for i in range(1, num_frames):
        prev = traj[-1]
        pred = prev.at[:, 0:2].add(prev[:, 7:9])
        iou = boxes_iou3d(pred[:, :7], proposals[i][:, :7])
        iou = jnp.where(proposals_valid[i][None, :], iou, 0.0)
        best = jnp.max(iou, axis=1)
        assign = jnp.argmax(iou, axis=1).astype(jnp.int32)
        ok = best >= iou_thresh
        traj.append(jnp.where(ok[:, None], proposals[i][assign], pred))
        valid.append(ok & valid[0])
        assigns.append(assign)
    return jnp.stack(traj, 0), jnp.stack(valid, 0), jnp.stack(assigns, 0)


# ---------------------------------------------------------------------------
# parallel roi noise augmentation (mppnet_head.py:225-296)
# ---------------------------------------------------------------------------

def aug_rois_parallel(rng, rois, gt_boxes, src_iou, aug_times: int,
                      keep_ratio: float, pos_thresh: float):
    """Single sample. The reference's aug_roi_by_noise while-loop, made
    parallel: draw `aug_times` candidates per roi (each kept as the
    original with p=keep_ratio), take the FIRST candidate whose IoU with
    the paired gt reaches pos_thresh, else the last candidate.

    rois/gt_boxes (M, 7); src_iou (M,). Returns (aug_rois, ious)."""
    m = rois.shape[0]
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    pos = jax.random.uniform(k1, (aug_times, m, 3), minval=-0.5, maxval=0.5)
    scale = 1.0 + jax.random.uniform(
        k2, (aug_times, m, 3), minval=-0.15, maxval=0.15)
    rot = jax.random.uniform(
        k3, (aug_times, m, 1), minval=-np.pi / 12, maxval=np.pi / 12)
    keep = jax.random.uniform(k4, (aug_times, m)) <= keep_ratio
    cand = jnp.concatenate(
        [rois[None, :, 0:3] + pos, rois[None, :, 3:6] * scale,
         rois[None, :, 6:7] + rot], axis=-1)
    cand = jnp.where(keep[..., None], rois[None], cand)
    iou = jax.vmap(
        lambda c: jnp.diagonal(boxes_iou3d(c, gt_boxes[:, :7])))(cand)
    iou = jnp.where(keep, src_iou[None], iou)                  # (T, M)
    hit = iou >= pos_thresh
    first = jnp.argmax(hit, axis=0)                            # (M,)
    pick = jnp.where(jnp.any(hit, axis=0), first, aug_times - 1)
    sel = cand[pick, jnp.arange(m)]
    out_iou = iou[pick, jnp.arange(m)]
    return sel, out_iou


# ---------------------------------------------------------------------------
# point cropping (mppnet_head.py:470-548)
# ---------------------------------------------------------------------------

def crop_points_to_rois(points, points_mask, boxes, num_sample: int,
                        time_gate=None):
    """Single sample. First-`num_sample` points inside each box's
    cylindrical radius (1.1 * half-diagonal in BEV), in point order —
    matching topk-of-mask semantics (mppnet_head.py:470-492).

    points (N, C); boxes (M, 7+); time_gate (N,) bool or None.
    Returns (crop (M, K, C), crop_valid (M, K))."""
    n = points.shape[0]
    radii = jnp.sqrt(
        (boxes[:, 3] / 2) ** 2 + (boxes[:, 4] / 2) ** 2) * 1.1
    d2 = (points[None, :, 0] - boxes[:, None, 0]) ** 2 \
        + (points[None, :, 1] - boxes[:, None, 1]) ** 2
    ok = (d2 <= (radii ** 2)[:, None]) & points_mask[None, :]
    if time_gate is not None:
        ok = ok & time_gate[None, :]
    # first K in index order: key = ok ? -index : -N-1
    key = jnp.where(ok, -jnp.arange(n, dtype=jnp.float32)[None, :],
                    -float(n + 1))
    _, idx = jax.lax.top_k(key, num_sample)                    # (M, K)
    valid = jnp.take_along_axis(ok, idx, axis=1)
    crop = points[idx]
    # back-fill empty slots with the first hit (reference keeps slot 0)
    first = crop[:, :1]
    crop = jnp.where(valid[..., None], crop, first)
    crop = jnp.where(jnp.any(valid, 1)[:, None, None], crop, 0.0)
    return crop, valid


# ---------------------------------------------------------------------------
# the head module
# ---------------------------------------------------------------------------

class MPPNetHead(nn.Module):
    """Consumes per-frame proposals (batch keys `roi_boxes` (B, F, R, 9),
    `roi_scores` (B, F, R), `roi_labels` (B, F, R)) plus the multi-frame
    point cloud (`points` with a trailing time channel), and refines the
    current-frame boxes (mppnet_head.py:661-799)."""

    model_cfg: Any
    point_cloud_range: tuple = ()
    voxel_size: tuple = ()
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool):
        cfg = self.model_cfg
        tcfg = cfg["Transformer"]
        num_frames = int(tcfg["num_frames"])
        num_groups = int(tcfg["num_groups"])
        p_pts = int(tcfg["num_lidar_points"])
        g_pts = int(tcfg["num_proxy_points"])
        grid = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        hidden = int(cfg["TRANS_INPUT"])
        use_ts = bool(cfg.get("USE_TIMESTAMP", False))
        coder = ResidualCoder()
        code = coder.code_size

        proposals = batch["roi_boxes"]                        # (B, F, R, 9)
        b, f, r, pc = proposals.shape
        assert f == num_frames, (f, num_frames)
        prop_valid = jnp.abs(proposals[..., :6]).sum(-1) > 0  # (B, F, R)

        traj, valid_len, _ = jax.vmap(generate_trajectory)(
            proposals, prop_valid)                            # (B,F,R,C)
        roi_scores0 = batch["roi_scores"][:, 0]               # (B, R)
        roi_labels0 = batch["roi_labels"][:, 0].astype(jnp.int32)

        targets = None
        if train:
            rng = self.make_rng("sampling")
            gt = batch["gt_boxes"]
            rngs = jax.random.split(rng, b)
            tgt_cfg = cfg["TARGET_CONFIG"]

            def sample_one(key, tr, vl, sc, la, gb):
                k_samp, k_aug, k_traj = jax.random.split(key, 3)
                out = sample_rois_for_rcnn(
                    k_samp, tr[0], sc, la, vl[0], gb[..., :7],
                    gb[..., -1].astype(jnp.int32), gb[..., -1] > 0, tgt_cfg)
                take = out["take"]
                s_traj = tr[:, take]                          # (F, S, C)
                s_vlen = vl[:, take]
                if bool(tgt_cfg.get("USE_ROI_AUG", False)):
                    aug, aug_iou = aug_rois_parallel(
                        k_aug, out["rois"][:, :7],
                        out["gt_of_rois_src"][:, :7],
                        out["gt_iou_of_rois"],
                        int(tgt_cfg.get("ROI_FG_AUG_TIMES", 10)),
                        float(tgt_cfg.get("RATIO", 0.2)),
                        min(float(tgt_cfg["REG_FG_THRESH"]),
                            float(tgt_cfg["CLS_FG_THRESH"])))
                    fg = out["reg_valid_mask"]
                    rois7 = jnp.where(fg[:, None], aug, out["rois"][:, :7])
                    out["rois"] = jnp.concatenate(
                        [rois7, out["rois"][:, 7:]], axis=-1)
                    out["gt_iou_of_rois"] = jnp.where(
                        fg, aug_iou, out["gt_iou_of_rois"])
                if bool(tgt_cfg.get("USE_TRAJ_AUG", {}).get(
                        "ENABLED", False)):
                    thr = float(tgt_cfg["USE_TRAJ_AUG"]["THRESHOD"])
                    fg = out["reg_valid_mask"]
                    frames = [out["rois"][None, :, :]]
                    for fi in range(1, num_frames):
                        a, _ = aug_rois_parallel(
                            jax.random.fold_in(k_traj, fi),
                            s_traj[fi, :, :7], s_traj[fi, :, :7],
                            jnp.ones_like(out["gt_iou_of_rois"]),
                            int(tgt_cfg.get("ROI_FG_AUG_TIMES", 10)),
                            float(tgt_cfg.get("RATIO", 0.2)), thr)
                        fr = jnp.where(
                            fg[:, None],
                            jnp.concatenate([a, s_traj[fi, :, 7:]], -1),
                            s_traj[fi])
                        frames.append(fr[None])
                    s_traj = jnp.concatenate(frames, 0)
                else:
                    s_traj = s_traj.at[0].set(out["rois"])
                return out, s_traj, s_vlen

            targets, traj, valid_len = jax.vmap(sample_one)(
                rngs, traj, valid_len, roi_scores0, roi_labels0, gt)
            rois = targets["rois"]                            # (B, S, C)
            roi_labels = targets["roi_labels"]
            roi_valid = targets["roi_valid"]
        else:
            rois = traj[:, 0]
            roi_labels = roi_labels0
            roi_valid = prop_valid[:, 0]

        s = rois.shape[1]
        empty_mask = jnp.abs(rois[..., :6]).sum(-1) <= 0      # (B, S)

        # ---- crop points per (roi, frame) ----
        pts = batch["points"]                                 # (B, N, C)
        pmask = batch["points_mask"]
        t = pts[..., -1]
        feat_dim = pts.shape[-1] if use_ts else pts.shape[-1] - 1

        crops, crop_valid = [], []
        for fi in range(num_frames):
            m_fi = pmask if fi == 0 \
                else pmask & (jnp.abs(t - fi * 0.1) < 1e-3)
            c, v = jax.vmap(
                lambda p, m, bx: crop_points_to_rois(p, m, bx, p_pts)
            )(pts, m_fi, traj[:, fi, :, :7])
            crops.append(c[..., :feat_dim])
            crop_valid.append(v)
        src = jnp.stack(crops, axis=2)                        # (B,S,F,P,C)
        src_valid = jnp.stack(crop_valid, axis=2)             # (B,S,F,P)
        # frames >0: only valid trajectories contribute; else reuse frame 0
        # (crop_current_frame_points' repeat fill, mppnet_head.py:490)
        vl = valid_len.transpose(0, 2, 1)                     # (B, S, F)
        keep = vl[..., None]
        src = jnp.where(keep[..., None], src, src[:, :, :1])
        src_valid = jnp.where(keep, src_valid, src_valid[:, :, :1])

        # ---- proposal-aware geometry feature (mppnet_head.py:551-573) ----
        anchor9 = box_anchor_points(traj[..., :7])            # (B,F,S,9,3)
        anchor9 = anchor9.transpose(0, 2, 1, 3, 4)            # (B,S,F,9,3)
        diag = jnp.linalg.norm(
            traj[..., 3:6], axis=-1).transpose(0, 2, 1)       # (B,S,F)
        sph = spherical_offsets(src[..., :3], anchor9, diag)  # (B,S,F,P,27)
        geo_in = jnp.concatenate([sph, src[..., 3:]], axis=-1)
        num_radius = len(cfg["ROI_GRID_POOL"]["POOL_RADIUS"])
        geo = MLPStack(64, hidden // num_radius, 3,
                       name="up_dimension_geometry")(geo_in)

        # proxy pooling: each (roi, frame) pools its own crop onto its
        # grid^3 proxies (roi_grid_pool, mppnet_head.py:403-442)
        proxies = proxy_grid_points(
            traj[..., :7].transpose(0, 2, 1, 3), grid)        # (B,S,F,G,3)
        bsf = b * s * num_frames
        sa = SALayer(
            mlps=tuple(tuple(m) for m in cfg["ROI_GRID_POOL"]["MLPS"]),
            radii=tuple(float(x) for x in
                        cfg["ROI_GRID_POOL"]["POOL_RADIUS"]),
            nsamples=tuple(int(x) for x in cfg["ROI_GRID_POOL"]["NSAMPLE"]),
            name="roi_grid_pool")
        pooled = sa(
            proxies.reshape(bsf, g_pts, 3),
            jnp.ones((bsf, g_pts), bool),
            src[..., :3].reshape(bsf, p_pts, 3),
            src_valid.reshape(bsf, p_pts),
            geo.reshape(bsf, p_pts, -1), train)               # (BSF,G,hid)
        geo_feat = pooled.reshape(b, s, num_frames * g_pts, hidden)

        # ---- motion feature (mppnet_head.py:577-606) ----
        prox_flat = proxies.reshape(b, s, num_frames * g_pts, 3)
        sph_m = spherical_offsets(
            prox_flat, anchor9[:, :, 0], diag[:, :, 0])       # (B,S,FG,27)
        tstamp = jnp.repeat(
            jnp.arange(num_frames, dtype=jnp.float32) * 0.1, g_pts)
        tfeat = jnp.broadcast_to(
            tstamp[None, None, :, None],
            (b, s, num_frames * g_pts, 1))
        zeros2 = jnp.zeros((b, s, num_frames * g_pts, 2), jnp.float32)
        motion = MLPStack(64, hidden, 3, name="up_dimension_motion")(
            jnp.concatenate([sph_m, zeros2, tfeat], axis=-1))

        feats = geo_feat + motion                             # (B,S,FG,hid)
        if bool(cfg.get("USE_TRAJ_EMPTY_MASK", False)):
            feats = jnp.where(empty_mask[..., None, None], 0.0, feats)

        # ---- trajectory box branch (mppnet_head.py:608-633) ----
        tstep = jnp.arange(num_frames, dtype=jnp.float32)[:, None] * 0.1
        box_seq = jnp.concatenate(
            [traj[..., :7],
             jnp.broadcast_to(tstep[None, :, None],
                              (b, num_frames, s, 1))], axis=-1)
        box_seq = box_seq.at[..., 0:3].add(-box_seq[:, 0:1, :, 0:3])
        ry0 = box_seq[:, 0, :, 6] % (2 * np.pi)               # (B, S)
        flat = box_seq.transpose(0, 2, 1, 3).reshape(b * s, num_frames, 8)
        xyz = rotate_points_along_z(flat[..., 0:3], -ry0.reshape(-1))
        flat = flat.at[..., 0:3].set(xyz).at[..., 6].set(0.0)
        box_reg, box_feat = SeqBoxPointNet(
            model_cfg=cfg, code_size=code, name="seqboxembed")(flat, train)

        # ---- grouped transformer (mppnet_head.py:719-744) ----
        pos = None
        if bool(tcfg.get("use_grid_pos", {}).get("enabled", False)):
            gidx = jnp.asarray(
                [[i, j, k] for i in range(grid) for j in range(grid)
                 for k in range(grid)], jnp.float32)
            pos = MLPStack(256, hidden, 2, name="grid_pos_embeded")(gidx)

        hs, tokens = MPPNetTransformer(
            model_cfg=tcfg, grid_size=grid, name="transformer")(
            feats.reshape(b * s, num_frames * g_pts, hidden), pos, train)
        # tokens: (L, B*S, NG, D); hs: (B*S, NG*D)
        layers = tokens.shape[0]

        point_cls = nn.Dense(1, name="class_embed")(
            tokens[:, :, 0])                                  # (L, BS, 1)
        point_reg = []
        for gi in range(num_groups):
            reg_g = MLPStack(int(tcfg["hidden_dim"]), code * self.num_class,
                             4, name=f"bbox_embed_{gi}")(tokens[:, :, gi])
            point_reg.append(reg_g)
        point_reg = jnp.stack(point_reg, 0)                   # (NG,L,BS,code)
        joint_reg = MLPStack(
            int(tcfg["hidden_dim"]), code * self.num_class, 4,
            name="jointembed")(
            jnp.concatenate([hs, box_feat], axis=-1))         # (BS, code)

        rcnn_cls = point_cls[-1].reshape(b, s)
        rcnn_reg = joint_reg.reshape(b, s, code)

        batch["rois"] = rois
        batch["roi_labels"] = roi_labels
        batch["roi_valid"] = roi_valid & ~empty_mask
        batch["mppnet_preds"] = {
            "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
            "point_cls": point_cls.reshape(layers, b, s),
            "point_reg": point_reg.reshape(num_groups, layers, b, s, code),
            "box_reg": box_reg.reshape(b, s, code),
        }
        if train:
            batch["mppnet_targets"] = targets

        # decode for eval (generate_predicted_boxes, mppnet_head.py:962-991)
        anchors = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        dec = coder.decode(rcnn_reg.reshape(-1, code),
                           anchors.reshape(-1, code))
        xyz = rotate_points_along_z(
            dec[:, None, 0:3], rois[..., 6].reshape(-1))[:, 0]
        dec = dec.at[:, 0:3].set(xyz + rois[..., 0:3].reshape(-1, 3))
        dec = dec.at[:, 6].add(rois[..., 6].reshape(-1))
        boxes_out = dec.reshape(b, s, code)
        if pc > 7:
            boxes_out = jnp.concatenate([boxes_out, rois[..., 7:]], axis=-1)
        batch["batch_box_preds"] = boxes_out

        score = jax.nn.sigmoid(rcnn_cls)
        if bool(cfg.get("AVG_STAGE1_SCORE", False)):
            stage1 = targets["roi_scores"] if train else roi_scores0
            stage1 = jnp.clip(stage1, 1e-6, 1.0)
            iou_w = cfg.get("IOU_WEIGHT")
            if iou_w is not None:
                w_car, w_ped = float(iou_w[0]), float(iou_w[1])
                car = roi_labels == 1
                blended = jnp.where(
                    car,
                    score ** w_car * stage1 ** (1.0 - w_car),
                    score ** w_ped * stage1 ** (1.0 - w_ped))
            else:
                blended = jnp.sqrt(score * stage1)
            score = blended
        batch["batch_cls_preds"] = score[..., None]
        batch["cls_preds_normalized"] = True
        batch["batch_roi_labels"] = roi_labels
        return batch


# ---------------------------------------------------------------------------
# losses (mppnet_head.py:801-959)
# ---------------------------------------------------------------------------

def mppnet_loss(out_batch, model_cfg):
    cfg = model_cfg["ROI_HEAD"] if "ROI_HEAD" in model_cfg else model_cfg
    loss_cfg = cfg["LOSS_CONFIG"]
    weights = loss_cfg["LOSS_WEIGHTS"]
    coder = ResidualCoder()
    code = coder.code_size
    preds = out_batch["mppnet_preds"]
    tgt = out_batch["mppnet_targets"]

    rois = tgt["rois"]                                        # (B, S, C)
    b, s = rois.shape[:2]
    gt_src = tgt["gt_of_rois_src"][..., :code]
    reg_valid = tgt["reg_valid_mask"].reshape(-1)
    cls_labels = tgt["rcnn_cls_labels"].reshape(-1)

    # canonical targets (get_box_reg_layer_loss:836-841)
    from .roi_head_template import canonicalize_gt_of_rois

    gt_ct = jax.vmap(canonicalize_gt_of_rois)(
        rois[..., :7], gt_src).reshape(-1, code)
    anchors = jnp.concatenate(
        [jnp.zeros((b * s, 3)), rois[..., 3:6].reshape(-1, 3),
         jnp.zeros((b * s, 1))], axis=-1)
    reg_targets = coder.encode(gt_ct, anchors)
    cw = jnp.asarray(weights["code_weights"], jnp.float32)
    fg = reg_valid.astype(jnp.float32)
    n_fg = jnp.maximum(jnp.sum(fg), 1.0)

    def reg_term(pred_flat):
        l1 = smooth_l1(pred_flat - reg_targets, beta=1.0 / 9.0) * cw[None]
        return jnp.sum(jnp.sum(l1, -1) * fg) / n_fg

    rw = float(weights["rcnn_reg_weight"])
    tw = [float(x) for x in weights.get("traj_reg_weight", (1.0, 1.0, 1.0))]
    loss_reg = reg_term(preds["rcnn_reg"].reshape(-1, code)) * rw * tw[0]
    tb = {"rcnn_loss_reg": loss_reg}

    if bool(cfg.get("USE_AUX_LOSS", False)):
        pr = preds["point_reg"]                               # (NG,L,B,S,c)
        ng, layers = pr.shape[0], pr.shape[1]
        aux = 0.0
        for gi in range(ng):
            for li in range(layers):
                aux = aux + reg_term(pr[gi, li].reshape(-1, code))
        aux = aux / (ng * layers) * rw * tw[2]
        tb["point_loss_reg"] = aux
        loss_reg = loss_reg + aux
        seq = reg_term(preds["box_reg"].reshape(-1, code)) * rw * tw[1]
        tb["seqbox_loss_reg"] = seq
        loss_reg = loss_reg + seq

    if bool(loss_cfg.get("CORNER_LOSS_REGULARIZATION", False)):
        dec = coder.decode(preds["rcnn_reg"].reshape(-1, code), anchors)
        xyz = rotate_points_along_z(
            dec[:, None, 0:3], rois[..., 6].reshape(-1))[:, 0]
        dec = dec.at[:, 0:3].set(xyz + rois[..., 0:3].reshape(-1, 3))
        dec = dec.at[:, 6].add(rois[..., 6].reshape(-1))
        cl = corner_loss_lidar(dec[:, :7], gt_src.reshape(-1, code)[:, :7])
        closs = jnp.sum(cl * fg) / n_fg \
            * float(weights["rcnn_corner_weight"])
        tb["rcnn_loss_corner"] = closs
        loss_reg = loss_reg + closs

    # classification: every encoder layer's token is supervised
    # (get_box_cls_layer_loss:919-959, groups = enc_layers)
    pcls = preds["point_cls"]                                 # (L, B, S)
    layers = pcls.shape[0]
    valid = (cls_labels >= 0).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    loss_cls = 0.0
    for li in range(layers):
        p = jax.nn.sigmoid(pcls[li].reshape(-1))
        bce = -(cls_labels * jnp.log(jnp.clip(p, 1e-7)) +
                (1 - cls_labels) * jnp.log(jnp.clip(1 - p, 1e-7)))
        bce = jnp.where(valid > 0, bce, 0.0)
        loss_cls = loss_cls + jnp.sum(bce) / n_valid
    loss_cls = loss_cls / layers * float(weights["rcnn_cls_weight"])
    tb["rcnn_loss_cls"] = loss_cls

    total = loss_reg + loss_cls
    tb["rcnn_loss"] = total
    return total, tb


# ---------------------------------------------------------------------------
# MPPNet E2E: online streaming with a functional memory bank
# (mppnet_memory_bank_e2e.py:15-580, detectors/mppnet_e2e.py:12-120)
# ---------------------------------------------------------------------------

def transform_boxes_to_current(boxes, pose_pre, pose_cur):
    """Move per-frame boxes (R, C>=9) from pose_pre's frame into
    pose_cur's (waymo_dataset.transform_prebox_to_current, in-graph)."""
    r = boxes.shape[0]
    xyz1 = jnp.concatenate([boxes[:, :3], jnp.ones((r, 1))], axis=-1)
    world = xyz1 @ pose_pre.T
    world = world.at[:, 3].set(1.0)
    cur = world @ jnp.linalg.inv(pose_cur.T)
    out = boxes.at[:, 0:3].set(cur[:, :3])
    v3 = jnp.concatenate([boxes[:, 7:9], jnp.zeros((r, 1))], axis=-1)
    vg = v3 @ pose_pre[:3, :3].T
    vc = vg @ jnp.linalg.inv(pose_cur[:3, :3].T)
    out = out.at[:, 7:9].set(vc[:, :2])
    dyaw = jnp.arctan2(pose_pre[1, 0], pose_pre[0, 0]) \
        - jnp.arctan2(pose_cur[1, 0], pose_cur[0, 0])
    return out.at[:, 6].add(dyaw)


def init_mppnet_memory(rois11, pose, num_frames: int, num_proxy: int,
                       hidden: int):
    """First-frame memory: every roi slot holds the current frame
    (mppnet_e2e.py:46-50), features zeroed (gated off by sample_idx).
    rois11 (B, R, 11); pose (B, 4, 4)."""
    b, r, _ = rois11.shape
    return {
        "rois": jnp.broadcast_to(rois11[:, None],
                                 (b, num_frames, r, rois11.shape[-1])),
        "poses": jnp.broadcast_to(pose[:, None], (b, num_frames, 4, 4)),
        "feature": jnp.zeros((b, num_frames - 1, r, num_proxy, hidden)),
    }


def mppnet_e2e_push_rois(memory, rois11, pose):
    """Pre-head roll: insert the new frame's proposals at slot 0
    (mppnet_e2e.py:52-58)."""
    return dict(
        memory,
        rois=jnp.concatenate(
            [rois11[:, None], memory["rois"][:, :-1]], axis=1),
        poses=jnp.concatenate(
            [pose[:, None], memory["poses"][:, :-1]], axis=1),
    )


def mppnet_e2e_push_feature(memory, feat):
    """Post-head roll: slot 0 becomes the frame just processed
    (mppnet_e2e.py:66-71). feat (B, R, G, D)."""
    return dict(
        memory,
        feature=jnp.concatenate(
            [feat[:, None], memory["feature"][:, :-1]], axis=1),
    )


class MPPNetHeadE2E(nn.Module):
    """Streaming MPPNet: one frame of points per step, past frames served
    from the feature memory. Weight-compatible with MPPNetHead (same
    submodule names) so offline-trained checkpoints drop in.

    Batch keys: `memory_rois` (B, F, R, 11) per-frame-coords proposals
    (slot 0 = current), `poses` (B, F, 4, 4), `memory_feature`
    (B, F-1, R, G, D), `sample_idx` (B,) int — frames seen so far;
    `points`/`points_mask` hold ONLY the current sweep set. Inference
    only — training uses the offline MPPNetHead (the reference E2E
    detector trains just its RPN, mppnet_e2e.py:88-99)."""

    model_cfg: Any
    point_cloud_range: tuple = ()
    voxel_size: tuple = ()
    num_class: int = 1

    @nn.compact
    def __call__(self, batch, train: bool):
        assert not train, "MPPNetHeadE2E is inference-only"
        cfg = self.model_cfg
        tcfg = cfg["Transformer"]
        num_frames = int(tcfg["num_frames"])
        num_groups = int(tcfg["num_groups"])
        p_pts = int(tcfg["num_lidar_points"])
        g_pts = int(tcfg["num_proxy_points"])
        grid = int(cfg["ROI_GRID_POOL"]["GRID_SIZE"])
        hidden = int(cfg["TRANS_INPUT"])
        coder = ResidualCoder()
        code = coder.code_size

        mem_rois = batch["memory_rois"]                       # (B,F,R,11)
        poses = batch["poses"]
        b, f, r, _ = mem_rois.shape
        assert f == num_frames

        # memory frames -> current coordinates (mppnet_e2e forward:24-33)
        def to_cur(rois_f, poses_f):
            return jnp.stack([
                transform_boxes_to_current(
                    rois_f[i, :, :9], poses_f[i], poses_f[0])
                for i in range(num_frames)], 0)

        proposals = jax.vmap(to_cur)(mem_rois, poses)         # (B,F,R,9)
        prop_valid = jnp.abs(proposals[..., :6]).sum(-1) > 0
        traj, valid_len, assign = jax.vmap(generate_trajectory)(
            proposals, prop_valid)

        rois = traj[:, 0]
        roi_scores0 = mem_rois[:, 0, :, 9]
        roi_labels = mem_rois[:, 0, :, 10].astype(jnp.int32)
        empty_mask = jnp.abs(rois[..., :6]).sum(-1) <= 0

        # current-frame crop + geometry features only (the bank serves
        # the rest; mppnet_memory_bank_e2e.py forward:88-108)
        pts = batch["points"]
        pmask = batch["points_mask"]
        feat_dim = pts.shape[-1] - 1 \
            if not bool(cfg.get("USE_TIMESTAMP", False)) else pts.shape[-1]
        crop, crop_valid = jax.vmap(
            lambda p, m, bx: crop_points_to_rois(p, m, bx, p_pts)
        )(pts, pmask, rois[..., :7])
        crop = crop[..., :feat_dim]                           # (B,R,P,C)

        anchor9 = box_anchor_points(traj[..., :7])            # (B,F,R,9,3)
        anchor9 = anchor9.transpose(0, 2, 1, 3, 4)            # (B,R,F,9,3)
        diag = jnp.linalg.norm(
            traj[..., 3:6], axis=-1).transpose(0, 2, 1)       # (B,R,F)
        sph = spherical_offsets(crop[..., :3], anchor9[:, :, 0],
                                diag[:, :, 0])                # (B,R,P,27)
        geo_in = jnp.concatenate([sph, crop[..., 3:]], axis=-1)
        num_radius = len(cfg["ROI_GRID_POOL"]["POOL_RADIUS"])
        geo = MLPStack(64, hidden // num_radius, 3,
                       name="up_dimension_geometry")(geo_in)

        proxies = proxy_grid_points(
            traj[..., :7].transpose(0, 2, 1, 3), grid)        # (B,R,F,G,3)
        sa = SALayer(
            mlps=tuple(tuple(m) for m in cfg["ROI_GRID_POOL"]["MLPS"]),
            radii=tuple(float(x) for x in
                        cfg["ROI_GRID_POOL"]["POOL_RADIUS"]),
            nsamples=tuple(int(x) for x in cfg["ROI_GRID_POOL"]["NSAMPLE"]),
            name="roi_grid_pool")
        br = b * r
        cur_feat = sa(
            proxies[:, :, 0].reshape(br, g_pts, 3),
            jnp.ones((br, g_pts), bool),
            crop[..., :3].reshape(br, p_pts, 3),
            crop_valid.reshape(br, p_pts),
            geo.reshape(br, p_pts, -1), train)
        cur_feat = cur_feat.reshape(b, r, g_pts, hidden)      # (B,R,G,D)
        batch["geometry_feature_memory"] = cur_feat

        # assemble per-trajectory-frame geometry from the bank
        sample_idx = batch["sample_idx"].astype(jnp.int32)    # (B,)
        bank = batch["memory_feature"]                        # (B,F-1,R,G,D)
        frames = [cur_feat]
        for i in range(1, num_frames):
            gathered = jnp.take_along_axis(
                bank[:, i - 1], assign[:, i, :, None, None], axis=1)
            usable = valid_len[:, i] \
                & (sample_idx[:, None] >= i)                  # (B, R)
            frames.append(jnp.where(
                usable[..., None, None], gathered, cur_feat))
        geo_feat = jnp.stack(frames, axis=2)                  # (B,R,F,G,D)
        geo_feat = geo_feat.reshape(b, r, num_frames * g_pts, hidden)

        # motion + trajectory-box branches (same as offline head)
        prox_flat = proxies.reshape(b, r, num_frames * g_pts, 3)
        sph_m = spherical_offsets(
            prox_flat, anchor9[:, :, 0], diag[:, :, 0])
        tstamp = jnp.repeat(
            jnp.arange(num_frames, dtype=jnp.float32) * 0.1, g_pts)
        tfeat = jnp.broadcast_to(
            tstamp[None, None, :, None], (b, r, num_frames * g_pts, 1))
        zeros2 = jnp.zeros((b, r, num_frames * g_pts, 2), jnp.float32)
        motion = MLPStack(64, hidden, 3, name="up_dimension_motion")(
            jnp.concatenate([sph_m, zeros2, tfeat], axis=-1))

        feats = geo_feat + motion
        if bool(cfg.get("USE_TRAJ_EMPTY_MASK", False)):
            feats = jnp.where(empty_mask[..., None, None], 0.0, feats)

        tstep = jnp.arange(num_frames, dtype=jnp.float32)[:, None] * 0.1
        box_seq = jnp.concatenate(
            [traj[..., :7],
             jnp.broadcast_to(tstep[None, :, None],
                              (b, num_frames, r, 1))], axis=-1)
        box_seq = box_seq.at[..., 0:3].add(-box_seq[:, 0:1, :, 0:3])
        ry0 = box_seq[:, 0, :, 6] % (2 * np.pi)
        flat = box_seq.transpose(0, 2, 1, 3).reshape(b * r, num_frames, 8)
        xyz = rotate_points_along_z(flat[..., 0:3], -ry0.reshape(-1))
        flat = flat.at[..., 0:3].set(xyz).at[..., 6].set(0.0)
        box_reg, box_feat = SeqBoxPointNet(
            model_cfg=cfg, code_size=code, name="seqboxembed")(flat, train)

        pos = None
        if bool(tcfg.get("use_grid_pos", {}).get("enabled", False)):
            gidx = jnp.asarray(
                [[i, j, k] for i in range(grid) for j in range(grid)
                 for k in range(grid)], jnp.float32)
            pos = MLPStack(256, hidden, 2, name="grid_pos_embeded")(gidx)

        hs, tokens = MPPNetTransformer(
            model_cfg=tcfg, grid_size=grid, name="transformer")(
            feats.reshape(b * r, num_frames * g_pts, hidden), pos, train)

        point_cls = nn.Dense(1, name="class_embed")(tokens[:, :, 0])
        for gi in range(num_groups):
            # materialize bbox_embed params for checkpoint compatibility
            MLPStack(int(tcfg["hidden_dim"]), code * self.num_class, 4,
                     name=f"bbox_embed_{gi}")(tokens[:, :, gi])
        joint_reg = MLPStack(
            int(tcfg["hidden_dim"]), code * self.num_class, 4,
            name="jointembed")(
            jnp.concatenate([hs, box_feat], axis=-1))

        rcnn_cls = point_cls[-1].reshape(b, r)
        rcnn_reg = joint_reg.reshape(b, r, code)

        anchors = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        dec = coder.decode(rcnn_reg.reshape(-1, code),
                           anchors.reshape(-1, code))
        xyz = rotate_points_along_z(
            dec[:, None, 0:3], rois[..., 6].reshape(-1))[:, 0]
        dec = dec.at[:, 0:3].set(xyz + rois[..., 0:3].reshape(-1, 3))
        dec = dec.at[:, 6].add(rois[..., 6].reshape(-1))
        boxes_out = dec.reshape(b, r, code)
        boxes_out = jnp.concatenate([boxes_out, rois[..., 7:9]], axis=-1)
        batch["batch_box_preds"] = boxes_out

        score = jax.nn.sigmoid(rcnn_cls)
        if bool(cfg.get("AVG_STAGE1_SCORE", False)):
            stage1 = jnp.clip(roi_scores0, 1e-6, 1.0)
            iou_w = cfg.get("IOU_WEIGHT")
            if iou_w is not None:
                w_car, w_ped = float(iou_w[0]), float(iou_w[1])
                car = roi_labels == 1
                score = jnp.where(
                    car,
                    score ** w_car * stage1 ** (1.0 - w_car),
                    score ** w_ped * stage1 ** (1.0 - w_ped))
            else:
                score = jnp.sqrt(score * stage1)
        batch["batch_cls_preds"] = score[..., None]
        batch["cls_preds_normalized"] = True
        batch["batch_roi_labels"] = roi_labels
        batch["roi_valid"] = prop_valid[:, 0] & ~empty_mask
        batch["mppnet_preds"] = {"rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg}
        return batch
