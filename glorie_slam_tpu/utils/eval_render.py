"""Rendering evaluation: PSNR / MS-SSIM / LPIPS on re-rendered frames.

Rebuild of reference src/utils/eval_render.py:18-247 (eval_kf_imgs /
eval_imgs, monkey-patched onto Mapper at mapper.py:858-859): every keyframe
(and every Nth frame along the full trajectory) is re-rendered with the
proxy depth; masked + unmasked metrics are written to
``{output}/logs/metrics_render_*.txt`` and per-frame depth/color .npy dumps
feed the TSDF meshing stage.
"""

import os
import shutil
import traceback

import numpy as np

from . import image_metrics


def _metrics(gt_color, color):
    p = image_metrics.psnr(gt_color, color)
    s = image_metrics.ms_ssim(gt_color, color)
    l = image_metrics.lpips(gt_color, color)
    return p, s, l


def eval_kf_imgs(mapper, suffix=""):
    """Re-render every mapped keyframe and score it
    (reference eval_render.py:18-125)."""
    printer = mapper.printer
    printer.print("Starting re-rendering keyframes...", subsystem="eval")
    out = mapper.output
    render_dir = f"{out}/rendered_every_keyframe{suffix}"
    if os.path.exists(render_dir):
        shutil.rmtree(render_dir)
    os.makedirs(render_dir, exist_ok=True)
    os.makedirs(f"{out}/rerendered_keyframe_image", exist_ok=True)

    sums = dict(psnr=0.0, ssim=0.0, lpips=0.0,
                m_psnr=0.0, m_ssim=0.0, m_lpips=0.0)
    cnt = 0
    lpips_available = True
    try:
        for kf in mapper.keyframe_dict:
            idx, video_idx = kf["idx"], kf["video_idx"]
            _, gt_color, gt_depth, _ = mapper.frame_reader[idx]
            mono = kf.get("mono_depth")
            ret = mapper.render_keyframe_img(
                video_idx, idx,
                mono_depth=mono if mono is not None else None,
            )
            if ret is None:
                continue
            depth, color, render_depth = ret
            gt_color = np.asarray(gt_color)

            try:
                import cv2

                img = (np.clip(color, 0, 1) * 255).astype(np.uint8)
                cv2.imwrite(
                    f"{out}/rerendered_keyframe_image/frame_{idx:05d}.png",
                    img[..., ::-1],
                )
            except ImportError:
                pass

            p, s, l = _metrics(gt_color, np.clip(color, 0, 1))
            sums["psnr"] += p
            sums["ssim"] += s
            if l is None:
                lpips_available = False
            else:
                sums["lpips"] += l

            mask = (render_depth > 0)
            if gt_depth is not None:
                mask = mask & (np.asarray(gt_depth) > 0)
            depth_m = np.where(mask, depth, 0.0)
            gt_m = np.where(mask[..., None], gt_color, 0.0)
            col_m = np.where(mask[..., None], np.clip(color, 0, 1), 0.0)
            np.save(f"{render_dir}/depth_{idx:05d}", depth_m)
            np.save(f"{render_dir}/color_{idx:05d}", col_m)

            mp, ms_, ml = _metrics(gt_m, col_m)
            sums["m_psnr"] += mp
            sums["m_ssim"] += ms_
            if ml is not None:
                sums["m_lpips"] += ml
            cnt += 1

        if cnt == 0:
            printer.print("No keyframes to render.", subsystem="eval")
            return
        # LPIPS provenance: 'untrained' numbers are NOT comparable to the
        # reference's published LPIPS (reference eval_render.py:27-28 loads
        # pretrained torchmetrics alex weights unconditionally)
        lines = [f"lpips_variant: {image_metrics.lpips_variant()}"
                 if lpips_available else "lpips_variant: unavailable"]
        for key, label in [("m_ssim", "avg_masked_ssim"),
                           ("m_psnr", "avg_masked_psnr"),
                           ("m_lpips", "avg_masked_lpips"),
                           ("ssim", "avg_ssim"), ("psnr", "avg_psnr"),
                           ("lpips", "avg_lpips")]:
            if "lpips" in key and not lpips_available:
                lines.append(f"{label}: n/a (LPIPS unavailable)")
            else:
                lines.append(f"{label}: {sums[key] / cnt}")
                printer.print(f"{label}: {sums[key] / cnt:.4f}",
                              subsystem="eval")
        with open(f"{out}/logs/metrics_render_kf{suffix}.txt", "w+") as fp:
            fp.write("\n".join(lines) + "\n")
    except Exception as e:  # noqa: BLE001 (eval is best-effort, slam.py:176)
        traceback.print_exception(e)
        printer.print("Rerendering frames failed.", subsystem="error")
    printer.print(f"Finished rendering {cnt} frames.", subsystem="eval")


def eval_imgs(mapper, every_n=None):
    """Re-render every Nth frame along the FULL trajectory
    (reference eval_render.py:126-247): non-keyframe poses come from the
    trajectory filler results stored by SLAM.terminate."""
    printer = mapper.printer
    out = mapper.output
    every_n = every_n or mapper.cfg["mapping"]["every_frame"]
    full_poses_path = f"{out}/traj/full_traj_w2c.npy"
    if not os.path.exists(full_poses_path):
        printer.print("Full trajectory unavailable; skipping eval_imgs.",
                      subsystem="eval")
        return
    import jax.numpy as jnp

    from ..geom import lie
    from ..mapping.renderer import render_img

    w2c = np.load(full_poses_path)
    render_dir = f"{out}/rendered_every_frame"
    if os.path.exists(render_dir):
        shutil.rmtree(render_dir)
    os.makedirs(render_dir, exist_ok=True)

    sums = dict(psnr=0.0, ssim=0.0)
    cnt = 0
    try:
        for idx in range(0, len(mapper.frame_reader), every_n):
            _, gt_color, gt_depth, _ = mapper.frame_reader[idx]
            c2w = np.array(
                lie.to_matrix(lie.inv(jnp.asarray(w2c[idx])))
            )
            c2w[:3, 1:3] *= -1
            # proxy depth from the splatted cloud + mono completion
            mono = mapper._load_mono(idx)
            proxy = mapper.npc.get_proxy_render_depth(
                jnp.asarray(c2w), jnp.zeros((mapper.H, mapper.W)),
                jnp.asarray(mono) if mono is not None else None,
                use_mono_to_complete=mapper.use_mono_to_complete,
            )
            depth, var, color, mask, count = render_img(
                mapper.rcfg, mapper.decoders,
                {"params": mapper.dec_params}, jnp.asarray(c2w),
                mapper.H, mapper.W, mapper.fx, mapper.fy, mapper.cx,
                mapper.cy, proxy, mapper.npc.cloud_pos,
                jnp.asarray(mapper.npc.count), mapper.npc.geo_feats,
                mapper.npc.col_feats, None, stage="color",
            )
            gt_color = np.asarray(gt_color)
            p = image_metrics.psnr(gt_color, np.clip(color, 0, 1))
            s = image_metrics.ms_ssim(gt_color, np.clip(color, 0, 1))
            sums["psnr"] += p
            sums["ssim"] += s
            np.save(f"{render_dir}/depth_{idx:05d}", depth)
            np.save(f"{render_dir}/color_{idx:05d}", np.clip(color, 0, 1))
            cnt += 1
        if cnt:
            with open(f"{out}/logs/metrics_render_full.txt", "w+") as fp:
                fp.write(f"avg_psnr: {sums['psnr'] / cnt}\n")
                fp.write(f"avg_ssim: {sums['ssim'] / cnt}\n")
            printer.print(
                f"full-traj render: avg_psnr {sums['psnr'] / cnt:.3f} "
                f"({cnt} frames)", subsystem="eval",
            )
    except Exception as e:  # noqa: BLE001
        traceback.print_exception(e)
        printer.print("Full-trajectory rendering failed.",
                      subsystem="error")
