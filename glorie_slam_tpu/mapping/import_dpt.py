"""Importer for the omnidata DPT checkpoint (omnidata_dpt_depth_v2.ckpt).

The torch checkpoint (reference mono_estimators.py:17-31 strips a leading
``model.`` from every ``state_dict`` key) stores the timm
``vit_base_r50_s16_384`` hybrid backbone + MiDaS scratch/refinenet/head
state. Every key family is mapped onto the flax DPTDepthModel tree:

  pretrained.model.patch_embed.backbone.*  -> backbone/ (ResNetV2 stem+stages)
  pretrained.model.{cls_token,pos_embed,blocks.*,norm,patch_embed.proj}
                                           -> ViT params (pos_embed bilinearly
                                              resized to the inference grid,
                                              like vit.py:102-116)
  pretrained.act_postprocess{3,4}.*        -> reassemble{3,4}_* layers
  scratch.layer{1..4}_rn / refinenet{1..4} / output_conv
                                           -> layer*_rn / refinenet*/ head_*

``load_omnidata_checkpoint`` raises on any unmapped checkpoint tensor or any
shape mismatch; tests/test_parity_dpt.py asserts activation-level agreement
with the reference torch model end-to-end.
"""

import re

import numpy as np


def _resize_pos_embed(pos, target_len, dim):
    """timm-style bilinear pos-embed resize (vit.py:102-116,
    F.interpolate bilinear, align_corners=False, no antialias)."""
    cls, grid = pos[:, :1], pos[:, 1:]
    n = grid.shape[1]
    side = int(round(n ** 0.5))
    tside = int(round((target_len - 1) ** 0.5))
    if side * side != n or tside * tside != target_len - 1:
        return None
    import jax

    g = grid.reshape(1, side, side, dim)
    g = np.asarray(jax.image.resize(g, (1, tside, tside, dim), "bilinear",
                                    antialias=False))
    return np.concatenate([cls, g.reshape(1, tside * tside, dim)], 1)


_HEAD_IDX = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}


def _map_key(k):
    """torch state-dict key -> (flax param path, kind).

    kind: 'conv' (OIHW->HWIO), 'linear' (transpose), 'raw' (as-is),
    'pos' (pos_embed resize), None (unmappable -> error).
    """
    parts = k.split(".")

    if parts[0] == "pretrained":
        if parts[1] == "model":
            rest = parts[2:]
            if rest[0] == "patch_embed":
                if rest[1] == "proj":
                    return (("patch_embed",
                             "kernel" if rest[2] == "weight" else "bias"),
                            "conv" if rest[2] == "weight" else "raw")
                if rest[1] == "backbone":
                    bb = rest[2:]
                    if bb[0] == "stem":
                        if bb[1] == "conv":
                            return (("backbone", "stem_conv", "kernel_raw"),
                                    "conv")
                        if bb[1] == "norm":
                            return (("backbone", "stem_norm", "gn",
                                     "scale" if bb[2] == "weight" else "bias"),
                                    "raw")
                    if bb[0] == "stages":
                        s, b = bb[1], bb[3]          # stages.S.blocks.B
                        mod = ("backbone", f"stage{s}_{b}")
                        leaf = bb[4]
                        if leaf in ("conv1", "conv2", "conv3"):
                            return (mod + (leaf, "kernel_raw"), "conv")
                        if leaf in ("norm1", "norm2"):
                            return (mod + (leaf, "gn",
                                    "scale" if bb[5] == "weight" else "bias"),
                                    "raw")
                        if leaf == "norm3":
                            return (mod + ("norm3",
                                    "scale" if bb[5] == "weight" else "bias"),
                                    "raw")
                        if leaf == "downsample":
                            if bb[5] == "conv":
                                return (mod + ("downsample_conv",
                                               "kernel_raw"), "conv")
                            if bb[5] == "norm":
                                return (mod + ("downsample_norm",
                                    "scale" if bb[6] == "weight" else "bias"),
                                    "raw")
                    return None, None
            if rest[0] == "cls_token":
                return (("cls_token",), "raw")
            if rest[0] == "pos_embed":
                return (("pos_embed",), "pos")
            if rest[0] == "blocks":
                bi, sub = rest[1], rest[2:]
                base = (f"block_{bi}",)
                if sub[0] in ("norm1", "norm2"):
                    return (base + (sub[0],
                            "scale" if sub[1] == "weight" else "bias"), "raw")
                if sub[0] == "attn" and sub[1] in ("qkv", "proj"):
                    return (base + ("attn", sub[1],
                            "kernel" if sub[2] == "weight" else "bias"),
                            "linear" if sub[2] == "weight" else "raw")
                if sub[0] == "mlp":
                    name = "mlp_fc1" if sub[1] == "fc1" else "mlp_fc2"
                    return (base + (name,
                            "kernel" if sub[2] == "weight" else "bias"),
                            "linear" if sub[2] == "weight" else "raw")
                return None, None
            if rest[0] == "norm":
                return (("norm",
                         "scale" if rest[1] == "weight" else "bias"), "raw")
            return None, None
        # act_postprocess: 3/4 carry params ('project' readout + convs);
        # 1/2 are Identity in the hybrid (vit.py:424-429)
        m = re.match(r"act_postprocess([34])$", parts[1])
        if m:
            lvl, idx = m.group(1), parts[2]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            if idx == "0":                    # ProjectReadout .project.0
                return ((f"reassemble{lvl}_readout", leaf),
                        "linear" if leaf == "kernel" else "raw")
            if idx == "3":
                return ((f"reassemble{lvl}_proj", leaf),
                        "conv" if leaf == "kernel" else "raw")
            if idx == "4" and lvl == "4":
                return ((f"reassemble4_down", leaf),
                        "conv" if leaf == "kernel" else "raw")
        return None, None

    if parts[0] == "scratch":
        m = re.match(r"layer([1-4])_rn", parts[1])
        if m:
            return ((parts[1], "kernel"), "conv")
        m = re.match(r"refinenet([1-4])", parts[1])
        if m:
            rn = parts[1]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            kind = "conv" if leaf == "kernel" else "raw"
            if parts[2] == "out_conv":
                return ((rn, "out_conv", leaf), kind)
            m2 = re.match(r"resConfUnit([12])", parts[2])
            if m2:
                return ((rn, f"rcu{m2.group(1)}", parts[3], leaf), kind)
        if parts[1] == "output_conv":
            name = _HEAD_IDX.get(parts[2])
            if name:
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                return ((name, leaf),
                        "conv" if leaf == "kernel" else "raw")
        return None, None

    return None, None


def convert_state(state, params):
    """Map a (prefix-stripped) torch state dict onto an initialized flax
    param tree (in place on numpy copies). Returns (params, report)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    p = params["params"]
    report = {"loaded": 0, "unmapped": [], "mismatched": []}

    for k, v in state.items():
        v = np.asarray(v)
        path, kind = _map_key(k)
        if path is None:
            report["unmapped"].append(k)
            continue
        if kind == "pos":
            target = p.get("pos_embed")
            r = _resize_pos_embed(v, target.shape[1], v.shape[-1])
            if r is None or r.shape != target.shape:
                report["mismatched"].append(k)
                continue
            p["pos_embed"] = r.astype(np.float32)
            report["loaded"] += 1
            continue
        if kind == "conv":
            v = np.transpose(v, (2, 3, 1, 0))
        elif kind == "linear" and v.ndim == 2:
            v = v.T
        node = p
        ok = True
        for key in path[:-1]:
            if key not in node:
                ok = False
                break
            node = node[key]
        if not ok or path[-1] not in node:
            report["unmapped"].append(k)
            continue
        if node[path[-1]].shape != v.shape:
            report["mismatched"].append((k, node[path[-1]].shape, v.shape))
            continue
        node[path[-1]] = v.astype(np.float32)
        report["loaded"] += 1

    return params, report


def load_omnidata_checkpoint(path, model, infer_size=512, strict=True):
    """Load and convert the omnidata DPT checkpoint for `model` at
    ``infer_size`` x ``infer_size`` inference. With strict (default), any
    unmapped or shape-mismatched tensor raises."""
    import jax
    import jax.numpy as jnp
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in raw:
        # reference strips the first 6 chars ("model.") of every key
        state = {k[6:] if k.startswith("model.") else k: np.asarray(v)
                 for k, v in raw["state_dict"].items()}
    else:
        state = {k: np.asarray(v) for k, v in raw.items()}

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, infer_size, infer_size, 3))
    )
    params, report = convert_state(state, params)
    if strict and (report["unmapped"] or report["mismatched"]):
        raise ValueError(
            f"DPT import failed: unmapped={report['unmapped'][:8]} "
            f"mismatched={report['mismatched'][:8]} "
            f"(+{max(0, len(report['unmapped']) + len(report['mismatched']) - 8)} more)"
        )
    print(f"[dpt-import] loaded {report['loaded']} tensors "
          f"({len(report['unmapped'])} unmapped, "
          f"{len(report['mismatched'])} mismatched)")
    return jax.tree_util.tree_map(jnp.asarray, params)
