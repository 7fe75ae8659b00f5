"""Best-effort importer for the omnidata DPT checkpoint.

The torch checkpoint (omnidata_dpt_depth_v2.ckpt, reference
mono_estimators.py:17-31) stores a timm ViT-hybrid + MiDaS scratch state
dict. This maps the key families onto the flax DPTDepthModel tree; keys
without a correspondent (or with mismatched shapes, e.g. pos_embed at a
different inference size — which is bilinearly resized like timm does) are
reported, not fatal.
"""

import numpy as np


def _resize_pos_embed(pos, target_len, dim):
    """timm-style bilinear pos-embed resize (vit.py _resize_pos_embed)."""
    cls, grid = pos[:, :1], pos[:, 1:]
    n = grid.shape[1]
    side = int(round(n ** 0.5))
    tside = int(round((target_len - 1) ** 0.5))
    if side * side != n or tside * tside != target_len - 1:
        return None
    import jax

    g = grid.reshape(1, side, side, dim)
    g = np.asarray(jax.image.resize(g, (1, tside, tside, dim), "bilinear"))
    return np.concatenate([cls, g.reshape(1, tside * tside, dim)], 1)


def load_omnidata_checkpoint(path, model, infer_size=512):
    """Load and convert; falls back to random init for unmapped params."""
    import jax
    import jax.numpy as jnp
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw.get("model", raw))
    state = {k.replace("module.", ""): np.asarray(v)
             for k, v in state.items()}

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, infer_size, infer_size, 3))
    )
    params = jax.tree_util.tree_map(np.asarray, params)
    p = params["params"]
    n_loaded, n_missed = 0, 0

    def put(node_path, value, transpose_linear=False, conv=False):
        nonlocal n_loaded, n_missed
        node = p
        for key in node_path[:-1]:
            if key not in node:
                n_missed += 1
                return
            node = node[key]
        leaf = node_path[-1]
        if leaf not in node:
            n_missed += 1
            return
        if conv:
            value = np.transpose(value, (2, 3, 1, 0))
        elif transpose_linear and value.ndim == 2:
            value = value.T
        if node[leaf].shape != value.shape:
            n_missed += 1
            return
        node[leaf] = value.astype(np.float32)
        n_loaded += 1

    for k, v in state.items():
        parts = k.split(".")
        # transformer blocks
        if parts[0] == "pretrained" and "blocks" in k:
            bi = int(parts[parts.index("blocks") + 1])
            rest = parts[parts.index("blocks") + 2:]
            base = ("block_" + str(bi),)
            if rest[0] in ("norm1", "norm2"):
                put(base + (rest[0], "scale" if rest[1] == "weight"
                            else "bias"), v)
            elif rest[0] == "attn" and rest[1] == "qkv":
                put(base + ("attn", "qkv",
                            "kernel" if rest[2] == "weight" else "bias"),
                    v, transpose_linear=True)
            elif rest[0] == "attn" and rest[1] == "proj":
                put(base + ("attn", "proj",
                            "kernel" if rest[2] == "weight" else "bias"),
                    v, transpose_linear=True)
            elif rest[0] == "mlp":
                name = "mlp_fc1" if rest[1] == "fc1" else "mlp_fc2"
                put(base + (name,
                            "kernel" if rest[2] == "weight" else "bias"),
                    v, transpose_linear=True)
        elif k.endswith("pos_embed"):
            target = p.get("pos_embed")
            if target is not None:
                r = _resize_pos_embed(v, target.shape[1], v.shape[-1])
                if r is not None and r.shape == target.shape:
                    p["pos_embed"] = r.astype(np.float32)
                    n_loaded += 1
        elif k.endswith("cls_token"):
            put(("cls_token",), v)
        # remaining families (resnet stem, scratch/refinenets, head) are
        # matched by shape-compatible name heuristics in future rounds;
        # count them as missed for now
        else:
            n_missed += 1

    print(f"[dpt-import] loaded {n_loaded} tensors, "
          f"{n_missed} unmapped (best-effort)")
    return jax.tree_util.tree_map(jnp.asarray, params)
