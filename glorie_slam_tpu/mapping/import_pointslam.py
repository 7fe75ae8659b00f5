"""Import the pretrained Point-SLAM geometry decoder (middle_fine.pt).

Reference src/mapper.py:105-121: the torch checkpoint's ``model`` dict is
filtered to decoder keys, 'coarse'-prefixed entries are renamed and loaded
into the geometry decoder with strict=False. This importer reproduces that
best-effort merge into the flax MLPGeometry parameter tree (linear weights
transposed (out,in) -> (in,out)); keys that don't exist or mismatch in shape
are skipped, like strict=False.
"""

from typing import Dict

import numpy as np


def _strip_decoder_keys(model_state: Dict[str, np.ndarray]):
    middle, fine = {}, {}
    for key, val in model_state.items():
        if "decoder" in key and "encoder" not in key:
            if "coarse" in key:
                middle[key[15:]] = np.asarray(val)
            elif "fine" in key:
                fine[key[13:]] = np.asarray(val)
    return middle, fine


def _assign(params, path, value):
    node = params
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        return False
    if node[leaf].shape != value.shape:
        return False
    node[leaf] = value
    return True


def merge_geo_decoder(dec_params: dict, middle: Dict[str, np.ndarray]):
    """Merge torch MLP_geometry weights into flax params['geo_decoder']."""
    import jax

    out = jax.tree_util.tree_map(np.asarray, dec_params)
    geo = out["geo_decoder"]
    n_loaded = 0
    for key, val in middle.items():
        parts = key.split(".")
        if parts[0] == "pts_linears" and len(parts) == 3:
            name = f"pts_linears_{parts[1]}"
            if parts[2] == "weight":
                n_loaded += _assign(geo, (name, "kernel"), val.T)
            else:
                n_loaded += _assign(geo, (name, "bias"), val)
        elif parts[0] == "fc_c" and len(parts) == 3:
            name = f"fc_c_{parts[1]}"
            if parts[2] == "weight":
                n_loaded += _assign(geo, (name, "kernel"), val.T)
            else:
                n_loaded += _assign(geo, (name, "bias"), val)
        elif parts[0] == "output_linear":
            if parts[1] == "weight":
                n_loaded += _assign(geo, ("output_linear", "kernel"), val.T)
            else:
                n_loaded += _assign(geo, ("output_linear", "bias"), val)
        elif parts[0] == "embedder" and parts[-1] == "_B":
            n_loaded += _assign(geo, ("embedder", "B"), val)
        # anything else: skipped (strict=False semantics)
    return out, n_loaded


def load_pointslam_geo_decoder(path: str, dec_params: dict) -> dict:
    """Load middle_fine.pt via torch CPU and merge the geo decoder."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.numpy() for k, v in ckpt["model"].items()}
    middle, _fine = _strip_decoder_keys(state)
    merged, n = merge_geo_decoder(dec_params, middle)
    return merged
