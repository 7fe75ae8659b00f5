"""Import the pretrained DROID tracker checkpoint (droid.pth) into flax.

The reference loads a torch state dict, strips the DataParallel 'module.'
prefix, and slices the delta/weight heads to their first 2 output channels
(reference src/slam.py:70-81). This module reproduces that surgery and maps
each torch parameter onto the flax module tree of
``glorie_slam_tpu.nets.droid_net.DroidNet`` (OIHW conv kernels -> HWIO).

``params_to_torch_state`` is the exact inverse, used to round-trip-test the
mapping without the real checkpoint on disk.
"""

from typing import Dict

import numpy as np


def _mapping() -> Dict[str, tuple]:
    """torch key prefix -> flax param path (tuple of tree keys)."""
    m = {}
    for enc in ("fnet", "cnet"):
        m[f"{enc}.conv1"] = (enc, "conv1")
        m[f"{enc}.conv2"] = (enc, "conv2")
        for layer in (1, 2, 3):
            for blk in (0, 1):
                base = f"{enc}.layer{layer}.{blk}"
                path = (enc, f"layer{layer}_{blk}")
                m[f"{base}.conv1"] = path + ("conv1",)
                m[f"{base}.conv2"] = path + ("conv2",)
                # downsample = Sequential(Conv, norm); only present stride>1
                m[f"{base}.downsample.0"] = path + ("downsample",)
    # update module: Sequential indices skip ReLU/GradClip/activation layers
    u = "update"
    m[f"{u}.corr_encoder.0"] = (u, "corr_enc_1")
    m[f"{u}.corr_encoder.2"] = (u, "corr_enc_2")
    m[f"{u}.flow_encoder.0"] = (u, "flow_enc_1")
    m[f"{u}.flow_encoder.2"] = (u, "flow_enc_2")
    m[f"{u}.weight.2"] = (u, "weight_2")
    m[f"{u}.delta.2"] = (u, "delta_2")
    for g in ("convq", "w", "convq_glo"):
        m[f"{u}.gru.{g}"] = (u, "gru", g)
    m[f"{u}.agg.conv1"] = (u, "agg", "conv1")
    m[f"{u}.agg.conv2"] = (u, "agg", "conv2")
    m[f"{u}.agg.eta.0"] = (u, "agg", "eta")
    m[f"{u}.agg.upmask.0"] = (u, "agg", "upmask")
    return m


def _fused_mapping() -> Dict[tuple, tuple]:
    """flax fused-conv path -> ordered torch key prefixes concatenated along
    the OUTPUT channel dim (the flax modules run the reference's sibling
    convs as one double-width conv; see droid_net.ConvGRU / UpdateModule)."""
    u = "update"
    return {
        (u, "gru", "convzr"): (f"{u}.gru.convz", f"{u}.gru.convr"),
        (u, "gru", "convzr_glo"): (f"{u}.gru.convz_glo",
                                   f"{u}.gru.convr_glo"),
        (u, "dw_1"): (f"{u}.delta.0", f"{u}.weight.0"),
    }


def torch_state_to_params(state: Dict[str, np.ndarray]) -> dict:
    """Convert a (numpy-valued) torch state dict to a flax params tree.

    Applies the reference's head-slice surgery (slam.py:75-78): only the
    first 2 output channels of update.weight.2 / update.delta.2 are kept.
    """
    state = {k.replace("module.", ""): np.asarray(v) for k, v in state.items()}
    for head in ("update.weight.2", "update.delta.2"):
        if f"{head}.weight" in state and state[f"{head}.weight"].shape[0] > 2:
            state[f"{head}.weight"] = state[f"{head}.weight"][:2]
            state[f"{head}.bias"] = state[f"{head}.bias"][:2]

    params: dict = {}
    mapping = _mapping()
    used = set()
    for prefix, path in mapping.items():
        wkey, bkey = f"{prefix}.weight", f"{prefix}.bias"
        if wkey not in state:
            continue
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(path[-1], {})
        # torch conv kernel OIHW -> flax HWIO
        leaf["kernel"] = np.transpose(state[wkey], (2, 3, 1, 0)).astype(
            np.float32
        )
        used.add(wkey)
        if bkey in state:
            leaf["bias"] = state[bkey].astype(np.float32)
            used.add(bkey)

    # fused double-width convs: concatenate the torch siblings along O
    for path, prefixes in _fused_mapping().items():
        wkeys = [f"{p}.weight" for p in prefixes]
        if any(k not in state for k in wkeys):
            continue
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(path[-1], {})
        leaf["kernel"] = np.concatenate(
            [np.transpose(state[k], (2, 3, 1, 0)) for k in wkeys], axis=-1
        ).astype(np.float32)
        used.update(wkeys)
        bkeys = [f"{p}.bias" for p in prefixes]
        if all(k in state for k in bkeys):
            leaf["bias"] = np.concatenate(
                [state[k] for k in bkeys]).astype(np.float32)
            used.update(bkeys)

    leftovers = [
        k for k in state
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise ValueError(f"unmapped torch parameters: {sorted(leftovers)[:10]}")
    return {"params": params}


def params_to_torch_state(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax -> torch layout), for round-trip testing."""
    params = variables["params"]
    state = {}
    for prefix, path in _mapping().items():
        node = params
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        state[f"{prefix}.weight"] = np.transpose(
            np.asarray(node["kernel"]), (3, 2, 0, 1)
        )
        if "bias" in node:
            state[f"{prefix}.bias"] = np.asarray(node["bias"])

    # split the fused double-width convs back into the torch siblings
    for path, prefixes in _fused_mapping().items():
        node = params
        ok = True
        for p in path:
            if p not in node:
                ok = False
                break
            node = node[p]
        if not ok:
            continue
        kernel = np.asarray(node["kernel"])
        halves = np.split(kernel, len(prefixes), axis=-1)
        for prefix, half in zip(prefixes, halves):
            state[f"{prefix}.weight"] = np.transpose(half, (3, 2, 0, 1))
        if "bias" in node:
            for prefix, half in zip(
                    prefixes, np.split(np.asarray(node["bias"]),
                                       len(prefixes))):
                state[f"{prefix}.bias"] = half
    return state


def load_droid_checkpoint(path: str) -> dict:
    """Load droid.pth via torch (CPU) and convert to flax params."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    state = {k: v.numpy() for k, v in raw.items()}
    return torch_state_to_params(state)
