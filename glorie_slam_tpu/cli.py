"""Installed console entry point (``glorie-slam <config.yaml> [flags]``).

Thin delegation to the repo-root ``run.py`` logic so the installed package
and the checkout expose the identical CLI surface (reference run.py:20-67).
"""

import argparse
import os
import random

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="TPU-native GlORIE-SLAM")
    parser.add_argument("config", type=str, help="path to scene config yaml")
    parser.add_argument("--only_tracking", action="store_true")
    parser.add_argument("--silence", action="store_true")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--stride", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="mid-run checkpoint (.npz from SLAM.save_state)")
    args = parser.parse_args()

    import jax

    from .utils.cache import enable_persistent_cache

    if os.environ.get("JAX_CACHE_DIR"):
        # explicit override: trust the caller (still skipped on CPU — see
        # enable_persistent_cache on the XLA:CPU serialize segfault)
        if jax.default_backend() != "cpu":
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_CACHE_DIR"])
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        else:
            print("WARNING: JAX_CACHE_DIR is set but ignored on the CPU "
                  "backend (XLA:CPU AOT executable serialization is "
                  "unreliable — see glorie_slam_tpu/utils/cache.py)")
    else:
        enable_persistent_cache(os.getcwd())

    from . import config as config_mod
    from .slam import SLAM
    from .utils.datasets import get_dataset

    cfg = config_mod.load_config(args.config, config_mod.DEFAULT_CONFIG_PATH)
    random.seed(cfg.get("setup_seed", 43))
    np.random.seed(cfg.get("setup_seed", 43))
    if args.only_tracking:
        cfg["only_tracking"] = True
    if args.silence:
        cfg["silence"] = True
        cfg["verbose"] = False
    if args.max_frames is not None:
        cfg["max_frames"] = args.max_frames
    if args.stride is not None:
        cfg["stride"] = args.stride

    output = f"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}"
    os.makedirs(output, exist_ok=True)
    config_mod.save_config(cfg, f"{output}/cfg.yaml")

    stream = get_dataset(cfg)
    slam = SLAM(cfg, stream)
    slam.run(resume_from=args.resume)


if __name__ == "__main__":
    main()
