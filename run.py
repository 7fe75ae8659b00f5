#!/usr/bin/env python
"""CLI entry point: python run.py configs/<dataset>/<scene>.yaml [flags].

Same public surface as the reference run.py:20-67 (--only_tracking,
--silence; plus TPU-specific env setup). Loads/merges the YAML config chain,
seeds RNGs, snapshots the config, builds the dataset and runs SLAM.
"""

import argparse
import os
import random
import sys

import numpy as np


def setup_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="TPU-native GlORIE-SLAM")
    parser.add_argument("config", type=str, help="path to scene config yaml")
    parser.add_argument("--only_tracking", action="store_true",
                        help="run tracking without mapping")
    parser.add_argument("--silence", action="store_true",
                        help="suppress console output")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="override cfg max_frames")
    parser.add_argument("--stride", type=int, default=None,
                        help="override cfg stride")
    parser.add_argument("--resume", type=str, default=None,
                        help="mid-run checkpoint (.npz from SLAM.save_state)"
                             " to restore before tracking")
    args = parser.parse_args()

    # persistent compile cache: this workload re-jits a handful of bucketed
    # shapes; caching makes warm starts fast on both CPU and TPU
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.join(os.path.dirname(__file__),
                                            ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from glorie_slam_tpu import config as config_mod
    from glorie_slam_tpu.slam import SLAM
    from glorie_slam_tpu.utils.datasets import get_dataset

    cfg = config_mod.load_config(
        args.config, config_mod.DEFAULT_CONFIG_PATH
    )
    setup_seed(cfg.get("setup_seed", 43))
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
