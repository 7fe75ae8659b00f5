#!/usr/bin/env bash
# One-command real-data accuracy parity check (VERDICT r4 next-step #9).
#
# The moment the real artifacts drop into this checkout —
#     pretrained/droid.pth                    (reference slam.py:70-81)
#     pretrained/omnidata_dpt_depth_v2.ckpt   (reference mono_estimators.py:17-31)
#     pretrained/middle_fine.pt               (reference mapper.py:105-121, mapping only)
#     <data root>/Replica/room0               (configs/Replica/room0.yaml data.input_folder)
# — this script imports the checkpoints (checksum-pinned), runs room0 with
# --only_tracking, and prints the keyframe/full ATE next to the BASELINE.md
# target in one step.
#
# Usage:
#   scripts/real_parity.sh            # full run (requires the artifacts)
#   scripts/real_parity.sh --dry-run  # verify the wiring without them
#
# Checksum pinning is trust-on-first-use: the first real run records
# sha256 sums into pretrained/CHECKSUMS.sha256; later runs verify against
# it and refuse to run on mismatch (a silently different droid.pth is the
# single most likely way to produce a non-comparable ATE).

set -euo pipefail
cd "$(dirname "$0")/.."

DRY=0
[ "${1:-}" = "--dry-run" ] && DRY=1

CFG=configs/Replica/room0.yaml
CKPTS=(pretrained/droid.pth pretrained/omnidata_dpt_depth_v2.ckpt)
SUMFILE=pretrained/CHECKSUMS.sha256

if [ "$DRY" = 1 ]; then
    echo "[real_parity] DRY RUN: verifying wiring without real artifacts"
    python - <<'EOF'
import os, sys
sys.path.insert(0, os.getcwd())
# 1. config chain resolves and points at the expected checkpoint paths
from glorie_slam_tpu import config as config_mod
cfg = config_mod.load_config("configs/Replica/room0.yaml",
                             config_mod.DEFAULT_CONFIG_PATH)
assert cfg["tracking"]["pretrained"].endswith("droid.pth"), cfg["tracking"]
assert cfg["mono_prior"]["depth_pretrained"].endswith(
    "omnidata_dpt_depth_v2.ckpt")
assert cfg["mapping"]["pretrained"].endswith("middle_fine.pt")
# 2. the importers exist and expose the entry points the loaders call
from glorie_slam_tpu.nets.tracker_net import TrackerNet
assert hasattr(TrackerNet, "from_checkpoint")
from glorie_slam_tpu.nets.import_torch import load_droid_checkpoint  # noqa
from glorie_slam_tpu.mapping.import_dpt import load_omnidata_checkpoint  # noqa
from glorie_slam_tpu.mapping.import_pointslam import (  # noqa
    load_pointslam_geo_decoder)
# 3. the eval path used below exists
from glorie_slam_tpu.utils.eval_traj import kf_traj_eval, full_traj_eval  # noqa
# 4. BASELINE target parses
target_m = 0.0031   # Replica avg ATE ~0.31 cm (BASELINE.md, paper table)
print(f"[real_parity] wiring OK; BASELINE target ATE {target_m*100:.2f} cm "
      f"(5% parity band: <= {target_m*1.05*100:.3f} cm)")
EOF
    echo "[real_parity] dry run PASSED"
    exit 0
fi

# ---- real mode -----------------------------------------------------------
for f in "${CKPTS[@]}"; do
    if [ ! -f "$f" ]; then
        echo "[real_parity] MISSING $f — drop the artifact in and re-run" >&2
        exit 2
    fi
done
DATA_DIR=$(python -c "
from glorie_slam_tpu import config as c
cfg = c.load_config('$CFG', c.DEFAULT_CONFIG_PATH)
print(cfg['data']['input_folder'])")
if [ ! -d "$DATA_DIR" ]; then
    echo "[real_parity] MISSING dataset dir $DATA_DIR (room0)" >&2
    exit 2
fi

if [ -f "$SUMFILE" ]; then
    echo "[real_parity] verifying pinned checksums"
    sha256sum -c "$SUMFILE"
else
    echo "[real_parity] pinning checksums (trust-on-first-use)"
    sha256sum "${CKPTS[@]}" > "$SUMFILE"
    cat "$SUMFILE"
fi

echo "[real_parity] running room0 --only_tracking"
python run.py "$CFG" --only_tracking

OUT=$(python -c "
from glorie_slam_tpu import config as c
cfg = c.load_config('$CFG', c.DEFAULT_CONFIG_PATH)
print(f\"{cfg['data']['output']}/{cfg['setting']}/{cfg['scene']}\")")
echo "[real_parity] ===== ATE vs BASELINE ====="
for m in "$OUT"/traj/metrics_*.txt; do
    [ -f "$m" ] || continue
    echo "--- $m"
    grep -m1 'ATE-RMSE' "$m"
done
echo "BASELINE (paper, RTX 3090): Replica avg ATE 0.31 cm; parity = within 5%"
