"""Shape-profile round trip (utils/warmup.py + utils/buckets.sticky_bucket).

Pins the three properties the r5 bench regression traced to:
  1. tuple site keys survive the JSON round trip (a string-keyed restore
     silently never matches a sticky_bucket lookup);
  2. the saved profile records TRUE per-call usage, not seeded values —
     a ghost-inflated seed must not ratchet the profile upward;
  3. seeding pins the pad from the first call (no growth re-walk).
"""

import types

from glorie_slam_tpu.utils.buckets import sticky_bucket
from glorie_slam_tpu.utils import warmup


def _video():
    return types.SimpleNamespace()


def _cfg():
    return {"cam": {"H_out": 64, "W_out": 96},
            "tracking": {"warmup": 8, "beta": 0.3}}


def test_profile_roundtrip_tuple_site_keys(tmp_path):
    cfg = _cfg()
    v = _video()
    sticky_bucket(v, ("plain", 16), "E_pad", 96)
    sticky_bucket(v, "maintain", "kpad_add", 48)
    warmup.save_shape_profile(cfg, v, root=str(tmp_path))

    v2 = _video()
    n = warmup.load_shape_profile(cfg, v2, root=str(tmp_path))
    assert n == 2
    assert v2._shape_hw[(("plain", 16), "E_pad")] == 96
    assert v2._shape_hw[("maintain", "kpad_add")] == 48
    # the seed must actually take effect on the next lookup
    assert sticky_bucket(v2, ("plain", 16), "E_pad", 8) == 96


def test_saved_profile_is_true_usage_not_seeds(tmp_path):
    cfg = _cfg()
    v = _video()
    # inflated seed (as a degenerate ghost hand-off would produce)
    v._shape_hw = {(("plain", 16), "E_pad"): 224}
    out = sticky_bucket(v, ("plain", 16), "E_pad", 96)
    assert out == 224  # pinned by the seed for shape stability...
    warmup.save_shape_profile(cfg, v, root=str(tmp_path))
    v2 = _video()
    warmup.load_shape_profile(cfg, v2, root=str(tmp_path))
    # ...but the profile records what the run actually NEEDED
    assert v2._shape_hw[(("plain", 16), "E_pad")] == 96


def test_usage_respects_cap_clamp():
    v = _video()
    # a genuine burst above the cap is honored (the shape must fit the
    # data), and usage records it
    out = sticky_bucket(v, ("plain", 16), "E_pad", 512, cap=128)
    assert out == 512
    assert v._shape_used[(("plain", 16), "E_pad")] == 512
    # the cap clamps the STICKY carry-over, not the burst: a later small
    # call re-pads to the cap, and usage records only its own need
    v2 = _video()
    v2._shape_hw = {(("plain", 16), "E_pad"): 512}
    out2 = sticky_bucket(v2, ("plain", 16), "E_pad", 64, cap=128)
    assert out2 == 512  # seeded high-water above the cap is honored
    assert v2._shape_used[(("plain", 16), "E_pad")] == 64


def test_profile_merge_keeps_per_key_max(tmp_path):
    cfg = _cfg()
    v = _video()
    sticky_bucket(v, ("inactive", 16), "E_pad", 64)
    warmup.save_shape_profile(cfg, v, root=str(tmp_path))
    v2 = _video()
    sticky_bucket(v2, ("inactive", 16), "E_pad", 32)
    sticky_bucket(v2, ("inactive", 16), "EI_pad", 80)
    warmup.save_shape_profile(cfg, v2, root=str(tmp_path))
    v3 = _video()
    warmup.load_shape_profile(cfg, v3, root=str(tmp_path))
    assert v3._shape_hw[(("inactive", 16), "E_pad")] == 64
    assert v3._shape_hw[(("inactive", 16), "EI_pad")] == 80
