"""AOT bucket-ladder warm-up: compile every steady-state shape rung BEFORE
frame 0, so no XLA compile stalls the trajectory mid-run.

All hot programs are bucket-padded (utils/buckets.py), so a run crosses a
handful of shape rungs as the keyframe count grows (VERDICT r2: the one
observed crossing cost 19 fresh compiles in a single keyframe — remote
compiles are 0.5-5 s each, fused-program compiles tens of seconds). The
counter-dependent rungs are the proposal-grid pow2 pads, the depth-scale
frame bucket P = bucket(counter), and the loop-closure span bucket
K_ds = bucket(max ii span) (tracking/fused.py:462-480).

Rather than enumerating programs by hand (fragile against refactors), a
GHOST pipeline — same config, same TrackerNet params, its own DepthVideo —
is driven through the real code path with its keyframe counter teleported
along the ladder: each probe admits a frame and runs the full frontend
update (fused DSPO rounds + loop_ba) plus one online dense_ba at that rung.
Shape-keyed jit caching then makes the real run hit every program warm;
with the persistent compile cache the cost is once per machine, not once
per run.
"""

import hashlib
import json
import os
import time

import numpy as np

from .buckets import _LADDER, bucket


def _retry_transient(fn, attempts=4, log=None):
    """Run ``fn``, retrying on transient remote-compile transport errors.

    The axon remote-compile tunnel occasionally drops a response mid-body
    ("response body closed before all bytes were read"); one such flake
    during the warm-up would otherwise abort the whole run before frame 0.
    Only errors that look like transport/compile-service flakes are
    retried; real program errors re-raise immediately. The ghost pipeline
    is shape-driven, so re-running a partially applied step is harmless.
    """
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by message below
            msg = str(e)
            transient = ("remote_compile" in msg or "response body" in msg
                         or "DEADLINE_EXCEEDED" in msg
                         or "UNAVAILABLE" in msg)
            if not transient or k == attempts - 1:
                raise
            if log is not None:
                log(f"[warm] transient compile-transport error "
                    f"(attempt {k + 1}/{attempts}): {msg[:120]}")
            time.sleep(2.0 * (k + 1))


def _profile_path(cfg, root=None):
    """Machine-independent shape-profile file for this config.

    Keyed by the shape-affecting config slice (camera output dims + the
    whole tracking block): sticky high-waters (utils/buckets.sticky_bucket)
    are pure shape information, so unlike the compiled-executable cache
    (utils/cache.py) one profile serves every machine."""
    if root is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    key = json.dumps(
        {"cam": {k: cfg["cam"].get(k) for k in ("H_out", "W_out")},
         "tracking": cfg.get("tracking", {})},
        sort_keys=True, default=str)
    h = hashlib.sha1(key.encode()).hexdigest()[:12]
    # NOT under .jax_cache (which is machine-keyed and gitignored): profiles
    # are pure shape information, so committing them ships real-run
    # high-waters to fresh machines — the ghost warm-up then compiles the
    # exact programs the real run needs even on a cold compile cache
    d = os.path.join(root, "shape_profiles")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{h}.json")


def load_shape_profile(cfg, video, root=None):
    """Pre-seed ``video``'s sticky high-waters from a saved profile.

    With the profile in place the ghost warm-up (and the real run) compile
    ONLY the final-rung programs instead of re-walking the growth ladder —
    the VERDICT-r4 fix for history-dependent sticky shapes defeating the
    warm pass. Returns the number of seeded keys."""
    path = _profile_path(cfg, root)
    if not os.path.exists(path):
        return 0
    try:
        with open(path) as f:
            prof = json.load(f)
    except (OSError, ValueError):
        return 0
    hw = getattr(video, "_shape_hw", None)
    if hw is None:
        hw = video._shape_hw = {}
    n = 0
    for k, v in prof.items():
        site, _, name = k.partition("|")
        # sticky_bucket keys use TUPLE sites (e.g. ("plain", 16)); the file
        # stores their repr — restore the tuple or the entry never matches
        # a lookup and the seed is silently dead
        if site.startswith("("):
            import ast
            try:
                site = ast.literal_eval(site)
            except (ValueError, SyntaxError):
                pass
        key = (site, name)
        if v > hw.get(key, 0):
            hw[key] = int(v)
            n += 1
    return n


def save_shape_profile(cfg, video, root=None):
    """Merge ``video``'s TRUE-USAGE shape high-waters into the saved profile.

    Reads ``_shape_used`` (the raw per-call requirement,
    utils/buckets.sticky_bucket), NOT ``_shape_hw``: the latter includes
    seeded values, so saving it would ratchet profile entries up forever
    (and let the ghost warm-up's degenerate-geometry inflation leak into
    every future run's padding)."""
    hw = getattr(video, "_shape_used", None)
    if not hw:
        return
    path = _profile_path(cfg, root)
    prof = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                prof = json.load(f)
        except (OSError, ValueError):
            prof = {}
    for (site, name), v in hw.items():
        k = f"{site}|{name}"
        prof[k] = max(int(v), prof.get(k, 0))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prof, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def warm_ladder(slam, max_keyframes, printer=None):
    """Pre-compile the tracking shape ladder up to ``max_keyframes``.

    slam: a constructed SLAM (tracker_net params are shared; all warm
    state lives in a throwaway DepthVideo). Safe to call before
    ``tracker.run``; does not touch ``slam.video``."""
    warm_pipeline(slam.cfg, slam.tracker_net, slam.video, max_keyframes,
                  printer=printer)


def warm_pipeline(cfg, tracker_net, real_video, max_keyframes, printer=None,
                  profile_root=None):
    """Core warm-up: ghost pipeline teleported along the bucket ladder.

    ``real_video``: the run's live DepthVideo — receives the ghost's sticky
    shape high-waters afterwards so the real run starts on the warmed rungs.
    """
    import copy

    import jax.numpy as jnp

    from ..core.depth_video import DepthVideo
    from ..tracking.backend import Backend
    from ..tracking.frontend import Frontend
    from ..tracking.motion_filter import MotionFilter

    tn = tracker_net
    H, W = cfg["cam"]["H_out"], cfg["cam"]["W_out"]

    # seed the REAL run's sticky high-waters from the saved profile (true
    # per-call usage maxima of a previous real run — buckets.sticky_bucket).
    # Pinned from frame 0, the run's hot shapes are CONSTANT, so the ghost
    # below compiles exactly the programs the run will dispatch and no
    # growth-rung recompile can stall the trajectory (r5 bench: the
    # inactive-pool pad crossing 88->96->104->128 mid-run cost three
    # consecutive ~60 s compile frames that the ghost had never probed).
    n_seed = load_shape_profile(cfg, real_video, root=profile_root)

    # the ghost's proposals run on degenerate geometry (identity poses ->
    # zero distances -> every candidate admitted), so UNCLAMPED it builds
    # maximal loop graphs (8*window edges) and compiles programs the real
    # run never uses. With a profile, cap the ghost's loop graph at the
    # real-run loop-site maximum so its compiles match the real shapes.
    gcfg = cfg
    if n_seed:
        prof_hw = getattr(real_video, "_shape_hw", {})
        plain_cap = 0
        for k, v in prof_hw.items():
            if k[1] == "E_pad" and "plain" in str(k[0]):
                plain_cap = max(plain_cap, v)
        if plain_cap:
            gcfg = copy.deepcopy(cfg)
            gcfg["tracking"]["backend"]["loop_max_factors"] = int(plain_cap)

    video = DepthVideo(gcfg)
    # ghost sticky seeds = the real run's (profile + anything the real
    # video already reached, e.g. on resume) so ghost and real pad alike
    ghost_hw = video._shape_hw = dict(
        getattr(real_video, "_shape_hw", None) or {})
    mf = MotionFilter(tn, video, gcfg, thresh=-1.0)  # always admit
    fe = Frontend(tn, video, gcfg)
    ba = Backend(tn, video, gcfg)
    intr = np.array([0.6 * W, 0.6 * W, W / 2.0, H / 2.0], np.float32)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(3)]
    ts = [0]

    def step():
        mf.track(float(ts[0]), frames[ts[0] % len(frames)], intr)
        mf.prefetch(float(ts[0] + 1), frames[(ts[0] + 1) % len(frames)])
        fe()
        ts[0] += 1

    def log(msg):
        if printer is not None:
            printer.print(msg, subsystem="info")

    # bootstrap: init shapes + small steady-state rounds
    log("[warm] bootstrap")
    for _ in range(fe.warmup + 3):
        _retry_transient(step, log=log)

    window = fe.frontend_window
    top = min(max_keyframes, video.buffer)
    # every ladder crossing ABOVE the bootstrap counter: the frame bucket
    # P = bucket(counter) changes at 16 and 24 long before the frontend
    # window fills, and the r5 bench showed each unprobed early crossing
    # costing 60s+ of mid-run compiles (frames 8-19)
    boot = fe.warmup + 3
    rungs = [r for r in _LADDER if boot < r <= top]
    if top not in rungs:
        # the run's final stretch sits ABOVE the last ladder rung (e.g.
        # 420 keyframes with rungs ...384): its P = bucket(counter) shapes
        # only compile if probed explicitly
        rungs.append(top)
    for R in rungs:
        # teleport just below the crossing, then step across it: probes
        # both sides of every bucket boundary through the REAL update path
        # (identical poses => zero distances => loop candidates survive and
        # the full loop_ba + fused-rounds shapes at this rung compile)
        video.counter = R - 2
        fe.t1 = R - 2
        ts[0] = R - 2
        fe.graph.clear_edges()  # window-local edges, as in steady state
        log(f"[warm] rung {R}")
        _retry_transient(step, log=log)
        _retry_transient(step, log=log)

    # the global dense BA's shape signature — depth-scale frame bucket P,
    # pow2-padded proposal grid, lowmem chunk-count bucket, edge-capacity
    # bucket — changes at counters BETWEEN frontend ladder rungs (e.g. the
    # grid pad crosses pow2 at counter 182, no rung nearby), so probe one
    # representative counter per DISTINCT signature instead of per rung
    def _pow2_grid(c):
        e = c * c
        p = bucket(min(e, 256))
        while p < e:
            p *= 2
        return p

    radius = ba.backend_radius

    def _sig(c):
        return (bucket(c), _pow2_grid(c), bucket(max(1, -(-c // 8))),
                bucket((radius + 2) * 2 * c))

    # probe from the EARLIEST counter the online BA can fire at
    # (tracker.py: curr_kf >= ba_freq), not from past the frontend window —
    # the first dense_ba of a run lands at ~ba_freq keyframes and its
    # signature (frame bucket 16, small pow2 grid) is otherwise never warmed
    ba_freq = int(cfg["tracking"].get("backend", {}).get("ba_freq", 20))
    lo = max(boot, min(ba_freq, window + 3))
    seen = set()
    for c in range(lo, top + 1):
        if _sig(c) in seen:
            continue
        seen.add(_sig(c))
        video.counter = c
        fe.t1 = c
        log(f"[warm] dense_ba @ {c}")
        _retry_transient(lambda: ba.dense_ba(2), log=log)

    # terminate-phase shapes: the full-resolution multiview mask refresh
    # (lazy; first real read happens at save_video/eval with nearly every
    # frame dirty)
    log("[warm] full-res mask refresh")
    video.dirty[:video.counter] = True
    _retry_transient(lambda: video.valid_depth_mask, log=log)

    # hand the ghost's sticky high-waters to the REAL video so the real run
    # starts on the rungs the ghost compiled — but ONLY where the real video
    # has no profile seed: a profile entry is a true real-run maximum, while
    # the ghost's own growth is inflated by its degenerate geometry (all
    # candidates admitted), and overwriting the seed with it would pin every
    # frame at phantom sizes (the r5 bench regression: loop site 224 vs the
    # real ~128, +20% steady frame cost). The ghost's own usage is NOT saved
    # to the profile for the same reason — only real runs write it
    # (bench.py / SLAM.run via save_shape_profile).
    hw = getattr(video, "_shape_hw", None)
    if hw:
        real_hw = getattr(real_video, "_shape_hw", None)
        if real_hw is None:
            real_hw = real_video._shape_hw = {}
        for k, v in hw.items():
            if k not in real_hw:
                real_hw[k] = v
