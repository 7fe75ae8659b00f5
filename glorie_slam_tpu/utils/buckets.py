"""Static-shape bucketing for jit stability.

The tracker's edge counts and window sizes vary every frame; padding them to
a coarse bucket ladder bounds XLA recompilation to a handful of shapes
(SURVEY.md §7 "Edges as padded batches").
"""

_LADDER = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
           1536, 2048, 3072, 4096, 8192, 16384, 32768, 65536, 131072,
           262144, 524288)

# Finer ladder for the HOT programs' edge axis: the fused DSPO rounds scale
# ~linearly in E_pad (GRU convs + lookup + agg), and the coarse ladder's
# 64 -> 96 -> 128 jumps pad a steady-state frontend graph (E ~ 66 on the
# Replica bench) 45% past its high water. Multiples of 8 keep an 8-device
# edge shard even (parallel/mesh.py) and the one-hot contractions aligned.
# Compile cost: each rung is one extra fused-program compile, grow-only
# under sticky_bucket and persisted by the compilation cache.
EDGE_LADDER = tuple(range(8, 129, 8)) + (160, 192, 224, 256, 320, 384,
                                         448, 512, 640, 768, 1024, 1536,
                                         2048, 3072, 4096)


def bucket(n: int, ladder=_LADDER) -> int:
    """Round n up to the next bucket size."""
    if n <= 0:
        return ladder[0]
    for b in ladder:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds the largest bucket {ladder[-1]}")


def edge_bucket(n: int) -> int:
    """Round an edge count up on the finer edge-axis ladder."""
    return bucket(n, EDGE_LADDER)


def sticky_bucket(video, site, name, val, cap=0):
    """Grow-only high-water bucket shared across graph recreations.

    Config-derived ceilings pin ONE executable per run but pad hot programs
    far past the sizes a steady-state graph actually reaches; exact
    per-call buckets oscillate and recompile. A sticky maximum does
    neither: pad each axis to the LARGEST bucket it has needed so far —
    the jit key only ever grows (each rung compiles once; the persistent
    cache and utils/warmup.py make that a one-time cost) and the steady
    state runs at the sizes the trajectory actually produces.

    High-waters live on the VIDEO (keyed by ``(site, name)``), so
    per-call FactorGraph recreations (backend.py loop_ba) share one
    ladder. ``cap``: optional ceiling (the old cap value) so a
    pathological burst can never exceed the previously-guaranteed shape —
    but a high-water ALREADY ABOVE the cap is honored: it can only be
    there because a previous run (via the shape profile, utils/warmup.py)
    or an earlier frame legitimately reached it, and clamping it back
    re-walks the growth ladder through fresh compiles the warm-up already
    paid for (r5 bench: E_pad 80->88->96->104 recompiling the fused
    rounds program on four consecutive frames under a seeded hw of 104)."""
    hw = getattr(video, "_shape_hw", None)
    if hw is None:
        hw = video._shape_hw = {}
    key = (site, name)
    prev = hw.get(key, 0)
    out = max(val, prev)
    if cap:
        out = min(out, max(cap, val, prev))
    hw[key] = out
    # true-usage high-water, UNAFFECTED by seeding: the raw bucket this call
    # would have needed on its own. The saved shape profile reads this dict
    # (utils/warmup.save_shape_profile), so a seed inflated by the ghost
    # warm-up's degenerate geometry (identity poses -> zero distances ->
    # maximal proposals) can never leak into the profile and ratchet every
    # future run's padding upward (r5 bench: the loop site pinned at 224
    # rows from frame 0 while the real trajectory needed ~128, +20% steady
    # frame cost).
    used = getattr(video, "_shape_used", None)
    if used is None:
        used = video._shape_used = {}
    used[key] = max(used.get(key, 0), min(val, out))
    return out
