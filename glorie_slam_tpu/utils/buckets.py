"""Static-shape bucketing for jit stability.

The tracker's edge counts and window sizes vary every frame; padding them to
a coarse bucket ladder bounds XLA recompilation to a handful of shapes
(SURVEY.md §7 "Edges as padded batches").
"""

_LADDER = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
           1536, 2048, 3072, 4096, 8192, 16384, 32768, 65536, 131072,
           262144, 524288)


def bucket(n: int, ladder=_LADDER) -> int:
    """Round n up to the next bucket size."""
    if n <= 0:
        return ladder[0]
    for b in ladder:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds the largest bucket {ladder[-1]}")
