#!/usr/bin/env python
"""CLI entry point: python run.py configs/<dataset>/<scene>.yaml [flags].

Same public surface as the reference run.py:20-67 (--only_tracking,
--silence; plus --max_frames/--stride/--resume). Delegates to
glorie_slam_tpu.cli.main so the checkout and the installed console script
share ONE implementation (incl. the machine-keyed persistent-cache setup —
a raw shared cache dir segfaults on cross-host AOT entries, utils/cache.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from glorie_slam_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
