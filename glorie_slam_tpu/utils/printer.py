"""Colored per-subsystem console printing + progress bar.

Rebuild of reference src/utils/Printer.py:5-94. The reference runs a
dedicated printer *process* fed by a message queue; in the single-process
design a plain object suffices (no cross-process stdout contention), while
keeping the same colored prefixes and tqdm frame counter.
"""

import sys


class FontColor:
    TRACKER = "\033[0;34m"     # blue
    MAPPER = "\033[0;32m"      # green
    INFO = "\033[0;36m"        # cyan
    ERROR = "\033[0;31m"       # red
    EVAL = "\033[0;35m"        # magenta
    PCL = "\033[0;33m"         # yellow
    END = "\033[0m"

    _BY_NAME = None

    @classmethod
    def by_name(cls, name):
        table = {
            "tracker": cls.TRACKER, "mapper": cls.MAPPER, "info": cls.INFO,
            "error": cls.ERROR, "eval": cls.EVAL, "pcl": cls.PCL,
        }
        return table.get(name, cls.INFO)

    @classmethod
    def prefix(cls, name):
        table = {
            "tracker": "[Tracker]", "mapper": "[Mapper]", "info": "[Info]",
            "error": "[Error]", "eval": "[Eval]", "pcl": "[PCL]",
        }
        return table.get(name, "[Info]")


class Printer:
    def __init__(self, total_frames: int = 0, silence: bool = False):
        self.silence = silence
        self.total = total_frames
        self._pbar = None
        if not silence and total_frames > 0:
            try:
                from tqdm import tqdm

                self._pbar = tqdm(total=total_frames, desc="frames",
                                  dynamic_ncols=True)
            except ImportError:  # pragma: no cover
                self._pbar = None

    def print(self, msg, subsystem="info"):
        if self.silence:
            return
        color = FontColor.by_name(subsystem)
        prefix = FontColor.prefix(subsystem)
        text = f"{color}{prefix} {msg}{FontColor.END}"
        if self._pbar is not None:
            self._pbar.write(text)
        else:
            print(text, file=sys.stderr)

    def update_pbar(self, n=1):
        if self._pbar is not None:
            self._pbar.update(n)

    def pbar_ready(self):
        pass

    def terminate(self):
        if self._pbar is not None:
            self._pbar.close()


class TrivialPrinter(Printer):
    def __init__(self):
        super().__init__(0, silence=True)
