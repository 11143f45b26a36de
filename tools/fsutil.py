"""Shared filesystem helpers for the measurement tools."""
from __future__ import annotations

import os
import shutil


def hardlink_raw(src_raw: str, work: str) -> None:
    """Populate ``work/raw`` with the files of a pre-generated raw/
    dir via hardlinks (same-filesystem: zero copy cost; the generator
    outputs are immutable inputs, and every consumer treats them
    read-only). Falls back to a real copy across devices.
    Subdirectories are skipped — generated raw/ dirs are flat, and a
    stray directory must not crash the probe."""
    dst = os.path.join(work, "raw")
    os.makedirs(dst)
    for f in os.listdir(src_raw):
        src = os.path.join(src_raw, f)
        if not os.path.isfile(src):
            continue
        try:
            os.link(src, os.path.join(dst, f))
        except OSError:  # cross-device: fall back
            shutil.copy2(src, os.path.join(dst, f))
