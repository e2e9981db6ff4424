#!/usr/bin/env python
"""Dataset integrity check (reference verify_datasets.py:13-20, 31+).

Verifies the 144-scene manifest of the five BasicLFSR training sets:
EPFL 70, HCI_new 20, HCI_old 10, INRIA_Lytro 35, Stanford_Gantry 9
(.mat files under <root>/<dataset>/training/).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

MANIFEST = {
    "EPFL": 70,
    "HCI_new": 20,
    "HCI_old": 10,
    "INRIA_Lytro": 35,
    "Stanford_Gantry": 9,
}


def verify(root: str, split: str = "training") -> bool:
    ok = True
    total = 0
    for ds, expected in MANIFEST.items():
        d = Path(root) / ds / split
        found = len(list(d.glob("*.mat"))) if d.is_dir() else 0
        total += found
        status = "OK " if found == expected else "BAD"
        if found != expected:
            ok = False
        print(f"[{status}] {ds:16s} {found:3d}/{expected}")
    print(f"total: {total}/{sum(MANIFEST.values())}")
    return ok


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="./datasets")
    p.add_argument("--split", default="training")
    args = p.parse_args()
    sys.exit(0 if verify(args.root, args.split) else 1)
