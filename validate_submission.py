#!/usr/bin/env python
"""Submission validator CLI (reference validate_submission.py).

Structural validation of a CodaBench zip or directory: Real/+Synth/
roots, 16 scenes each, 25 View_i_j.bmp per scene, byte-level BMP header
checks (24-bpp uncompressed, correct dimensions per subset), and pixel
statistics sampling.
"""

from __future__ import annotations

import argparse
import sys

from lfsr_tpu.tools.submission import validate_submission


def main():
    p = argparse.ArgumentParser()
    p.add_argument("submission", help="zip file or directory")
    p.add_argument("--sample_pixels", type=int, default=3)
    args = p.parse_args()
    rep = validate_submission(args.submission, args.sample_pixels)
    for w in rep.warnings:
        print(f"WARN : {w}")
    for e in rep.errors:
        print(f"ERROR: {e}")
    print(
        f"{'VALID' if rep.ok else 'INVALID'}: {rep.checks} checks, "
        f"{len(rep.errors)} errors, {len(rep.warnings)} warnings"
    )
    return 0 if rep.ok else 1


if __name__ == "__main__":
    sys.exit(main())
