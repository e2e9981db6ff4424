#!/usr/bin/env python
"""Track-2 efficiency gate CLI (reference check_efficiency_official.py).

Checks the <1M-param and <20 GFLOP (MAC convention) constraints at the
official SAI input [1,1,160,160], reports a per-module parameter
breakdown, XLA-HLO FLOPs, optional latency/memory benchmarks, and a
final verdict. ``--deploy`` tests the RepConv-fused graph like the
reference's --deploy flag (check_efficiency_official.py:52-57).
"""

from __future__ import annotations

import argparse
import json

from lfsr_tpu.cli import build_parser, config_from_args
from lfsr_tpu.tools.efficiency import check_efficiency, format_report


def main():
    p = build_parser()
    p.add_argument("--bench", action="store_true", help="run latency benchmark")
    p.add_argument("--deploy", action="store_true", help="test the reparameterized graph")
    p.add_argument("--detailed", action="store_true",
                   help="per-module params + FLOPs table "
                        "(check_efficiency_official.py:456-463)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    cfg = config_from_args(args)
    if args.deploy:
        cfg = cfg.replace(model_kwargs={**cfg.model_kwargs, "deploy": True})
    report = check_efficiency(cfg, bench=args.bench)
    if args.json:
        print(json.dumps(report, default=str))
    else:
        print(format_report(report, detailed=args.detailed))
    return 0 if report["verdict"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
