#!/usr/bin/env python
"""Offline data generation CLI (reference L0 layer).

Covers Generate_Data_for_Training.py, Generate_Data_for_Test.py,
Generate_Data_for_inference.py / Generate_Validation_Data.py with one
entry point:

    python generate_data.py train --src datasets/ --out data_for_train/
    python generate_data.py test  --src datasets/ --out data_for_test/
    python generate_data.py inference --src NTIRE_Val/ --out data_for_test/

Numerics are float64 and MATLAB-exact (lfsr_tpu.ops.resize.imresize), and
h5 files keep the reference's transposed column-major layout.
"""

from __future__ import annotations

import argparse

from lfsr_tpu.data.generate import (
    TRAIN_DATASETS,
    generate_training_patches,
    generate_test_scenes,
    generate_inference_scenes,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["train", "test", "inference"])
    p.add_argument("--src", required=True, help="root of the .mat datasets")
    p.add_argument("--out", required=True)
    p.add_argument("--angRes", type=int, default=5)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--datasets", nargs="*", default=None)
    args = p.parse_args()

    if args.mode == "train":
        n = generate_training_patches(
            args.src, args.out, args.angRes, args.scale_factor, args.datasets
        )
        print(f"wrote {n} training patches")
    elif args.mode == "test":
        n = generate_test_scenes(
            args.src, args.out, args.angRes, args.scale_factor, args.datasets
        )
        print(f"wrote {n} test scenes")
    else:
        n = generate_inference_scenes(
            args.src, args.out, args.angRes, args.scale_factor,
            tuple(args.datasets) if args.datasets else ("Real", "Synth"),
        )
        print(f"wrote {n} inference scenes")


if __name__ == "__main__":
    main()
