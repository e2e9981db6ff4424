"""Training-throughput probe: production run_epoch on the flagship at the
full SAI-160 point (batch 8, bf16, remat) — steps/s and patches/s on the
attached TPU (VERDICT r2 weak #3: no training-throughput number tracked).

The tunnel caveat applies (block_until_ready returns early on axon):
run_epoch's final float() metric fetch is the sync, so whole-epoch
wall-clock over enough steps is trustworthy. Run:
    python -m scripts.probes.probe_train_throughput [batch] [steps]
"""
import sys
import time

import numpy as np
import jax

from lfsr_tpu.config import Config
from lfsr_tpu.data.datasets import TrainArrays
from lfsr_tpu.train.trainer import Trainer


def main(batch=8, steps=30):
    cfg = Config(
        model_name="LFMambaX",
        scale_factor=4,
        batch_size=batch,
        epochs=50,
        use_masked_pretrain=True,
    )
    rng = np.random.default_rng(0)
    n = batch * steps
    data = TrainArrays(
        lr=rng.random((n, 160, 160)).astype(np.float32),
        hr=rng.random((n, 640, 640)).astype(np.float32),
    )
    tr = Trainer(cfg, steps_per_epoch=steps)
    state = tr.init_state(jax.random.key(0), data.lr[:1][..., None])

    # warmup epoch: compile + steady-state
    state, m = tr.run_epoch(state, data, epoch=0, key=jax.random.key(1))
    t0 = time.perf_counter()
    state, m = tr.run_epoch(state, data, epoch=1, key=jax.random.key(2))
    dt = time.perf_counter() - t0
    sps = steps / dt
    print(
        f"batch={batch} steps={steps}: {dt:.2f}s epoch, "
        f"{sps:.3f} steps/s, {sps * batch:.2f} patches/s, "
        f"loss={m['loss']:.4f} psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}"
    )


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
