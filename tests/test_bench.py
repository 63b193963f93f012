"""bench.py must keep working unattended — the driver runs it at the end of
every round. Exercise the train-mode path end-to-end on CPU at tiny size."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_train_runs_and_reports():
    import bench
    import rainbow_tpu

    cfg = rainbow_tpu.canonical(num_envs=8, memory_capacity=8 * 256,
                                batch_size=8, hidden_size=64)
    sps, ups, mfu, loss = bench.bench_train(cfg, "pong", 8, 4)
    assert sps > 0 and ups > 0
    assert 0 <= mfu < 1
    assert np.isfinite(loss)


def test_flops_accounting_matches_hand_count():
    import bench
    import rainbow_tpu

    cfg = rainbow_tpu.canonical()
    f = bench.forward_flops_per_sample(cfg, 6)
    # Hand count (canonical, A=6): convs 3.28M + 2.65M + 1.81M MACs,
    # fc (noisy, x2): 2*3136*512*2 + 2*(512*51 + 512*306) MACs.
    convs = 20 * 20 * 32 * 8 * 8 * 4 + 9 * 9 * 64 * 4 * 4 * 32 \
        + 7 * 7 * 64 * 3 * 3 * 64
    fc = 2 * (3136 * 512) * 2 + 2 * (512 * 51) + 2 * (512 * 306)
    assert f == 2 * (convs + fc)
    assert bench.learn_flops_per_update(cfg, 6) == 5 * 32 * f
