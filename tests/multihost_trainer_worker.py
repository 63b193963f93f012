"""Worker for the 2-process FULL-Trainer multi-host test (see
test_multihost.py). Each process runs the complete training path — per-host
env slice + replay shard, globalized agent, shard_map learner with
cross-process collectives, eval, replay-bearing checkpoint — then restores
the checkpoint into a fresh Trainer and continues training from it.
"""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
tmpdir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num_procs, process_id=proc_id)

import numpy as np  # noqa: E402

import rainbow_tpu  # noqa: E402
from rainbow_tpu.parallel.multihost import local_params, local_rows  # noqa: E402
from rainbow_tpu.train import Trainer  # noqa: E402

GLOBAL_ENVS = 4 * num_procs
cfg = rainbow_tpu.data_efficient(
    num_envs=GLOBAL_ENVS, memory_capacity=GLOBAL_ENVS * 128, batch_size=8,
    total_steps=400, learn_start=64, replay_frequency=4, target_update=128,
    evaluation_interval=200, evaluation_episodes=2, evaluation_size=16,
    architecture="data-efficient", hidden_size=32, multi_step=3,
    env_backend="fake", results_dir=tmpdir, run_id="mh",
    max_episode_length=400, memory_path="save-replay",
    # Exercise the multi-process FAST path: pipelined engine overlap + the
    # fused single-dispatch SPMD iteration (train_iter_mp).
    pipeline_actor=True, pipeline_depth=2)

tr = Trainer(cfg)
assert tr.multi_process and tr.envs_local == 4, (tr.multi_process,
                                                 tr.envs_local)
metrics = tr.run()
assert tr.T >= cfg.total_steps
assert len(metrics["steps"]) >= 1, "no evaluation ran"
# The eval-time replay-bearing save must exist per process.
mem_ckpt = os.path.join(tmpdir, "mh",
                        f"memory_checkpoint.npz.proc{proc_id}-of-{num_procs}")
assert os.path.exists(mem_ckpt), mem_ckpt

tr.save_checkpoint("final.npz", include_replay=True)

# ---- exact resume into a fresh multi-process Trainer --------------------
tr2 = Trainer(cfg.replace(run_id="mh2", total_steps=cfg.total_steps + 200))
tr2.restore_checkpoint(os.path.join(tmpdir, "mh", "final.npz"))
assert tr2.T == tr.T, (tr2.T, tr.T)
assert tr2.metrics["steps"] == metrics["steps"]
p1 = jax.tree.map(np.asarray, local_params(tr.agent.params))
p2 = jax.tree.map(np.asarray, local_params(tr2.agent.params))
for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
    np.testing.assert_array_equal(a, b)
# Replay shard restored bit-exactly (this process's rows).
np.testing.assert_array_equal(local_rows(tr.rep.priorities),
                              local_rows(tr2.rep.priorities))
np.testing.assert_array_equal(local_rows(tr.rep.frames),
                              local_rows(tr2.rep.frames))

# The restored state must be RUNNABLE: continue training 200 more steps.
tr2.run()
assert tr2.T >= cfg.total_steps + 200

# Params replicated-consistent across processes: print a probe the parent
# compares between workers.
probe = float(np.asarray(
    jax.tree_util.tree_leaves(p2)[0]).ravel()[0])
print(f"MULTIHOST-TRAINER-OK proc={proc_id} T={tr2.T} "
      f"param0={probe:.6f}", flush=True)
