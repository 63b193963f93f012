"""End-to-end smoke tests of the training loop (SURVEY.md §4c/§4e)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rainbow_tpu
from rainbow_tpu import agent as ag
from rainbow_tpu.envs.fake import FakeAtariEnv
from rainbow_tpu.train import Trainer


def tiny_cfg(tmp_path, **kw):
    base = dict(
        num_envs=4, memory_capacity=4 * 256, batch_size=16,
        total_steps=400, learn_start=64, replay_frequency=4,
        target_update=128, evaluation_interval=200, evaluation_episodes=3,
        evaluation_size=20, architecture="data-efficient", hidden_size=32,
        multi_step=3, env_backend="fake", results_dir=str(tmp_path),
        run_id="smoke", max_episode_length=400,
    )
    base.update(kw)
    return rainbow_tpu.data_efficient(**base)


@pytest.mark.parametrize("pipeline", [False, True])
def test_full_training_loop_fake_env(tmp_path, pipeline):
    cfg = tiny_cfg(tmp_path, pipeline_actor=pipeline)
    tr = Trainer(cfg)
    metrics = tr.run()
    assert tr.T >= cfg.total_steps
    # evaluation happened and produced artifacts
    assert len(metrics["steps"]) >= 1
    assert len(metrics["rewards"][0]) == cfg.evaluation_episodes
    assert len(metrics["Qs"][0]) == cfg.evaluation_size
    res = os.path.join(str(tmp_path), "smoke")
    assert os.path.exists(os.path.join(res, "metrics.json"))
    assert os.path.exists(os.path.join(res, "Reward.html"))
    assert os.path.exists(os.path.join(res, "Q.html"))
    assert os.path.exists(os.path.join(res, "model.npz"))  # best save
    with open(os.path.join(res, "metrics.json")) as f:
        m = json.loads(f.read())
    assert m["best_avg_reward"] == metrics["best_avg_reward"]


def test_checkpoint_resume_exact(tmp_path):
    """Full-state checkpoint restores agent params, T and metrics exactly
    (the reference loses optimiser/T/β on resume — SURVEY.md §3.4)."""
    cfg = tiny_cfg(tmp_path, total_steps=200, evaluation_interval=100)
    tr = Trainer(cfg)
    tr.run()
    tr.save_checkpoint("final.npz", include_replay=True)

    tr2 = Trainer(cfg)
    tr2.restore_checkpoint(os.path.join(str(tmp_path), "smoke", "final.npz"))
    assert tr2.T == tr.T
    assert tr2.metrics["steps"] == tr.metrics["steps"]
    for a, b in zip(jax.tree_util.tree_leaves(tr.agent.params),
                    jax.tree_util.tree_leaves(tr2.agent.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.rep),
                    jax.tree_util.tree_leaves(tr2.rep)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_learning_on_fake_env_improves_reward(tmp_path):
    """The fake env rewards action == t % A — learnable from the frame
    pattern. A short run must beat the random-policy expected score
    (the learning-smoke test of SURVEY.md §4e, scaled for CI)."""
    cfg = tiny_cfg(tmp_path, total_steps=6000, learn_start=200,
                   evaluation_interval=10 ** 9, num_envs=8,
                   memory_capacity=8 * 512, learning_rate=1e-3,
                   multi_step=3, batch_size=32)
    tr = Trainer(cfg)
    tr.run()
    # Greedy-policy probe on a fresh env: random expectation = episode_len/A
    env = FakeAtariEnv(8, seed=99, episode_len=50, training=False)
    from rainbow_tpu.ops.preprocess import (init_framestack,
                                            to_network_input,
                                            update_framestack)
    stack = init_framestack(8, cfg.history_length,
                            jnp.asarray(env.reset_all()))
    total = 0.0
    for _ in range(50):
        acts = ag.act(tr.agent.params, cfg, env.action_space,
                      to_network_input(stack), None)
        obs, resets, r, d, k = env.step(np.asarray(acts))
        total += r.sum()
        stack = update_framestack(stack, jnp.asarray(obs),
                                  jnp.asarray(resets), jnp.asarray(k))
    per_episode = total / 8
    random_score = 50 / env.action_space  # 12.5
    assert per_episode > random_score * 1.5, per_episode


def test_cli_parses_and_overrides():
    from rainbow_tpu.cli import parse_config
    cfg, args = parse_config([
        "--preset", "data-efficient", "--game", "breakout", "--T-max",
        "5000", "--num-envs", "16", "--noisy-std", "0.2"])
    assert cfg.game == "breakout"
    assert cfg.total_steps == 5000
    assert cfg.num_envs == 16
    assert cfg.noisy_std == 0.2
    assert cfg.multi_step == 20  # preset value survives
    assert not args.evaluate
