import time, sys, numpy as np, jax, jax.numpy as jnp
from collections import deque
from concurrent.futures import ThreadPoolExecutor
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import (actor_step_delta, actor_step_packed,
    pack_delta, pack_resets, learner_round, init_framestack,
    to_network_input)
from rainbow_tpu.envs.engine import BatchedEnv

cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
env = BatchedEnv("pong", 256, seed=1)
N, A = 256, env.action_space
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
stack = init_framestack(N, cfg.history_length, jnp.asarray(env.reset_all()))
actions = ag.act(agent.params, cfg, A, to_network_input(stack), agent.noise_key)
floor = [0]; num_cells = N*84*84
keys = jax.device_put(jax.random.split(jax.random.key(9), 200))

def step_args(a_np):
    counts, dpos, dval, resets, rewards, dones, kinds = env.step_delta(a_np)
    packed, ridx = pack_resets(resets, kinds)
    ppos, pval = pack_delta(dpos, dval, min_bucket=floor[0])
    floor[0] = max(floor[0], min(2*dpos.shape[0], num_cells//3))
    return True, (jnp.asarray(counts), jnp.asarray(ppos), jnp.asarray(pval),
                  jnp.asarray(packed), jnp.asarray(ridx), jnp.asarray(rewards),
                  jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))

mode = sys.argv[1]
acts_np = np.asarray(actions)
ITER = 60
t_start = None
for it in range(1, ITER+20+1):
    if it == 21:
        jax.block_until_ready(stack); t_start = time.perf_counter()
    is_d, tail = step_args(acts_np)
    if mode != "learnonly":
        actions, stack, rep = actor_step_delta(agent.params, agent.noise_key,
            cfg, A, stack, rep, acts_np if False else actions, *tail)
    if mode in ("full", "learnonly"):
        agent, rep, loss = learner_round(agent, rep, cfg, A, 64,
                                         np.float32(0.5), keys[it % 200])
    acts_np = np.asarray(actions)
jax.block_until_ready(stack)
dt = time.perf_counter()-t_start
print(f"mode={mode}: {N*ITER/dt:.0f} env-steps/s, {dt/ITER*1000:.1f} ms/iter")
env.close()
