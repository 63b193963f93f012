import time, sys, numpy as np, jax, jax.numpy as jnp
from collections import deque
from concurrent.futures import ThreadPoolExecutor
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import (actor_step_delta, pack_delta, pack_resets,
    learner_round, init_framestack, to_network_input)
from rainbow_tpu.envs.engine import BatchedEnv

LEARNS = int(sys.argv[1])
cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
env = BatchedEnv("pong", 256, seed=1)
N, A = 256, env.action_space
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
stack = init_framestack(N, cfg.history_length, jnp.asarray(env.reset_all()))
actions = ag.act(agent.params, cfg, A, to_network_input(stack), agent.noise_key)
queue = deque([actions]*2)
pool = ThreadPoolExecutor(1)
floor = [0]; num_cells = N*84*84

def step_args(a_np):
    counts, dpos, dval, resets, rewards, dones, kinds = env.step_delta(a_np)
    packed, ridx = pack_resets(resets, kinds)
    ppos, pval = pack_delta(dpos, dval, min_bucket=floor[0])
    floor[0] = max(floor[0], min(2*dpos.shape[0], num_cells//3))
    return True, (jnp.asarray(counts), jnp.asarray(ppos), jnp.asarray(pval),
                  jnp.asarray(packed), jnp.asarray(ridx), jnp.asarray(rewards),
                  jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))

pending_a = queue.popleft(); queue.append(pending_a)
fut = pool.submit(step_args, np.asarray(pending_a))
loop_key = jax.random.key(7)
ITER = 60
for it in range(1, ITER+20+1):
    if it == 21:
        jax.block_until_ready(stack); t_start = time.perf_counter()
    is_d, tail = fut.result()
    a_exec = pending_a
    pending_a = queue.popleft()
    pa_np = np.asarray(pending_a)
    fut = pool.submit(step_args, pa_np)
    agent = ag.reset_noise(agent)
    a_new, stack, rep = actor_step_delta(agent.params, agent.noise_key,
        cfg, A, stack, rep, a_exec, *tail)
    a_new.copy_to_host_async()
    queue.append(a_new)
    if LEARNS:
        loop_key, k = ag.split2(loop_key)
        agent, rep, loss = learner_round(agent, rep, cfg, A, LEARNS,
                                         np.float32(0.5), k)
jax.block_until_ready(stack)
dt = time.perf_counter()-t_start
print(f"learns={LEARNS}: {256*ITER/dt:.0f} env-steps/s, {dt/ITER*1000:.1f} ms/iter")
fut.result(); env.close(); pool.shutdown()
