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
N, A = cfg.num_envs, 6
env = BatchedEnv("pong", N, seed=1)
A = env.action_space
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
stack = init_framestack(N, cfg.history_length, jnp.asarray(env.reset_all()))
actions = ag.act(agent.params, cfg, A, to_network_input(stack), agent.noise_key)
queue = deque([actions]*2)
pool = ThreadPoolExecutor(1)
floor = [0]
num_cells = N*84*84

def step_args(a_np):
    counts, dpos, dval, resets, rewards, dones, kinds = env.step_delta(a_np)
    packed, ridx = pack_resets(resets, kinds)
    if counts is None:
        return False, (jnp.asarray(dpos), jnp.asarray(packed), jnp.asarray(ridx),
                       jnp.asarray(rewards), jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))
    ppos, pval = pack_delta(dpos, dval, min_bucket=floor[0])
    floor[0] = max(floor[0], min(2*dpos.shape[0], num_cells//3))
    return True, (jnp.asarray(counts), jnp.asarray(ppos), jnp.asarray(pval),
                  jnp.asarray(packed), jnp.asarray(ridx), jnp.asarray(rewards),
                  jnp.asarray(dones.astype(bool)), jnp.asarray(kinds))

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
pending_a = queue.popleft(); queue.append(pending_a)
fut = pool.submit(step_args, np.asarray(pending_a))
ITER = 100
phases = {"env":0.,"fetch":0.,"dispatch":0.,"learn":0.,"noise":0.}
t_start = None
for it in range(1, ITER+30+1):
    if it == 31:
        jax.block_until_ready(stack); t_start = time.perf_counter()
        for k in phases: phases[k] = 0.
    t0=time.perf_counter()
    is_d, tail = fut.result()
    t1=time.perf_counter(); phases["env"] += t1-t0
    a_exec = pending_a
    pending_a = queue.popleft()
    pa_np = np.asarray(pending_a)
    t2=time.perf_counter(); phases["fetch"] += t2-t1
    fut = pool.submit(step_args, pa_np)
    if mode in ("full","noise"):
        agent = ag.reset_noise(agent)
    t3=time.perf_counter(); phases["noise"] += t3-t2
    fn = actor_step_delta if is_d else actor_step_packed
    a_new, stack, rep = fn(agent.params, agent.noise_key, cfg, A, stack, rep, a_exec, *tail)
    a_new.copy_to_host_async()
    queue.append(a_new)
    t4=time.perf_counter(); phases["dispatch"] += t4-t3
    if mode == "full":
        agent, rep, loss = learner_round(agent, rep, cfg, A, 64,
                                         np.float32(0.5), jax.random.key(it))
    t5=time.perf_counter(); phases["learn"] += t5-t4
jax.block_until_ready(stack)
dt = time.perf_counter()-t_start
print(f"mode={mode}: {N*ITER/dt:.0f} env-steps/s, {dt/ITER*1000:.1f} ms/iter")
print({k: f"{v/ITER*1000:.2f}ms" for k,v in phases.items()})
fut.result(); env.close(); pool.shutdown()
