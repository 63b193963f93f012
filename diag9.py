import time, sys, numpy as np, jax, jax.numpy as jnp
from collections import deque
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import train_iter_delta, init_framestack

mode = sys.argv[1]
LEARNS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
A = 6; N = 256; KP = 16384
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
stack = init_framestack(N, cfg.history_length, jnp.zeros((N,84,84), jnp.uint8))
lk = jax.random.key(7)
np_counts = np.full((N,), KP//N, np.int32)
np_dpos = np.zeros((KP,), np.uint16); np_dval = np.zeros((KP,), np.uint8)
np_packed = np.zeros((0,84,84), np.uint8); np_ridx = np.zeros((0,), np.int32)
np_rewards = np.zeros((N,), np.float32); np_dones = np.zeros((N,), bool)
np_kinds = np.zeros((N,), np.uint8)
dev = [jnp.asarray(x) for x in (np_counts, np_dpos, np_dval, np_packed,
                                np_ridx, np_rewards, np_dones, np_kinds)]
actions = jnp.zeros((N,), jnp.int32)
queue = deque([actions]*2)
def one(i):
    global agent, rep, stack, lk, actions
    if mode in ("up", "both"):
        tail = [jnp.asarray(x) for x in (np_counts, np_dpos, np_dval,
                np_packed, np_ridx, np_rewards, np_dones, np_kinds)]
    else:
        tail = dev
    a_exec = queue.popleft()
    if mode in ("fetch", "both"):
        np.asarray(a_exec)
    a_new, agent, stack, rep, lk, loss = train_iter_delta(
        cfg, A, LEARNS, agent, stack, rep, lk,
        a_exec if mode != "const" else actions, *tail,
        np.float32(0.5), np.bool_(False))
    if mode in ("copy", "both"):
        a_new.copy_to_host_async()
    queue.append(a_new if mode != "const" else actions)
for i in range(5): one(i)
jax.block_until_ready(stack)
t0 = time.perf_counter(); M = 40
for i in range(M): one(i)
jax.block_until_ready(stack)
print(f"mode={mode}: {(time.perf_counter()-t0)/M*1000:.2f} ms/iter")
