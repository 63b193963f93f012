import time, sys, numpy as np, jax, jax.numpy as jnp
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import train_iter_packed, init_framestack, to_network_input

cap = int(sys.argv[1])
cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True,
                            memory_capacity=cap)
A = 6; N = 256
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
stack = init_framestack(N, cfg.history_length, jnp.zeros((N,84,84), jnp.uint8))
loop_key = jax.random.key(7)
obs = jnp.zeros((N,84,84), jnp.uint8)
packed = jnp.zeros((0,84,84), jnp.uint8); ridx = jnp.zeros((0,), jnp.int32)
rewards = jnp.zeros((N,)); dones = jnp.zeros((N,), bool)
kinds = jnp.zeros((N,), jnp.uint8)
actions = jnp.zeros((N,), jnp.int32)
for L in (0, 64):
    a2, st2, rp2, lk2 = agent, stack, rep, jax.random.key(7)
    for i in range(3):  # warm
        actions2, a2, st2, rp2, lk2, loss = train_iter_packed(
            cfg, A, L, a2, st2, rp2, lk2, actions, obs, packed, ridx,
            rewards, dones, kinds, np.float32(0.5), np.bool_(False))
    jax.block_until_ready(st2)
    t0 = time.perf_counter(); M = 30
    for i in range(M):
        actions2, a2, st2, rp2, lk2, loss = train_iter_packed(
            cfg, A, L, a2, st2, rp2, lk2, actions, obs, packed, ridx,
            rewards, dones, kinds, np.float32(0.5), np.bool_(False))
    jax.block_until_ready(st2)
    print(f"cap={cap} learns={L}: {(time.perf_counter()-t0)/M*1000:.1f} ms/iter")
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
    stack = init_framestack(N, cfg.history_length, jnp.zeros((N,84,84), jnp.uint8))
