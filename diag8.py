import time, sys, numpy as np, jax, jax.numpy as jnp
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import (train_iter_packed, train_iter_delta,
                               init_framestack)

cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
A = 6; N = 256
def fresh():
    return (ag.init_agent(jax.random.key(0), cfg, A),
            rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size),
            init_framestack(N, cfg.history_length, jnp.zeros((N,84,84), jnp.uint8)),
            jax.random.key(7))
obs = jnp.zeros((N,84,84), jnp.uint8)
packed = jnp.zeros((0,84,84), jnp.uint8); ridx = jnp.zeros((0,), jnp.int32)
rewards = jnp.zeros((N,)); dones = jnp.zeros((N,), bool)
kinds = jnp.zeros((N,), jnp.uint8)
actions = jnp.zeros((N,), jnp.int32)
KP = 16384
counts = jnp.full((N,), KP//N, jnp.int32)
dpos = jnp.zeros((KP,), jnp.uint16); dval = jnp.zeros((KP,), jnp.uint8)

def run(name, fn, args, L, block_full):
    a2, rp2, st2, lk2 = fresh()
    for i in range(3):
        actions2, a2, st2, rp2, lk2, loss = fn(cfg, A, L, a2, st2, rp2, lk2,
            actions, *args, np.float32(0.5), np.bool_(False))
    jax.block_until_ready((st2, loss) if block_full else st2)
    t0 = time.perf_counter(); M = 30
    for i in range(M):
        actions2, a2, st2, rp2, lk2, loss = fn(cfg, A, L, a2, st2, rp2, lk2,
            actions, *args, np.float32(0.5), np.bool_(False))
    jax.block_until_ready((st2, loss, rp2.priorities) if block_full else st2)
    print(f"{name} learns={L} block_full={block_full}: "
          f"{(time.perf_counter()-t0)/M*1000:.2f} ms/iter")

run("packed", train_iter_packed, (obs, packed, ridx, rewards, dones, kinds), 64, True)
run("delta", train_iter_delta, (counts, dpos, dval, packed, ridx, rewards, dones, kinds), 64, True)
run("delta", train_iter_delta, (counts, dpos, dval, packed, ridx, rewards, dones, kinds), 0, True)
