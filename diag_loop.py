import time, numpy as np, jax, jax.numpy as jnp
import rainbow_tpu
from rainbow_tpu import agent as ag, replay as _
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import (actor_step, learner_round, init_framestack,
                               to_network_input)

cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
A = 6
N = cfg.num_envs
key = jax.random.key(0)
agent = ag.init_agent(key, cfg, A)
rep = rp.init_replay(N, cfg.capacity_per_env, cfg.frame_size)
print("capacity_per_env", cfg.capacity_per_env)
stack = init_framestack(N, cfg.history_length,
                        jnp.zeros((N, 84, 84), jnp.uint8))
obs = jnp.zeros((N, 84, 84), jnp.uint8)
rewards = jnp.zeros((N,)); dones = jnp.zeros((N,), bool)
kinds = jnp.zeros((N,), jnp.uint8)
prev_a = jnp.zeros((N,), jnp.int32)
reset_frames = jnp.zeros_like(obs)

# warm both
a, stack, rep = actor_step(agent.params, agent.noise_key, cfg, A, stack, rep,
                           prev_a, obs, reset_frames, rewards, dones, kinds)
agent2, rep, loss = learner_round(agent, rep, cfg, A, 64, jnp.float32(0.5),
                                  jax.random.key(1))
jax.block_until_ready((a, loss))

def timeit(name, fn, iters=20):
    t0 = time.perf_counter(); out = None
    for i in range(iters):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms/iter")
    return dt

# actor only
timeit("actor_step", lambda i: actor_step(agent.params, agent.noise_key, cfg,
       A, stack, rep, prev_a, obs, reset_frames, rewards, dones, kinds)[0])
# learner only (no donation reuse issues: rebind rep each time)
state = {"agent": agent, "rep": rep}
def learn_once(i):
    state["agent"], state["rep"], loss = learner_round(
        state["agent"], state["rep"], cfg, A, 64, jnp.float32(0.5),
        jax.random.key(i))
    return loss
timeit("learner_round(64)", learn_once, iters=10)
# reset_noise
timeit("reset_noise", lambda i: ag.reset_noise(state["agent"]).noise_key)
