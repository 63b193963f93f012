import time, sys, numpy as np, jax, jax.numpy as jnp
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
from rainbow_tpu.train import learner_round

cfg = rainbow_tpu.canonical(num_envs=256)
A = 6
agent = ag.init_agent(jax.random.key(0), cfg, A)
rep = rp.init_replay(256, cfg.capacity_per_env, cfg.frame_size)
for learns in (1, 8, 64):
    a2, r2, loss = learner_round(agent, rep, cfg, A, learns,
                                 np.float32(0.5), jax.random.key(1))
    jax.block_until_ready(loss)
    # donation: keep a fresh chain
    st = (a2, r2)
    t0 = time.perf_counter()
    M = 10
    for i in range(M):
        a2, r2, loss = learner_round(a2, r2, cfg, A, learns,
                                     np.float32(0.5), jax.random.key(i+2))
    jax.block_until_ready(loss)
    dt = (time.perf_counter()-t0)/M
    print(f"learns={learns}: {dt*1000:.2f} ms/round, {learns/dt:.0f} updates/s")
    agent = ag.init_agent(jax.random.key(0), cfg, A)
    rep = rp.init_replay(256, cfg.capacity_per_env, cfg.frame_size)
