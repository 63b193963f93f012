import time, numpy as np, jax, jax.numpy as jnp
import rainbow_tpu
from rainbow_tpu import agent as ag
import rainbow_tpu.replay.prioritized as rp
cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True)
agent = ag.init_agent(jax.random.key(0), cfg, 6)
a = ag.reset_noise(agent)
jax.block_until_ready(a.noise_key)
t0 = time.perf_counter()
for _ in range(50):
    a = ag.reset_noise(a)
jax.block_until_ready(a.noise_key)
print("reset_noise:", (time.perf_counter()-t0)/50*1000, "ms")
t0 = time.perf_counter()
for _ in range(10):
    a = ag.update_target(a)
jax.block_until_ready(a.target_params)
print("update_target:", (time.perf_counter()-t0)/10*1000, "ms")
