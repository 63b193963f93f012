import time, numpy as np, jax, jax.numpy as jnp
arrs = [np.zeros((256,), np.int32), np.zeros((16384,), np.uint16),
        np.zeros((16384,), np.uint8), np.zeros((1,84,84), np.uint8),
        np.zeros((1,), np.int32), np.zeros((256,), np.float32),
        np.zeros((256,), bool), np.zeros((256,), np.uint8)]
# warm
outs = [jnp.asarray(a) for a in arrs]
jax.block_until_ready(outs)
t0 = time.perf_counter()
for i in range(30):
    outs = [jnp.asarray(a) for a in arrs]
jax.block_until_ready(outs)
print("8 puts:", (time.perf_counter()-t0)/30*1000, "ms/iter")
t0 = time.perf_counter()
for i in range(30):
    out = jnp.asarray(arrs[1])
jax.block_until_ready(out)
print("1 put 32KB:", (time.perf_counter()-t0)/30*1000, "ms")
