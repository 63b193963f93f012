import time, jax
k = jax.random.key(0)
jf = jax.jit(lambda k: jax.random.fold_in(k, 1))
js = jax.jit(lambda k: tuple(jax.random.split(k)))
jf(k); js(k)
for name, fn in [("jit fold_in", jf), ("jit split", js)]:
    t0 = time.perf_counter()
    kk = k
    for _ in range(50):
        out = fn(kk)
        kk = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(kk)
    print(name, f"{(time.perf_counter()-t0)/50*1000:.2f} ms")
t0 = time.perf_counter()
kk = k
for _ in range(5):
    kk = jax.random.fold_in(kk, 1)
jax.block_until_ready(kk)
print("eager fold_in", f"{(time.perf_counter()-t0)/5*1000:.2f} ms")
