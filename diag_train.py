import time
import rainbow_tpu
from rainbow_tpu.train import Trainer
cfg = rainbow_tpu.canonical(num_envs=256, per_env_noise=True,
    pipeline_actor=True, pipeline_depth=2, delta_uploads=True,
    total_steps=200_000, learn_start=5_000, evaluation_interval=150_000,
    evaluation_episodes=4, evaluation_size=50,
    results_dir="/tmp/diag_train", run_id="probe", memory_capacity=100_000)
tr = Trainer(cfg)
t0 = time.perf_counter()
tr.run()
dt = time.perf_counter() - t0
print(f"end-to-end: {cfg.total_steps/dt:.0f} env-steps/s ({dt:.1f}s)")
