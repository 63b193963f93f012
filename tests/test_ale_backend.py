"""Real-ALE backend plumbing (envs/cpp/ale_backend.cc), exercised end-to-end
against the scripted libale_c stub (envs/cpp/ale_stub.cc).

Runs in a SUBPROCESS because ale_api() resolves the library once per process
(std::call_once): other tests in the suite may already have resolved it as
absent before RAINBOW_ALE_LIB is set."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP = os.path.join(REPO, "rainbow_tpu", "envs", "cpp")

CHILD = r'''
import ctypes, os
import numpy as np
from rainbow_tpu.envs.engine import BatchedEnv

stub = os.environ["RAINBOW_ALE_LIB"]
env = BatchedEnv("testrom", num_envs=2, seed=5)
# Minimal action set {0, 11, 12, 14} remapped to indices 0..3
# (reference env.py:19-20); read BEFORE any reset (regression: the engine
# queries num_actions at construction, so AleGame must lazily init).
assert env.action_space == 4, env.action_space

f = env.reset_all()
assert f.shape == (2, 84, 84) and f.max() > 0

# Config call parity with reference env.py:13-20: sticky actions off,
# no internal frameskip, no color averaging, per-env seed applied before
# the effective ROM load.
lib = ctypes.CDLL(stub)
lib.stub_config_log.restype = ctypes.c_char_p
log = lib.stub_config_log().decode()
assert "repeat=0.0" in log and "skip=0" in log and "avg=0" in log, log
assert log.split("rom=")[1].endswith("testrom.bin"), log
assert "seed=-1" not in log, log

# Minimal-action remap through the engine: the stub's reward echoes the RAW
# ALE action code, x4 for the action repeat.
_, _, r, _, _ = env.step(np.array([1, 3], np.int32))
assert abs(r[0] - 4 * 11) < 1e-6, r
assert abs(r[1] - 4 * 14) < 1e-6, r

# Training mode: lives 3->2 and 2->1 (episode frames 100/200) are life-loss
# pseudo-terminals (reset_kind 1); lives 1->0 trips the lives>0 guard (no
# pseudo-terminal, reference env.py:72); frame 400 is true game over (kind 2).
kinds = []
for _ in range(200):
    _, _, _, _, k = env.step(np.zeros(2, np.int32))
    kinds.append(k.copy())
kinds = np.stack(kinds)
assert (kinds == 1).any(), "no life-loss pseudo-terminal seen"
assert (kinds == 2).any(), "no true game-over reset seen"
env.close()

# Eval mode: life losses must NOT terminate (reference env.py:80-85).
env2 = BatchedEnv("testrom", num_envs=1, seed=9, training=False)
env2.reset_all()
kinds2 = []
for _ in range(80):  # 320+<=29 frames: 3 life drops, no game over
    _, _, _, _, k2 = env2.step(np.zeros(1, np.int32))
    kinds2.append(int(k2[0]))
assert 1 not in kinds2, kinds2
env2.close()
print("ALE-STUB OK")
'''


def test_ale_backend_against_stub(tmp_path):
    subprocess.run(["make", "-C", CPP, "ale_stub"], check=True,
                   capture_output=True)
    romdir = tmp_path / "roms"
    romdir.mkdir()
    (romdir / "testrom.bin").write_bytes(b"\x00\x01")
    env = dict(os.environ,
               RAINBOW_ALE_LIB=os.path.join(CPP, "libale_stub.so"),
               RAINBOW_ALE_ROM_DIR=str(romdir),
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "ALE-STUB OK" in r.stdout


def test_ale_unavailable_reports_unknown_game():
    """Without RAINBOW_ALE_LIB, unknown game names still raise cleanly."""
    child = ("from rainbow_tpu.envs.engine import BatchedEnv\n"
             "try:\n    BatchedEnv('no_such_rom', num_envs=1, seed=0)\n"
             "except ValueError:\n    print('RAISED OK')\n")
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("RAINBOW_ALE_LIB", None)
    env.pop("RAINBOW_ALE_ROM_DIR", None)
    r = subprocess.run([sys.executable, "-c", child], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert "RAISED OK" in r.stdout, r.stdout + "\n" + r.stderr
