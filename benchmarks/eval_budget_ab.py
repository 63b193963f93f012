"""Eval-budget A/B: does the suite's 8k-frame eval cap flip any
above-random verdict vs the reference's full 108k-frame episodes
(reference main.py:27 --max-episode-length, env.py:14)?

Two halves:

1. (this script, CPU-only) Measure the random-policy baseline at BOTH
   budgets for the requested games. For games whose rewards are strictly
   nonnegative (every suite game except pong, games.cc:85), a frozen
   policy's per-episode return is MONOTONE in the cap — extending the cap
   leaves the trajectory prefix identical and can only add nonnegative
   reward. Hence if random@108k stays below the committed agent-best@8k,
   the above-random verdict cannot flip at the reference budget, without
   retraining anything.

2. (TPU, `python -m rainbow_tpu.sweep --max-episode-length 108000
   --games <marginal rows>`) Direct B-arm runs for any game where the
   margin is too thin for half 1 to settle it.

Run:  python benchmarks/eval_budget_ab.py [game ...]
Writes docs/results_r5/eval_budget_ab.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rainbow_tpu import config as cfg_mod          # noqa: E402
from rainbow_tpu.sweep import random_policy_baseline  # noqa: E402

DEFAULT_GAMES = ["bank_heist", "ms_pacman", "alien", "hero", "seaquest"]


def main(games):
    out = {}
    for game in games:
        cfg = cfg_mod.PRESETS["data-efficient"](game=game)
        out[game] = {
            "random_8k": random_policy_baseline(
                cfg.replace(max_episode_length=8000)),
            "random_108k": random_policy_baseline(
                cfg.replace(max_episode_length=108000)),
        }
        print(game, out[game], flush=True)
    dest = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "results_r5", "eval_budget_ab.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_GAMES)
