"""Dynamics tests for the catalogue batch-2 native games (games2.cc).

Mirrors the per-game behavior-test style of tests/test_engine.py: every game
must register with its ALE minimal action set, render something, produce
reward under play, and (where it has lives) emit life-loss (kind 1) and full
(kind 2) resets in training mode — the semantics the reference's env wrapper
exposes (reference env.py:69-77)."""
import numpy as np
import pytest

from rainbow_tpu.envs.engine import GAMES, BatchedEnv, game_probe

NEW_GAMES = {
    "ms_pacman": 9, "asteroids": 14, "seaquest": 18, "kangaroo": 18,
    "crazy_climber": 9, "frostbite": 18, "demon_attack": 6, "gopher": 8,
}


def test_catalogue_size_and_registration():
    assert len(GAMES) >= 12
    for g in NEW_GAMES:
        assert g in GAMES


@pytest.mark.parametrize("game,n_act", sorted(NEW_GAMES.items()))
def test_action_space_render_and_determinism(game, n_act):
    env_a = BatchedEnv(game, num_envs=2, seed=11, n_threads=1)
    env_b = BatchedEnv(game, num_envs=2, seed=11, n_threads=2)
    assert env_a.action_space == n_act
    fa, fb = env_a.reset_all(), env_b.reset_all()
    assert fa.shape == (2, 84, 84) and fa.max() > 0
    np.testing.assert_array_equal(fa, fb)
    rng = np.random.default_rng(1)
    for _ in range(40):
        acts = rng.integers(0, n_act, 2)
        oa, _, ra, da, ka = env_a.step(acts)
        ob, _, rb, db, kb = env_b.step(acts.copy())
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(ra, rb)
    env_a.close()
    env_b.close()


@pytest.mark.parametrize("game", sorted(NEW_GAMES))
def test_random_play_scores_and_terminates(game):
    """Random play must both score and reach terminals — a game where random
    play never scores (or never ends) can't anchor a random-policy baseline
    (reference test.py eval protocol)."""
    n_act = NEW_GAMES[game]
    env = BatchedEnv(game, num_envs=8, seed=3, training=True)
    env.reset_all()
    rng = np.random.default_rng(0)
    total, fulls = 0.0, 0
    for _ in range(2500):
        _, _, r, d, k = env.step(rng.integers(0, n_act, 8))
        total += r.sum()
        fulls += int((k == 2).sum())
    env.close()
    assert total > 0, f"{game}: random play never scored"
    assert fulls > 0, f"{game}: no full game-over reset in 10k frames/env"


@pytest.mark.parametrize("game", ["ms_pacman", "asteroids", "seaquest",
                                  "kangaroo", "crazy_climber", "frostbite",
                                  "demon_attack", "gopher"])
def test_life_loss_pseudo_terminals_training_only(game):
    """All batch-2 games carry lives, so training mode must emit kind-1
    life-loss resets and eval mode must not (reference env.py:70 gate)."""
    n_act = NEW_GAMES[game]

    def kinds(training):
        env = BatchedEnv(game, num_envs=8, seed=5, training=training)
        env.reset_all()
        rng = np.random.default_rng(2)
        seen = set()
        for _ in range(2500):
            _, _, _, _, k = env.step(rng.integers(0, n_act, 8))
            seen.update(np.unique(k).tolist())
        env.close()
        return seen

    assert 1 in kinds(True), f"{game}: no life-loss reset in training mode"
    assert 1 not in kinds(False), f"{game}: life-kind reset leaked into eval"


def test_mspacman_pellets_reward_on_motion():
    """Holding RIGHT from spawn eats pellets along the corridor: determinate
    small rewards, no deaths in the first steps."""
    env = BatchedEnv("ms_pacman", num_envs=1, seed=1)
    env.reset_all()
    total = 0.0
    for _ in range(12):
        _, _, r, d, _ = env.step(np.array([2]))  # RIGHT
        total += float(r[0])
        assert not d[0]
    env.close()
    assert total >= 10.0  # ate at least one pellet


def test_asteroids_fire_scores():
    """Spray-firing while rotating must hit rocks far more often than
    NOOP-ing (which should score nothing)."""
    def run(action_pool):
        env = BatchedEnv("asteroids", num_envs=4, seed=9)
        env.reset_all()
        rng = np.random.default_rng(3)
        total = 0.0
        for _ in range(800):
            acts = rng.choice(action_pool, 4)
            _, _, r, _, _ = env.step(acts)
            total += r[r > 0].sum()
        env.close()
        return total

    assert run(np.array([8, 9, 10])) > 0        # rotate+fire scores
    assert run(np.array([0])) == 0.0            # passive scores nothing


def test_seaquest_oxygen_runs_out():
    """Sitting submerged and passive must eventually cost a life (oxygen),
    visible as a kind-1 reset in training mode."""
    env = BatchedEnv("seaquest", num_envs=2, seed=4, training=True)
    env.reset_all()
    for _ in range(40):  # dive
        env.step(np.array([5, 5]))
    kinds = set()
    for _ in range(1200):
        _, _, _, _, k = env.step(np.array([0, 0]))
        kinds.update(k.tolist())
        if 1 in kinds:
            break
    env.close()
    assert 1 in kinds, "oxygen exhaustion never cost a life"


def test_crazy_climber_up_scores():
    """Climbing UP earns progress reward; loitering does not."""
    up = game_probe("crazy_climber", seed=2, actions=np.zeros(0, np.int32))
    assert up.max() > 0  # raw screen renders
    env = BatchedEnv("crazy_climber", num_envs=2, seed=2)
    env.reset_all()
    total_up = 0.0
    for _ in range(200):
        _, _, r, _, _ = env.step(np.array([1, 1]))  # UP
        total_up += r.sum()
    env.close()
    assert total_up > 0


def test_frostbite_hopping_scores_and_drowning_costs_life():
    env = BatchedEnv("frostbite", num_envs=8, seed=6, training=True)
    env.reset_all()
    rng = np.random.default_rng(5)
    total, life = 0.0, 0
    for _ in range(1500):
        # Mostly hop down/up: exercises floe landings and drownings.
        acts = rng.choice(np.array([0, 2, 3, 4, 5]), 8)
        _, _, r, _, k = env.step(acts)
        total += r[r > 0].sum()
        life += int((k == 1).sum())
    env.close()
    assert total > 0, "no floe-visit reward"
    assert life > 0, "no drowning life losses"


def test_gopher_whack_scores():
    """FIRE-spamming near the carrots scores whacks; the gopher stealing all
    three carrots ends the game (kind-2)."""
    env = BatchedEnv("gopher", num_envs=4, seed=7, training=True)
    env.reset_all()
    rng = np.random.default_rng(6)
    total, fulls = 0.0, 0
    for _ in range(2500):
        acts = rng.choice(np.array([1, 3, 4, 6, 7]), 4)  # move + fire
        _, _, r, _, k = env.step(acts)
        total += r[r > 0].sum()
        fulls += int((k == 2).sum())
    env.close()
    assert total > 0
    assert fulls > 0
