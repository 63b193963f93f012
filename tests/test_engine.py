"""Tests for the C++ batched environment engine and its contract."""
import numpy as np
import pytest

from rainbow_tpu.envs.engine import GAMES, BatchedEnv


@pytest.fixture(scope="module")
def pong():
    env = BatchedEnv("pong", num_envs=4, seed=7, n_threads=2)
    yield env
    env.close()


def test_games_register_and_action_spaces():
    for game, n_act in [("pong", 6), ("breakout", 4), ("space_invaders", 6),
                        ("freeway", 3), ("qbert", 6), ("boxing", 18)]:
        env = BatchedEnv(game, num_envs=2, seed=1)
        assert env.action_space == n_act
        f = env.reset_all()
        assert f.shape == (2, 84, 84) and f.dtype == np.uint8
        assert f.max() > 0  # something rendered
        env.close()


def test_unknown_game_raises():
    with pytest.raises(ValueError):
        BatchedEnv("qbert_not_built", num_envs=1, seed=0)


def test_step_shapes_and_determinism(pong):
    rng = np.random.default_rng(0)
    env_a = BatchedEnv("pong", num_envs=3, seed=42, n_threads=1)
    env_b = BatchedEnv("pong", num_envs=3, seed=42, n_threads=2)
    fa, fb = env_a.reset_all(), env_b.reset_all()
    np.testing.assert_array_equal(fa, fb)
    for _ in range(50):
        acts = rng.integers(0, 6, 3)
        oa, rsa, ra, da, ka = env_a.step(acts)
        ob_, rsb, rb, db, kb = env_b.step(acts.copy())
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_array_equal(da, db)
        np.testing.assert_array_equal(ka, kb)
        np.testing.assert_array_equal(oa, ob_)
        # reset frames are only defined where a reset occurred
        np.testing.assert_array_equal(rsa[ka > 0], rsb[kb > 0])
    env_a.close()
    env_b.close()


def test_pong_oracle_bounds():
    """The game must be winnable like real ALE pong (reference curves reach
    +19..21, reference README.md:7) yet not trivial: the built-in
    perfect-information oracle pins the score bound from above, random play
    from below. Round 3's CPU paddle (continuous full-rate tracking) capped
    the oracle at +4 — every learned curve was capped with it."""
    from rainbow_tpu.envs.engine import oracle_run

    step_scores = oracle_run("pong", seed=7, episodes=10)
    assert step_scores.mean() >= 12.0, step_scores
    frame_scores = oracle_run("pong", seed=7, episodes=5, frame_granular=True)
    assert frame_scores.mean() >= 19.0, frame_scores

    env = BatchedEnv("pong", num_envs=8, seed=11, training=False)
    env.reset_all()
    rng = np.random.default_rng(0)
    totals, current = [], np.zeros(8)
    for _ in range(2500):
        _, _, r, d, _ = env.step(rng.integers(0, 6, 8))
        current += r
        for i in np.nonzero(d)[0]:
            totals.append(current[i])
            current[i] = 0.0
    env.close()
    assert totals and np.mean(totals) <= -12.0, np.mean(totals)


def test_breakout_oracle_bound():
    """Breakout's scripted oracle must clear walls (reference-scale scores
    are in the hundreds): pins that the stand-in has no hidden ceiling."""
    from rainbow_tpu.envs.engine import oracle_run

    scores = oracle_run("breakout", seed=3, episodes=3)
    assert scores.mean() >= 300.0, scores


def test_maze_game_oracle_bounds():
    """The four round-4 below-random suite games (plus marginal seaquest)
    must allow scores decisively above their measured random baselines
    (docs/results_r4/suite_100k/sweep.md): the perfect-information oracles
    pin the dynamics bound from above. Round 4's bank_heist was flat 0.0
    because bank 3 sat inside a wall tile (unreachable under the <8px
    pickup radius); alien allowed a +150/frame respawn-camp farm. Both are
    fixed and these floors pin them fixed. Budgets are shortened from the
    full 108k-frame episode for test wall-time; bounds scale with budget."""
    from rainbow_tpu.envs.engine import oracle_run

    # (game, frame budget, required mean, measured random baseline)
    cases = [
        ("bank_heist", 12_000, 8_000.0, 160.0),
        ("alien", 12_000, 4_000.0, 989.0),
        ("hero", 12_000, 40_000.0, 2_043.5),
        ("ms_pacman", 12_000, 15_000.0, 884.0),
        ("seaquest", 12_000, 400.0, 155.0),
    ]
    for game, budget, floor, rand in cases:
        scores = oracle_run(game, seed=3, episodes=3, max_frames=budget)
        assert scores.mean() >= floor, (game, scores)
        assert floor > 2 * rand, (game, floor, rand)


def test_pong_scores_eventually():
    """Random play in pong must produce nonzero reward (cpu scores)."""
    env = BatchedEnv("pong", num_envs=8, seed=3)
    env.reset_all()
    rng = np.random.default_rng(1)
    total = 0.0
    for _ in range(600):
        _, _, r, _, _ = env.step(rng.integers(0, 6, 8))
        total += np.abs(r).sum()
    assert total > 0
    env.close()


def test_boxing_two_sided_rewards_and_clock():
    """Boxing: the opponent AI lands punches on a passive player (negative
    rewards); an approach-and-punch script lands positive ones; the bout
    ends on the 2-minute clock with a full reset."""
    env = BatchedEnv("boxing", num_envs=4, seed=5)
    env.reset_all()
    neg = 0.0
    for _ in range(400):  # passive: NOOP
        _, _, r, _, _ = env.step(np.zeros(4, np.int64))
        neg += r[r < 0].sum()
    assert neg < 0, "opponent never landed a punch"

    pos = 0.0
    rng = np.random.default_rng(2)
    for _ in range(600):  # aggressive: random directional punches
        _, _, r, _, _ = env.step(rng.integers(10, 18, 4))
        pos += r[r > 0].sum()
    assert pos > 0, "player never landed a punch"
    env.close()

    env = BatchedEnv("boxing", num_envs=2, seed=9, max_episode_length=2000)
    env.reset_all()
    kinds = set()
    for _ in range(600):  # 600 agent steps x4 frames > 2000-frame cap
        _, _, _, _, k = env.step(np.zeros(2, np.int64))
        kinds.update(k.tolist())
    assert 2 in kinds, "bout never ended within the frame cap"
    env.close()


def _boxing_player_centroid(screen):
    """(y, x) centroid of the bright (255) player pixels inside the ring
    interior — excludes the bright ropes (rows 48-49/180-181, cols 20-21/
    138-139) and the score pips (row 14)."""
    interior = screen[52:178, 26:134]
    ys, xs = np.nonzero(interior == 255)
    assert len(ys) > 0, "player not found in ring interior"
    return ys.mean() + 52, xs.mean() + 26


@pytest.mark.parametrize("action", [3, 10, 11, 12])
def test_boxing_fire_actions_keep_their_direction(action):
    """ALE 18-action layout: 10-17 are the 8 directions WITH fire and must
    move exactly like their no-fire counterparts 2-9 (regression test for a
    decode that mapped 10 UPFIRE onto the no-direction slot and shifted every
    directional fire one slot early — e.g. 11 RIGHTFIRE moved UP)."""
    from rainbow_tpu.envs.engine import game_probe
    n = 40
    before = game_probe("boxing", seed=3, actions=np.zeros(0, np.int32))
    after = game_probe("boxing", seed=3,
                       actions=np.full(n, action, np.int32))
    y0, x0 = _boxing_player_centroid(before)
    y1, x1 = _boxing_player_centroid(after)
    # Direction slots: 2 UP, 3 RIGHT, 4 LEFT, 5 DOWN, 6 UPRIGHT, 7 UPLEFT,
    # 8 DOWNRIGHT, 9 DOWNLEFT; 10-17 the same with FIRE.
    moves = {2: (0, -1), 3: (1, 0), 4: (-1, 0), 5: (0, 1), 6: (1, -1),
             7: (-1, -1), 8: (1, 1), 9: (-1, 1)}
    dir_slot = action - 8 if action >= 10 else action
    ex, ey = moves[dir_slot]
    if ex:
        assert (x1 - x0) * ex > 10, f"action {action}: expected x sign {ex}"
    else:
        assert abs(x1 - x0) < 12, f"action {action}: unexpected x drift"
    if ey:
        assert (y1 - y0) * ey > 10, f"action {action}: expected y sign {ey}"
    else:
        assert abs(y1 - y0) < 12, f"action {action}: unexpected y drift"


def test_boxing_fire_direction_pairs_match():
    """Every FIRE+direction action (10-17) lands the player at the same
    position as its plain-direction twin (2-9) under an opponent-free probe
    horizon; in particular DOWNLEFT+FIRE (17) is reachable and moves
    down-left."""
    from rainbow_tpu.envs.engine import game_probe
    n = 12  # short horizon: before the opponent can close distance and stun
    for fire_a in range(10, 18):
        plain_a = fire_a - 8
        sf = game_probe("boxing", seed=11,
                        actions=np.full(n, fire_a, np.int32))
        sp = game_probe("boxing", seed=11,
                        actions=np.full(n, plain_a, np.int32))
        yf, xf = _boxing_player_centroid(sf)
        yp, xp = _boxing_player_centroid(sp)
        # Fire extends the arm sprite, shifting the bright centroid slightly;
        # the torso position must match within that sprite delta.
        assert abs(xf - xp) < 6 and abs(yf - yp) < 6, (
            f"fire action {fire_a} diverged from direction {plain_a}: "
            f"({xf:.1f},{yf:.1f}) vs ({xp:.1f},{yp:.1f})")


def test_breakout_life_loss_training_vs_eval():
    """Training mode: life loss → done with reset_kind 1 (stack kept);
    eval mode: only true game over terminates (reference env.py:69-85)."""
    def run(training):
        env = BatchedEnv("breakout", num_envs=4, seed=5, training=training)
        env.reset_all()
        rng = np.random.default_rng(2)
        kinds, dones = [], 0
        for _ in range(800):
            _, _, _, d, k = env.step(rng.integers(0, 4, 4))
            kinds.extend(k[d == 1].tolist())
            dones += int(d.sum())
        env.close()
        return kinds, dones

    train_kinds, train_dones = run(True)
    assert train_dones > 0
    assert 1 in train_kinds  # life-loss pseudo-terminals occur
    eval_kinds, _ = run(False)
    assert 1 not in eval_kinds  # eval never emits life-kind resets


def test_qbert_life_mechanics():
    """Qbert has real lives: training mode must emit life-loss (kind 1) and
    full (kind 2) resets, and random play must score (25/cube)."""
    env = BatchedEnv("qbert", num_envs=4, seed=5, training=True)
    env.reset_all()
    rng = np.random.default_rng(0)
    total, life, full = 0.0, 0, 0
    for _ in range(2000):
        _, _, r, d, k = env.step(rng.integers(0, 6, 4))
        total += r.sum()
        life += int((k == 1).sum())
        full += int((k == 2).sum())
    env.close()
    assert total > 0
    assert life > 0 and full > 0


def test_pong_has_no_life_terminals():
    """Pong reports lives()==0, so the lives>0 guard must keep life-loss
    logic inert (reference env.py:72)."""
    env = BatchedEnv("pong", num_envs=4, seed=9, training=True)
    env.reset_all()
    rng = np.random.default_rng(3)
    for _ in range(2000):
        _, _, _, d, k = env.step(rng.integers(0, 6, 4))
        assert np.all(k[d == 0] == 0)
        assert np.all(k[d == 1] == 2)  # only full resets
    env.close()


def test_max_episode_length_forces_reset():
    env = BatchedEnv("space_invaders", num_envs=2, seed=11,
                     max_episode_length=400, training=False)
    env.reset_all()
    done_seen = False
    for _ in range(200):  # 200 agent steps ≥ 400 raw frames guaranteed
        _, _, _, d, k = env.step(np.zeros(2, np.int64))
        if d.any():
            done_seen = True
            assert np.all(k[d == 1] == 2)
    assert done_seen
    env.close()


def test_resize_matches_cv2_bilinear():
    """The engine's bilinear 210x160->84x84 resize must match
    cv2.INTER_LINEAR (reference env.py:28) to within cv2's fixed-point
    rounding (±1 grey level)."""
    cv2 = pytest.importorskip("cv2")
    from rainbow_tpu.envs.engine import resize_bilinear
    rng = np.random.default_rng(0)
    for _ in range(3):
        img = rng.integers(0, 256, (210, 160), np.uint8)
        ours = resize_bilinear(img).astype(int)
        want = cv2.resize(img, (84, 84),
                          interpolation=cv2.INTER_LINEAR).astype(int)
        assert np.abs(ours - want).max() <= 1
    # constant image resizes to the same constant exactly
    const = np.full((210, 160), 137, np.uint8)
    np.testing.assert_array_equal(resize_bilinear(const), 137)


def test_pool_resize_order_matches_reference():
    """The two-frame observation pooling must resize each raw frame FIRST and
    max-pool the resized pair (reference env.py:60-67) — not resize(max(a,b)),
    which differs under bilinear on moving-object frame pairs (round-3
    verdict weak #3)."""
    from rainbow_tpu.envs.engine import pool_resize, resize_bilinear

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (210, 160), np.uint8)
    b = rng.integers(0, 256, (210, 160), np.uint8)
    got = pool_resize(a, b)
    want = np.maximum(resize_bilinear(a), resize_bilinear(b))
    np.testing.assert_array_equal(got, want)
    # ...and the rejected order really is different (the test has teeth)
    other = resize_bilinear(np.maximum(a, b))
    assert (got != other).any()
