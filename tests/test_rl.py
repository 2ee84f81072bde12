"""RL stack tests: models, replay buffer frame-stacking, GAE, learner
updates, rollout collection, evaluator metric semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdriveenv_tpu.models.cnn import NatureCNN
from torchdriveenv_tpu.models.policies import (
    DeterministicActor,
    DoubleQCritic,
    GaussianActorCritic,
    SquashedGaussianActor,
    gaussian_entropy,
    gaussian_log_prob,
    sample_squashed,
    scale_action,
    unscale_action,
)
from torchdriveenv_tpu.rl import buffer as replay
from torchdriveenv_tpu.rl.a2c import A2C, A2CConfig
from torchdriveenv_tpu.rl.ppo import PPO, PPOConfig, compute_gae
from torchdriveenv_tpu.rl.rollout import init_stack, update_stack
from torchdriveenv_tpu.rl.sac import SAC, SACConfig
from torchdriveenv_tpu.rl.td3 import TD3, TD3Config

K = jax.random.PRNGKey


class TestModels:
    def test_naturecnn_shapes(self):
        net = NatureCNN()
        obs = jnp.zeros((4, 9, 64, 64), jnp.uint8)
        params = net.init(K(0), obs)
        out = net.apply(params, obs)
        assert out.shape == (4, 512) and out.dtype == jnp.float32

    def test_action_scaling_roundtrip(self):
        a = jnp.array([[0.5, -0.25], [-1.0, 1.0]])
        np.testing.assert_allclose(unscale_action(scale_action(a)), a,
                                   atol=1e-6)
        # box bounds map to tanh bounds (reference gym_env.py:83-84)
        np.testing.assert_allclose(
            np.asarray(scale_action(jnp.array([1.0, 1.0]))), [1.0, 0.3],
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(scale_action(jnp.array([-1.0, -1.0]))), [-1.0, -0.3],
            atol=1e-6)

    def test_squashed_sample_logprob(self):
        mu = jnp.zeros((256, 2))
        log_std = jnp.zeros((256, 2))
        a, logp = sample_squashed(mu, log_std, K(1))
        assert np.abs(np.asarray(a)).max() < 1.0
        # against naive change-of-variables formula
        pre = jnp.arctanh(jnp.clip(a, -0.999999, 0.999999))
        naive = (-0.5 * pre ** 2 - 0.5 * jnp.log(2 * jnp.pi)).sum(-1) \
            - jnp.log(1 - a ** 2 + 1e-6).sum(-1)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(naive),
                                   atol=1e-2)

    def test_gaussian_logprob_entropy(self):
        mu = jnp.zeros((3, 2))
        log_std = jnp.zeros((3, 2))
        lp = gaussian_log_prob(mu, log_std, jnp.zeros((3, 2)))
        np.testing.assert_allclose(np.asarray(lp),
                                   -np.log(2 * np.pi), atol=1e-5)
        ent = gaussian_entropy(log_std[0])
        assert np.isclose(float(ent), 0.5 * 2 * np.log(2 * np.pi * np.e))

    def test_heads(self):
        obs = jnp.zeros((2, 9, 32, 32), jnp.uint8)
        act = jnp.zeros((2, 2))
        sga = SquashedGaussianActor()
        mu, ls = sga.apply(sga.init(K(0), obs), obs)
        assert mu.shape == (2, 2) and ls.shape == (2, 2)
        da = DeterministicActor()
        a = da.apply(da.init(K(1), obs), obs)
        assert a.shape == (2, 2) and np.abs(np.asarray(a)).max() <= 1.0
        qc = DoubleQCritic()
        q1, q2 = qc.apply(qc.init(K(2), obs, act), obs, act)
        assert q1.shape == (2,) and q2.shape == (2,)
        ac = GaussianActorCritic()
        mu, ls, v = ac.apply(ac.init(K(3), obs), obs)
        assert v.shape == (2,)


class TestBuffer:
    def _mk(self, e=2, n=8):
        return replay.create(e, n, (3, 4, 4))

    @staticmethod
    def _add(buf, frame, done, terminal, final=None, reward=None):
        e = frame.shape[0]
        return jax.jit(replay.add)(
            buf, frame, jnp.zeros((e, 2)),
            jnp.ones((e,)) if reward is None else reward,
            done, terminal,
            frame if final is None else final)

    def test_add_and_ring(self):
        buf = self._mk()
        f = jnp.ones((2, 3, 4, 4), jnp.uint8)
        no = jnp.zeros((2,), bool)
        for i in range(10):
            buf = self._add(buf, f * i, no, no)
        assert int(buf.pos) == 10 and int(buf.filled) == 8
        # ring wrapped: cell 0 holds frame 8, cell 1 holds frame 9
        assert int(buf.frames[0, 0, 0, 0, 0]) == 8
        assert int(buf.frames[0, 1, 0, 0, 0]) == 9

    def test_stack_respects_episode_boundary(self):
        buf = self._mk(e=1, n=16)
        # episode A: frames 1,2,3 (done at 3); episode B: frames 4,5
        for i, done in [(1, False), (2, False), (3, True), (4, False),
                        (5, False)]:
            f = jnp.full((1, 3, 4, 4), i, jnp.uint8)
            d = jnp.full((1,), done)
            buf = self._add(buf, f, d, d)
        # stack ending at cell 4 (frame 5, 2nd frame of episode B) must not
        # reach back into episode A: expect [4, 4, 5] repeated-padded
        s = replay._stack_at(buf, jnp.int32(0), jnp.int32(4), 3)
        vals = np.asarray(s)[::3, 0, 0]
        np.testing.assert_array_equal(vals, [4, 4, 5])
        # stack ending at cell 2 (frame 3) sees the full episode A
        s = replay._stack_at(buf, jnp.int32(0), jnp.int32(2), 3)
        np.testing.assert_array_equal(np.asarray(s)[::3, 0, 0], [1, 2, 3])

    def test_sample_shapes_and_discount(self):
        buf = self._mk(e=2, n=32)
        for i in range(20):
            done = jnp.full((2,), (i % 7) == 6)
            buf = self._add(buf, jnp.full((2, 3, 4, 4), i, jnp.uint8),
                            done, done)
        batch = jax.jit(replay.sample, static_argnums=(2, 3))(
            buf, K(0), 64, 3)
        assert batch["obs"].shape == (64, 9, 4, 4)
        assert batch["next_obs"].shape == (64, 9, 4, 4)
        assert batch["discount_mask"].shape == (64,)
        assert set(np.asarray(batch["discount_mask"]).tolist()) <= {0.0, 1.0}

    def test_truncation_bootstraps_with_final_obs(self):
        """SB3 handle_timeout_termination: a truncated (not terminated) cell
        keeps discount 1 and next_obs ends with the episode's true final
        frame, NOT the auto-reset successor episode's first frame."""
        buf = self._mk(e=1, n=16)
        no = jnp.zeros((1,), bool)
        yes = jnp.ones((1,), bool)
        f = lambda v: jnp.full((1, 3, 4, 4), v, jnp.uint8)
        buf = self._add(buf, f(1), no, no)
        buf = self._add(buf, f(2), no, no)
        # truncation at frame 3: the true final obs is 99 (never a cell)
        buf = self._add(buf, f(3), yes, no, final=f(99))
        # next episode starts with frame 50
        buf = self._add(buf, f(50), no, no)
        buf = self._add(buf, f(51), no, no)

        # cell 2 is the truncated transition
        e0 = jnp.zeros((4,), jnp.int32)
        idx = jnp.full((4,), 2, jnp.int32)
        n = buf.frames.shape[1]
        # reconstruct what sample() builds, pinned to cell 2
        obs = jax.vmap(replay._stack_at, in_axes=(None, 0, 0, None))(
            buf, e0, idx, 3)
        term_f = buf.term_frames[e0, buf.term_slot[e0, idx]]
        got = jnp.concatenate([obs[:, 3:], term_f], axis=1)
        vals = np.asarray(got)[0, ::3, 0, 0]
        # stack at cell 2 is [1,2,3] -> next_obs must be [2,3,99]
        np.testing.assert_array_equal(vals, [2, 3, 99])
        # and via the public sampler: every drawn truncated cell has
        # discount 1 and newest next frame 99; the terminal frame 50 (next
        # episode) never leaks in
        batch = jax.jit(replay.sample, static_argnums=(2, 3))(buf, K(3),
                                                              256, 3)
        done = np.asarray(batch["done"])
        disc = np.asarray(batch["discount_mask"])
        newest = np.asarray(batch["next_obs"])[:, 6, 0, 0]
        trunc_rows = done & (disc > 0.5)
        assert trunc_rows.any()
        np.testing.assert_array_equal(newest[trunc_rows], 99)
        # truncated (timeout) cells bootstrap: discount stays 1
        np.testing.assert_array_equal(disc[done], 1.0)

    def test_termination_zeroes_discount(self):
        buf = self._mk(e=1, n=16)
        no = jnp.zeros((1,), bool)
        yes = jnp.ones((1,), bool)
        f = lambda v: jnp.full((1, 3, 4, 4), v, jnp.uint8)
        for i in range(3):
            buf = self._add(buf, f(i), no, no)
        buf = self._add(buf, f(3), yes, yes)   # true termination
        for i in range(4, 8):
            buf = self._add(buf, f(i), no, no)
        batch = jax.jit(replay.sample, static_argnums=(2, 3))(buf, K(0),
                                                              256, 3)
        done = np.asarray(batch["done"])
        disc = np.asarray(batch["discount_mask"])
        assert done.any()
        np.testing.assert_array_equal(disc[done], 0.0)
        np.testing.assert_array_equal(disc[~done], 1.0)


class TestGAE:
    def test_matches_manual(self):
        # T=3, E=1, no dones
        r = jnp.array([[1.0], [1.0], [1.0]])
        v = jnp.array([[0.5], [0.5], [0.5]])
        d = jnp.zeros((3, 1), bool)
        last_v = jnp.array([0.5])
        gamma, lam = 0.9, 0.8
        adv, ret = compute_gae(r, v, d, last_v, gamma, lam)
        # manual backward recursion
        expect = np.zeros(3)
        a_next, v_next = 0.0, 0.5
        for t in [2, 1, 0]:
            delta = 1.0 + gamma * v_next - 0.5
            a = delta + gamma * lam * a_next
            expect[t] = a
            a_next, v_next = a, 0.5
        np.testing.assert_allclose(np.asarray(adv)[:, 0], expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ret), np.asarray(adv + v))

    def test_terminated_cuts_truncated_bootstraps(self):
        """SB3 on-policy timeout semantics: GAE cuts at every done, but a
        time-limit truncation first folds gamma*V(final_obs) into the reward
        (bootstrap_truncated_rewards); a real termination gets nothing."""
        from torchdriveenv_tpu.rl.ppo import bootstrap_truncated_rewards
        gamma, lam = 0.99, 0.95
        r = jnp.array([[0.0, 0.0], [0.0, 0.0]])
        v = jnp.array([[0.0, 0.0], [0.0, 0.0]])
        term = jnp.array([[True, False], [False, False]])
        trunc = jnp.array([[False, True], [False, False]])
        v_final = jnp.array([[7.0, 7.0], [0.0, 0.0]])
        r_boot = bootstrap_truncated_rewards(r, term, trunc, v_final, gamma)
        # env 0 terminated: no bootstrap; env 1 truncated: gamma * V(final)
        assert float(r_boot[0, 0]) == 0.0
        np.testing.assert_allclose(float(r_boot[0, 1]), gamma * 7.0)
        d = term | trunc
        adv, _ = compute_gae(r_boot, v, d, jnp.array([100.0, 100.0]),
                             gamma, lam)
        # done at step 0 cuts propagation from step 1 for both envs...
        assert float(adv[0, 0]) == 0.0
        # ...but the truncated env keeps the terminal value via the reward
        np.testing.assert_allclose(float(adv[0, 1]), gamma * 7.0)

    def test_onpolicy_rollout_bootstraps_truncation(self, assets_val):
        """Integration: a PPO train step near the 200-step horizon stores
        bootstrapped rewards (raw_reward + gamma*V(final_stack) where
        truncated & ~terminated) in the rollout it learns from."""
        from torchdriveenv_tpu.config import EnvConfig
        from torchdriveenv_tpu.parallel.train_step import \
            make_onpolicy_train_fns
        from torchdriveenv_tpu.rl.ppo import PPO, PPOConfig
        cfg = EnvConfig(max_environment_steps=3, reset_pool=0)
        cfg.simulator.renderer.obs_res = 16
        # terminations off so every episode reaches the 3-step truncation
        cfg.terminated_at_infraction = False
        agent = PPO(PPOConfig(n_steps=4, batch_size=8, n_epochs=1), 9)
        init_fn, train_fn = make_onpolicy_train_fns(cfg, agent, 2)
        carry = jax.jit(init_fn)(assets_val, K(0))
        captured = {}
        orig_update = agent.update

        def spy_update(state, rollout, last_value, key):
            captured["rollout"] = rollout
            return orig_update(state, rollout, last_value, key)

        agent.update = spy_update
        # run un-jitted so the spy captures concrete arrays (agent.update is
        # called outside the collection scan)
        carry, _ = train_fn(assets_val, carry)
        ro = jax.device_get(captured["rollout"])
        boosted = ro["reward"] - ro["raw_reward"]
        # exactly the truncated steps carry a bootstrap adjustment
        assert ro["done"].any(), "no truncation happened in 4 steps of T=3"
        assert (boosted[ro["done"]] != 0.0).all()
        assert (boosted[~ro["done"]] == 0.0).all()


class TestFrameStackOps:
    def test_init_and_update(self):
        obs = jnp.arange(2 * 3 * 2 * 2, dtype=jnp.uint8).reshape(2, 3, 2, 2)
        st = init_stack(obs, 3)
        assert st.shape == (2, 9, 2, 2)
        np.testing.assert_array_equal(np.asarray(st[:, :3]),
                                      np.asarray(st[:, 3:6]))
        new = obs + 100
        st2 = update_stack(st, new, jnp.array([False, True]))
        # env 0 shifted: newest slice is `new`, middle is old obs
        np.testing.assert_array_equal(np.asarray(st2[0, 6:]),
                                      np.asarray(new[0]))
        np.testing.assert_array_equal(np.asarray(st2[0, 3:6]),
                                      np.asarray(obs[0]))
        # env 1 (done) refilled with the new frame
        np.testing.assert_array_equal(np.asarray(st2[1, :3]),
                                      np.asarray(new[1]))
        np.testing.assert_array_equal(np.asarray(st2[1, 6:]),
                                      np.asarray(new[1]))


def _tiny_batch(n=8, res=16, c=9):
    k = K(42)
    return dict(
        obs=jax.random.randint(k, (n, c, res, res), 0, 255, jnp.uint8),
        action=jax.random.uniform(k, (n, 2), minval=-1, maxval=1),
        reward=jnp.ones((n,)),
        next_obs=jax.random.randint(K(1), (n, c, res, res), 0, 255,
                                    jnp.uint8),
        discount_mask=jnp.ones((n,)),
        done=jnp.zeros((n,), bool),
    )


class TestSACAlphaLoss:
    def test_sb3_gradient_form(self):
        """d/dlog_alpha of SB3's loss is -(logp + target_entropy) — NOT
        scaled by exp(log_alpha) (reference baseline: sb3 sac.py)."""
        from torchdriveenv_tpu.rl.sac import alpha_loss_sb3
        g = jax.grad(alpha_loss_sb3)(jnp.asarray(3.0), jnp.asarray(-1.5),
                                     -2.0)
        # independent of log_alpha's value; equals -(logp + H) = 3.5
        np.testing.assert_allclose(float(g), 3.5, atol=1e-6)
        g2 = jax.grad(alpha_loss_sb3)(jnp.asarray(-4.0), jnp.asarray(-1.5),
                                      -2.0)
        np.testing.assert_allclose(float(g2), 3.5, atol=1e-6)


@pytest.mark.slow
class TestLearningStarts:
    def test_warmup_skips_updates_then_learns(self, assets_val):
        """Until env_steps >= learning_starts, actions are random and no
        gradient updates run (SB3 off_policy_algorithm warmup)."""
        from torchdriveenv_tpu.config import EnvConfig
        from torchdriveenv_tpu.parallel.train_step import (
            make_offpolicy_train_fns,
        )

        cfg = EnvConfig(ego_only=True)
        cfg.simulator.renderer.obs_res = 32
        sac = SAC(SACConfig(batch_size=4, learning_starts=8))
        init_fn, train_fn = make_offpolicy_train_fns(
            cfg, sac, num_envs=2, buffer_capacity=64,
            steps_per_iter=2, updates_per_iter=1)
        carry = jax.jit(init_fn)(assets_val, K(0))
        step = jax.jit(train_fn)
        p0 = jax.tree.leaves(carry.agent_state.actor_params)[0].copy()

        # iter 1: env_steps 0 -> 4 (< 8): warmup, params frozen
        carry, m = step(assets_val, carry)
        p1 = jax.tree.leaves(carry.agent_state.actor_params)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        assert float(m["critic_loss"]) == 0.0
        # iter 2: env_steps 4 -> 8 (still < 8 at entry): warmup
        carry, m = step(assets_val, carry)
        p2 = jax.tree.leaves(carry.agent_state.actor_params)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p2))
        # iter 3: env_steps 8 at entry: learning begins
        carry, m = step(assets_val, carry)
        p3 = jax.tree.leaves(carry.agent_state.actor_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p3))
        assert np.isfinite(float(m["critic_loss"]))


class TestDemoWarmup:
    def test_scripted_driver_actions_in_box(self, assets_val):
        """rl/demo.py scripted driver: finite env-box actions on a reset
        batch (the demo-warmup buffer-seeding path)."""
        import functools
        from torchdriveenv_tpu.config import EnvConfig
        from torchdriveenv_tpu.env import core
        from torchdriveenv_tpu.rl.demo import make_scripted_driver

        cfg = EnvConfig()
        drv = make_scripted_driver(cfg, assets_val)
        states = jax.vmap(functools.partial(core.reset, cfg, assets_val))(
            jax.random.split(K(3), 6))
        a = np.asarray(jax.jit(drv)(states))
        assert a.shape == (6, 2)
        assert np.isfinite(a).all()
        assert (a[:, 0] >= -1.0 - 1e-6).all() and (a[:, 0] <= 1.0 + 1e-6).all()
        assert (np.abs(a[:, 1]) <= 0.3 + 1e-6).all()

    def test_demo_phase_feeds_buffer_and_learns(self, assets_val):
        """With demo_fn set, the demo phase replaces policy actions while
        gradient updates still begin at learning_starts."""
        from torchdriveenv_tpu.config import EnvConfig
        from torchdriveenv_tpu.parallel.train_step import (
            make_offpolicy_train_fns,
        )
        from torchdriveenv_tpu.rl.demo import make_scripted_driver

        cfg = EnvConfig(ego_only=True)
        cfg.simulator.renderer.obs_res = 32
        sac = SAC(SACConfig(batch_size=4, learning_starts=4))
        demo = make_scripted_driver(cfg, assets_val)
        init_fn, train_fn = make_offpolicy_train_fns(
            cfg, sac, num_envs=2, buffer_capacity=64,
            steps_per_iter=2, updates_per_iter=1,
            demo_fn=demo, demo_steps=12)
        carry = jax.jit(init_fn)(assets_val, K(0))
        step = jax.jit(train_fn)
        carry, m = step(assets_val, carry)          # warmup (no updates)
        p0 = jax.tree.leaves(carry.agent_state.actor_params)[0].copy()
        carry, m = step(assets_val, carry)          # demo phase, learning on
        p1 = jax.tree.leaves(carry.agent_state.actor_params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        assert np.isfinite(float(m["critic_loss"]))
        # demo actions landed in the buffer in normalized space
        acts = np.asarray(carry.buffer.action[:, :4])
        assert np.isfinite(acts).all() and (np.abs(acts) <= 1.0 + 1e-6).all()


class TestLearners:
    def test_sac_actor_delay(self):
        """actor_delay_updates: critic trains from step 0, actor/alpha
        updates apply only once state.step reaches the delay."""
        sac = SAC(SACConfig(batch_size=8, actor_delay_updates=2))
        st = sac.init(K(0), obs_res=16)
        batch = _tiny_batch()
        a0 = jax.tree.leaves(st.actor_params)[0].copy()
        c0 = jax.tree.leaves(st.critic_params)[0].copy()
        upd = jax.jit(sac.update)
        st, _ = upd(st, batch, K(1))                      # step 0: delayed
        st, _ = upd(st, batch, K(2))                      # step 1: delayed
        assert np.allclose(np.asarray(a0),
                           np.asarray(jax.tree.leaves(st.actor_params)[0]))
        assert not np.allclose(np.asarray(c0),
                               np.asarray(jax.tree.leaves(st.critic_params)[0]))
        st, _ = upd(st, batch, K(3))                      # step 2: applies
        assert not np.allclose(np.asarray(a0),
                               np.asarray(jax.tree.leaves(st.actor_params)[0]))

    def test_sac_update_moves_params(self):
        sac = SAC(SACConfig(batch_size=8))
        st = sac.init(K(0), obs_res=16)
        batch = _tiny_batch()
        st2, m = jax.jit(sac.update)(st, batch, K(1))
        assert int(st2.step) == 1
        leaf0 = jax.tree.leaves(st.actor_params)[0]
        leaf1 = jax.tree.leaves(st2.actor_params)[0]
        assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
        assert np.isfinite(float(m["critic_loss"]))

    def test_td3_delayed_policy(self):
        td3 = TD3(TD3Config(batch_size=8, policy_delay=2))
        st = td3.init(K(0), obs_res=16)
        batch = _tiny_batch()
        up = jax.jit(td3.update)
        st1, m1 = up(st, batch, K(1))   # step 0: actor updates
        a0 = jax.tree.leaves(st.actor_params)[0]
        a1 = jax.tree.leaves(st1.actor_params)[0]
        assert not np.allclose(np.asarray(a0), np.asarray(a1))
        st2, m2 = up(st1, batch, K(2))  # step 1: actor frozen
        a2 = jax.tree.leaves(st2.actor_params)[0]
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_ppo_update(self):
        ppo = PPO(PPOConfig(batch_size=8, n_epochs=2, n_steps=4))
        st = ppo.init(K(0), obs_res=16)
        t, e = 4, 4
        rollout = dict(
            obs=jax.random.randint(K(1), (t, e, 9, 16, 16), 0, 255,
                                   jnp.uint8),
            action=jax.random.uniform(K(2), (t, e, 2), minval=-1, maxval=1),
            log_prob=jnp.zeros((t, e)),
            value=jnp.zeros((t, e)),
            reward=jnp.ones((t, e)),
            done=jnp.zeros((t, e), bool),
        )
        st2, m = jax.jit(ppo.update)(st, rollout, jnp.zeros((e,)), K(3))
        assert np.isfinite(float(m["loss"]))
        assert int(st2.step) == 1

    def test_a2c_update(self):
        a2c = A2C(A2CConfig(n_steps=4))
        st = a2c.init(K(0), obs_res=16)
        t, e = 4, 4
        rollout = dict(
            obs=jax.random.randint(K(1), (t, e, 9, 16, 16), 0, 255,
                                   jnp.uint8),
            action=jax.random.uniform(K(2), (t, e, 2), minval=-1, maxval=1),
            log_prob=jnp.zeros((t, e)),
            value=jnp.zeros((t, e)),
            reward=jnp.ones((t, e)),
            done=jnp.zeros((t, e), bool),
        )
        st2, m = jax.jit(a2c.update)(st, rollout, jnp.zeros((e,)), K(3))
        assert np.isfinite(float(m["loss"]))
