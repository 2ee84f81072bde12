"""GRU NPC behavioral policy (npc/policy_net.py): interface, env
integration, and distillation sanity. Local stand-in for the reference's
recurrent IAI DRIVE NPC model (reference gym_env.py:285-294, iai.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env.batched import BatchedEnv
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.npc import policy_net, route_follow


def _scene(assets, n=96):
    st = jnp.zeros((n, 4)).at[:, 3].set(5.0)
    st = st.at[:, 0].set(jnp.linspace(-50, 50, n))
    attrs = jnp.ones((n, 3)) * jnp.array([4.8, 2.0, 1.4])
    present = jnp.arange(n) < 40
    ts = jnp.full((n,), 6.0)
    return st, attrs, present, ts


class TestPolicyNet:
    def test_shapes_and_recurrence(self):
        assets = load_assets("val")
        st, attrs, present, ts = _scene(assets)
        params = policy_net.init_params()
        h0 = policy_net.init_hidden(96)
        act, h1 = policy_net.npc_policy_actions(
            params, assets.maps, jnp.int32(0), jnp.float32(0.0),
            st, attrs, present, ts, h0)
        assert act.shape == (96, 2) and h1.shape == h0.shape
        assert np.isfinite(np.asarray(act)).all()
        # recurrent state actually evolves for present agents
        assert not np.allclose(np.asarray(h1[:40]), 0.0)
        # actions stay inside the NPC bounds
        a = np.asarray(act)
        assert (np.abs(a[:, 1]) <= route_follow.STEER_BOUND + 1e-6).all()
        assert (a[:, 0] >= route_follow.ACCEL_BOUNDS[0] - 1e-6).all()

    def test_parked_agents_hold(self):
        assets = load_assets("val")
        st, attrs, present, _ = _scene(assets)
        params = policy_net.init_params()
        h0 = policy_net.init_hidden(96)
        act, _ = policy_net.npc_policy_actions(
            params, assets.maps, jnp.int32(0), jnp.float32(0.0),
            st, attrs, present, jnp.zeros((96,)), h0)
        a = np.asarray(act)
        assert (a[:, 1] == 0.0).all()
        assert (a[:, 0] <= 0.0).all()   # braking toward standstill

    def test_env_integration(self):
        """Full batched env runs in policy mode and stays finite."""
        assets = load_assets("val")
        env = BatchedEnv(EnvConfig(npc_mode="policy"), assets, num_envs=4)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert state.npc_hidden is not None
        acts = jnp.tile(jnp.array([[0.3, 0.0]]), (4, 1))
        for _ in range(10):
            out = env.step(state, acts)
            state = out.state
        assert np.isfinite(np.asarray(state.agent_states)).all()
        assert np.isfinite(np.asarray(out.reward)).all()
        # hidden state evolved
        assert not np.allclose(np.asarray(state.npc_hidden), 0.0)

    def test_distill_reduces_imitation_error(self):
        """A short distillation run must fit the rule controller better than
        a random init (tiny-scale smoke of tools/distill_npc.py)."""
        assets = load_assets("val")

        def imitation_mse(params, key):
            from torchdriveenv_tpu.env import core
            cfg = EnvConfig()
            st = core.reset(cfg, assets, key)
            t = st.time0
            target = route_follow.npc_actions(
                assets.maps, st.town, t, st.agent_states, st.agent_attrs,
                st.present, st.npc_target_speed)
            act, _ = policy_net.npc_policy_actions(
                params, assets.maps, st.town, t, st.agent_states,
                st.agent_attrs, st.present, st.npc_target_speed,
                policy_net.init_hidden(st.agent_states.shape[0]))
            w = st.present.astype(jnp.float32)[:, None]
            return float(jnp.sum(w * (act - target) ** 2) / w.sum())

        p0 = policy_net.init_params()
        p1, loss = policy_net.distill(assets, steps=60, batch=16, lr=3e-3,
                                      params=p0)
        k = jax.random.PRNGKey(42)
        before = imitation_mse(p0, k)
        after = imitation_mse(p1, k)
        assert after < before, (before, after)
