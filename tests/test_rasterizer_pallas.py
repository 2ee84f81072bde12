"""Fused Pallas rasterizer vs its XLA twin (and sanity vs the SDF path).

The kernel (ops/rasterizer_pallas.py) and `render_obs_ref` share the same
arithmetic expression over identical packed blocks, so interpret-mode output
must match the twin exactly. The twin itself must agree with the original
SDF-grid rasterizer on the layers whose math is shared (agents, waypoint,
stoplines) and closely on the road layer (analytic corridors vs their 0.5 m
rasterization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.ops import rasterizer, rasterizer_pallas as rp


@pytest.fixture(scope="module")
def assets():
    return load_assets("val")


@pytest.fixture(scope="module")
def states(assets):
    """A batch of envs advanced a few steps (mix of towns/cases/agents)."""
    cfg = EnvConfig()
    reset_fn, step_fn = make_env_fns(cfg, assets, render=False)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8, dtype=jnp.uint32))
    state, _ = jax.jit(reset_fn)(keys)
    actions = jnp.tile(jnp.array([[0.4, 0.05]]), (8, 1))
    step = jax.jit(step_fn)
    for _ in range(12):
        state = step(state, actions).state
    return state


def _render_args(assets, state):
    t = state.time0 + state.step_idx.astype(jnp.float32) * 0.1
    return (state.town, t, state.agent_states, state.agent_attrs,
            state.present, assets.suite.waypoints[state.case],
            state.target_idx, assets.suite.n_waypoints[state.case])


class TestPallasVsTwin:
    def test_interpret_matches_twin(self, assets, states):
        args = _render_args(assets, states)
        prep = jax.vmap(
            lambda *a: rp.prepare_obs_inputs(assets.maps, *a, fov=70.0)
        )(*args)
        town = args[0]
        twin = jax.vmap(
            lambda *a: rp.render_obs_ref(assets.maps, *a)
        )(town, *prep)
        kern = rp._render_pallas(assets.maps, town, *prep, interpret=True)
        assert kern.shape == twin.shape == (8, 3, 64, 64)
        mismatch = (np.asarray(kern) != np.asarray(twin)).mean()
        assert mismatch == 0.0, f"pixel mismatch fraction {mismatch}"

    def test_dispatcher_shapes(self, assets, states):
        args = _render_args(assets, states)
        obs = rp.render_observation(assets.maps, *args, backend="xla")
        assert obs.shape == (8, 3, 64, 64) and obs.dtype == jnp.uint8


class TestTwinVsSdfRasterizer:
    def test_layers_match(self, assets, states):
        """Agents/ego/waypoint/stopline pixels identical; road close."""
        args = _render_args(assets, states)
        new = np.asarray(rp.render_observation(assets.maps, *args,
                                               backend="xla"))
        old = np.asarray(jax.vmap(
            lambda *a: rasterizer.render_egocentric(assets.maps, *a)
        )(*args))

        # overlay layers (everything except background/road) use identical
        # cull + math: those pixels must agree exactly
        base_colors = np.stack([np.asarray(rasterizer.COLOR_BACKGROUND),
                                np.asarray(rasterizer.COLOR_ROAD)]).astype(np.uint8)
        def overlay_mask(img):
            flat = img.transpose(0, 2, 3, 1).reshape(-1, 3)
            is_base = (flat[:, None, :] == base_colors[None]).all(-1).any(-1)
            return ~is_base, flat
        m_new, f_new = overlay_mask(new)
        m_old, f_old = overlay_mask(old)
        np.testing.assert_array_equal(m_new, m_old)
        np.testing.assert_array_equal(f_new[m_new], f_old[m_old])

        # road: analytic corridors vs their 0.5 m/px rasterized SDF —
        # boundaries may differ by a pixel; bulk must agree
        road_disagree = (f_new[~m_new] != f_old[~m_old]).any(-1).mean()
        assert road_disagree < 0.02, f"road layer disagreement {road_disagree}"

    def test_full_waypoint_sequence_rendered(self, assets):
        """The reference feeds every waypoint except index 0 to the renderer
        for the whole episode (gym_env.py:252-257) — route context, not just
        the current target disc. More waypoints in range => more waypoint
        pixels; the current target index must not affect the frame."""
        wp0 = assets.suite.waypoints[0][0]          # on-road start point
        n_pad = assets.suite.waypoints.shape[1]
        ego_state = jnp.concatenate([wp0, jnp.zeros((2,))])
        states = ego_state[None, :]
        attrs = jnp.array([[4.8, 1.9, 1.4]])
        present = jnp.ones((1,), bool)
        # waypoints straight ahead at 10 m and 20 m (inside the 70 m FOV)
        wps = jnp.zeros((n_pad, 2)).at[0].set(wp0)
        wps = wps.at[1].set(wp0 + jnp.array([10.0, 0.0]))
        wps = wps.at[2].set(wp0 + jnp.array([20.0, 0.0]))

        def render(n_wp, tgt):
            img = rp.render_observation(
                assets.maps, jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
                states[None], attrs[None], present[None], wps[None],
                jnp.full((1,), tgt, jnp.int32),
                jnp.full((1,), n_wp, jnp.int32), backend="xla")
            return np.asarray(img)

        wp_c = np.asarray(rasterizer.COLOR_WAYPOINT).astype(np.uint8)

        def n_wp_pixels(img):
            flat = img.transpose(0, 2, 3, 1).reshape(-1, 3)
            return int((flat == wp_c).all(-1).sum())

        one = n_wp_pixels(render(2, 1))     # only wp1 maskable
        two = n_wp_pixels(render(3, 1))     # wp1 + wp2
        assert one > 0
        assert two > 1.5 * one, (one, two)
        # target_idx is irrelevant to rendering (mask is static in the ref)
        np.testing.assert_array_equal(render(3, 1), render(3, 2))

    def test_ego_only_and_empty_scene(self, assets):
        """No NPCs, no lights in range: frame is road+bg+ego+waypoint only."""
        cfg = EnvConfig(ego_only=True)
        reset_fn, _ = make_env_fns(cfg, assets, render=False)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4, dtype=jnp.uint32))
        state, _ = jax.jit(reset_fn)(keys)
        args = _render_args(assets, state)
        obs = np.asarray(rp.render_observation(assets.maps, *args,
                                               backend="xla"))
        ego_c = np.asarray(rasterizer.COLOR_EGO).astype(np.uint8)
        npc_c = np.asarray(rasterizer.COLOR_NPC).astype(np.uint8)
        flat = obs.transpose(0, 2, 3, 1).reshape(len(obs), -1, 3)
        assert (flat == ego_c).all(-1).any(-1).all(), "ego visible"
        assert not (flat == npc_c).all(-1).any(), "no NPCs drawn"
