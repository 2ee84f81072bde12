"""Golden-value unit tests for the physics kernels (SURVEY.md §4: the TPU
build adds the unit coverage the reference lacks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchdriveenv_tpu.ops.bicycle import bicycle_step
from torchdriveenv_tpu.ops.collision import ego_collision, obb_corners, pairwise_collision
from torchdriveenv_tpu.ops.traffic_lights import LightState, light_states_at, traffic_light_violation
from torchdriveenv_tpu.ops.waypoints import waypoint_reached


class TestBicycle:
    def test_straight_line(self):
        state = jnp.array([0.0, 0.0, 0.0, 10.0])
        out = bicycle_step(state, jnp.array([0.0, 0.0]), lr=jnp.array(1.0), dt=0.1)
        np.testing.assert_allclose(out, [1.0, 0.0, 0.0, 10.0], atol=1e-6)

    def test_acceleration(self):
        state = jnp.array([0.0, 0.0, 0.0, 0.0])
        out = bicycle_step(state, jnp.array([2.0, 0.0]), lr=jnp.array(1.0), dt=0.1)
        # explicit Euler: position uses pre-update speed
        np.testing.assert_allclose(out, [0.0, 0.0, 0.0, 0.2], atol=1e-6)

    def test_turn_geometry(self):
        # beta = atan(tan(s)/2); closed-form one-step update
        v, s, lr, dt = 5.0, 0.2, 0.9, 0.1
        beta = np.arctan(np.tan(s) / 2)
        state = jnp.array([1.0, 2.0, 0.5, v])
        out = bicycle_step(state, jnp.array([0.0, s]), lr=jnp.array(lr), dt=dt)
        np.testing.assert_allclose(
            out,
            [1.0 + v * np.cos(0.5 + beta) * dt,
             2.0 + v * np.sin(0.5 + beta) * dt,
             0.5 + v * np.sin(beta) / lr * dt,
             v],
            rtol=1e-6)

    def test_heading_aligned_with_motion(self):
        # constant steering => circular arc; heading change must match
        # angular velocity v*sin(beta)/lr integrated over time
        state = jnp.array([0.0, 0.0, 0.0, 5.0])
        for _ in range(100):
            state = bicycle_step(state, jnp.array([0.0, 0.3]), lr=jnp.array(1.0), dt=0.1)
        beta = np.arctan(np.tan(0.3) / 2)
        expected_psi = 5.0 * np.sin(beta) / 1.0 * 10.0
        np.testing.assert_allclose(state[2], expected_psi, rtol=1e-4)

    def test_batched(self):
        states = jnp.zeros((4, 7, 4)).at[..., 3].set(3.0)
        out = bicycle_step(states, jnp.zeros((4, 7, 2)), lr=jnp.ones((4, 7)))
        assert out.shape == (4, 7, 4)
        np.testing.assert_allclose(out[..., 0], 0.3, atol=1e-6)


class TestCollision:
    def test_corners(self):
        c = obb_corners(jnp.array([0.0, 0.0, 0.0, 0.0]), jnp.array([4.0, 2.0]))
        assert sorted(map(tuple, np.asarray(c).tolist())) == [
            (-2.0, -1.0), (-2.0, 1.0), (2.0, -1.0), (2.0, 1.0)]

    def test_no_overlap(self):
        states = jnp.array([[0.0, 0.0, 0.0, 0.0], [10.0, 0.0, 0.0, 0.0]])
        sizes = jnp.array([[4.0, 2.0], [4.0, 2.0]])
        present = jnp.array([True, True])
        assert ego_collision(states, sizes, present) == 0.0

    def test_overlap_depth(self):
        # boxes of length 4 at distance 3 along x: penetration = 1
        states = jnp.array([[0.0, 0.0, 0.0, 0.0], [3.0, 0.0, 0.0, 0.0]])
        sizes = jnp.array([[4.0, 2.0], [4.0, 2.0]])
        present = jnp.array([True, True])
        np.testing.assert_allclose(ego_collision(states, sizes, present), 1.0, atol=1e-6)

    def test_rotated_separation(self):
        # diagonal box separated only on the rotated axis (classic SAT case)
        states = jnp.array([[0.0, 0.0, 0.0, 0.0],
                            [3.2, 2.2, np.pi / 4, 0.0]])
        sizes = jnp.array([[4.0, 2.0], [4.0, 2.0]])
        present = jnp.array([True, True])
        v = float(ego_collision(states, sizes, present))
        # verify against a dense point-sampling oracle
        assert v == pytest.approx(_oracle_overlap(states, sizes), abs=0.15)

    def test_absent_agents_ignored(self):
        states = jnp.array([[0.0, 0.0, 0.0, 0.0], [0.5, 0.0, 0.0, 0.0]])
        sizes = jnp.array([[4.0, 2.0], [4.0, 2.0]])
        assert ego_collision(states, sizes, jnp.array([True, False])) == 0.0

    def test_discs_metric(self):
        """CollisionMetric.discs (reference gym_env.py:48 enum): disc
        decomposition agrees with SAT on clear hits/misses and only differs
        near box corners (conservative radius)."""
        from torchdriveenv_tpu.ops.collision import ego_collision_discs

        sizes = jnp.array([[4.0, 2.0], [4.0, 2.0]])
        present = jnp.array([True, True])
        # head-on overlap: both metrics fire
        hit = jnp.array([[0.0, 0.0, 0.0, 0.0], [3.0, 0.0, 0.0, 0.0]])
        assert float(ego_collision_discs(hit, sizes, present)) > 0.0
        assert float(ego_collision(hit, sizes, present)) > 0.0
        # far apart: both zero
        miss = jnp.array([[0.0, 0.0, 0.0, 0.0], [20.0, 0.0, 0.0, 0.0]])
        assert float(ego_collision_discs(miss, sizes, present)) == 0.0
        # side-by-side touching widths: discs fire like SAT
        side = jnp.array([[0.0, 0.0, 0.0, 0.0], [0.0, 1.9, 0.0, 0.0]])
        assert float(ego_collision_discs(side, sizes, present)) > 0.0
        # env integration: the discs config path steps
        from torchdriveenv_tpu.config import (CollisionMetric, EnvConfig,
                                              TorchDriveConfig)
        from torchdriveenv_tpu.env import core
        from torchdriveenv_tpu.maps.arrays import load_assets
        import functools
        import jax

        cfg = EnvConfig(ego_only=True, simulator=TorchDriveConfig(
            collision_metric=CollisionMetric.discs))
        assets = load_assets("val")
        st = jax.jit(functools.partial(core.reset, cfg, assets))(
            jax.random.PRNGKey(0))
        _, _, term, _, info = jax.jit(functools.partial(
            core.step, cfg, assets))(st, jnp.array([0.3, 0.0]))
        assert float(info["collision"]) == 0.0

    def test_pairwise_symmetry(self):
        states = jnp.array([[0.0, 0.0, 0.3, 0.0],
                            [2.0, 1.0, -0.4, 0.0],
                            [50.0, 0.0, 0.0, 0.0]])
        sizes = jnp.full((3, 2), 3.0).at[:, 1].set(1.8)
        present = jnp.ones(3, bool)
        m = pairwise_collision(states, sizes, present)
        np.testing.assert_allclose(m, m.T, atol=1e-6)
        assert m[0, 2] == 0.0 and m[0, 1] > 0.0
        np.testing.assert_allclose(jnp.diag(m), 0.0)


def _oracle_overlap(states, sizes):
    """Penetration oracle: binary-search the minimum translation along the
    center line until sampled overlap disappears."""
    import itertools

    def overlaps(shift):
        s = np.asarray(states).copy()
        d = s[1, :2] - s[0, :2]
        d = d / np.linalg.norm(d)
        s[1, :2] += d * shift
        # dense sample box 1 interior, test inside box 0
        xs = np.linspace(-sizes[1][0] / 2, sizes[1][0] / 2, 80)
        ys = np.linspace(-sizes[1][1] / 2, sizes[1][1] / 2, 40)
        pts = np.array(list(itertools.product(xs, ys)))
        c, sn = np.cos(s[1, 2]), np.sin(s[1, 2])
        world = s[1, :2] + pts @ np.array([[c, sn], [-sn, c]])
        rel = world - s[0, :2]
        c0, s0 = np.cos(s[0, 2]), np.sin(s[0, 2])
        lx = rel[:, 0] * c0 + rel[:, 1] * s0
        ly = -rel[:, 0] * s0 + rel[:, 1] * c0
        return np.any((np.abs(lx) <= sizes[0][0] / 2) & (np.abs(ly) <= sizes[0][1] / 2))

    lo, hi = 0.0, 10.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if overlaps(mid):
            lo = mid
        else:
            hi = mid
    return lo


class TestTrafficLights:
    def test_cycle(self, assets_train):
        maps = assets_train.maps
        g, y, r = np.asarray(maps.light_durations)
        town = jnp.int32(0)
        # phase offsets vary per light; test light 0 relative to its phase
        phase0 = float(maps.light_phase[town][0])
        s_green = light_states_at(maps, town, jnp.float32(0.0 - phase0 + 0.1))
        s_yellow = light_states_at(maps, town, jnp.float32(g - phase0 + 0.1))
        s_red = light_states_at(maps, town, jnp.float32(g + y - phase0 + 0.1))
        assert int(s_green[0]) == LightState.GREEN
        assert int(s_yellow[0]) == LightState.YELLOW
        assert int(s_red[0]) == LightState.RED

    def test_violation_requires_red_and_crossing(self, assets_train):
        """Crossing-based semantics: the front bumper passing the stopline on
        red is a violation; sitting on/behind the line, or the same crossing
        on green, is not."""
        maps = assets_train.maps
        town = jnp.int32(0)
        g, y, r = np.asarray(maps.light_durations)
        phase0 = float(maps.light_phase[town][0])
        mid = np.asarray((maps.stop_p0[town][0] + maps.stop_p1[town][0]) / 2)
        heading = float(maps.stop_dir[town][0])
        size = jnp.array([4.5, 2.0])
        fwd = np.array([np.cos(heading), np.sin(heading)])
        # one 0.1 s step at 5 m/s straddling the line: front goes -0.75 -> -0.25
        # relative to the line... place so the front crosses: center starts
        # 3 m before the line, ends 2.5 m before -> front (at +2.25) crosses 0
        before = np.concatenate([mid - 3.0 * fwd, [heading, 5.0]])
        after = np.concatenate([mid - 2.0 * fwd, [heading, 5.0]])
        prev_s = jnp.asarray(before, jnp.float32)
        new_s = jnp.asarray(after, jnp.float32)
        t_red = jnp.float32(g + y - phase0 + 0.5)
        t_green = jnp.float32(-phase0 + 0.5)
        assert float(traffic_light_violation(
            maps, town, t_red, prev_s, new_s, size)) == 1.0
        assert float(traffic_light_violation(
            maps, town, t_green, prev_s, new_s, size)) == 0.0
        # stationary ON the line on red: no crossing event, no violation
        on_line = jnp.asarray(np.concatenate([mid, [heading, 0.0]]), jnp.float32)
        assert float(traffic_light_violation(
            maps, town, t_red, on_line, on_line, size)) == 0.0
        # far away: no violation even on red
        far_p = prev_s.at[0].add(500.0)
        far_n = new_s.at[0].add(500.0)
        assert float(traffic_light_violation(
            maps, town, t_red, far_p, far_n, size)) == 0.0


class TestWaypoints:
    def test_reach(self):
        wps = jnp.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
        n = jnp.int32(3)
        assert bool(waypoint_reached(jnp.array([8.0, 1.0]), wps, jnp.int32(1), n))
        assert not bool(waypoint_reached(jnp.array([5.0, 0.0]), wps, jnp.int32(1), n))
        # exhausted route: never reached (reference current_target=None)
        assert not bool(waypoint_reached(jnp.array([20.0, 0.0]), wps, jnp.int32(3), n))
