"""Rule NPC controller (npc/route_follow.py) geometry gates.

Spot-checks the IDM emergency-obstacle logic on hand-built scenes: the
oncoming-pass gate must let opposing streams pass each other on a two-way
road (lane offset ~2*LANE_OFFSET = 3.5 m) while still braking for genuine
head-on and crossing conflicts. Local stand-in semantics for the
reference's IAI DRIVE NPC model (reference gym_env.py:285-294, iai.py).
"""

import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.npc import route_follow


def _pair(dx, dy, psi_other, v_self=8.0, v_other=8.0):
    """Agent 0 at origin heading +x; agent 1 at (dx, dy) heading psi_other."""
    states = jnp.array([
        [0.0, 0.0, 0.0, v_self],
        [dx, dy, psi_other, v_other],
    ])
    attrs = jnp.full((2, 3), 1.0) * jnp.array([4.8, 2.0, 1.4])
    present = jnp.ones((2,), bool)
    return states, attrs, present


class TestEmergencyGate:
    def test_opposing_stream_pass_by_no_brake(self):
        # two-way road: oncoming car one lane over (2*LANE_OFFSET = 3.5 m),
        # 15 m ahead — a normal pass-by, must NOT trigger emergency braking
        lat = 2 * route_follow.LANE_OFFSET
        states, attrs, present = _pair(15.0, lat, np.pi)
        gap, _ = route_follow.leader_gaps(states, attrs, present)
        assert not np.isfinite(np.asarray(gap)).any()

    def test_head_on_same_lane_brakes(self):
        # genuine head-on in my lane: both agents must see the obstacle
        states, attrs, present = _pair(15.0, 0.0, np.pi)
        gap, lv = route_follow.leader_gaps(states, attrs, present)
        gap = np.asarray(gap)
        assert np.isfinite(gap).all() and (gap < 15.0).all()
        # projected obstacle speed is negative (closing) for both
        assert (np.asarray(lv) < 0.0).all()

    def test_oncoming_drift_into_lane_brakes(self):
        # oncoming car 3.5 m over but angled 25 deg toward my lane:
        # predicted miss distance shrinks inside one lane width -> brake
        lat = 2 * route_follow.LANE_OFFSET
        states, attrs, present = _pair(15.0, lat, np.pi + 0.45)
        gap, _ = route_follow.leader_gaps(states, attrs, present)
        assert np.isfinite(np.asarray(gap)[0])

    def test_crossing_traffic_brakes(self):
        # perpendicular crossing car directly ahead (non-oncoming branch,
        # widened cone): must register as an emergency obstacle
        states, attrs, present = _pair(10.0, 0.0, np.pi / 2)
        gap, _ = route_follow.leader_gaps(states, attrs, present)
        assert np.isfinite(np.asarray(gap)[0])

    def test_same_direction_leader_idm(self):
        # plain car-following: leader ahead in lane, finite gap, leader
        # speed projected onto my heading is its own speed
        states, attrs, present = _pair(20.0, 0.0, 0.0, v_other=5.0)
        gap, lv = route_follow.leader_gaps(states, attrs, present)
        assert np.isfinite(np.asarray(gap)[0])
        np.testing.assert_allclose(np.asarray(lv)[0], 5.0, atol=1e-5)
