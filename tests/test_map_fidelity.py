"""Map-geometry fidelity audit as a CI gate (tools/audit_map_fidelity.py).

The drivable area is synthesized from the reference's bundled data
(maps/compile.py; see DESIGN.md "Map synthesis"); these tests pin the audit
at 100%: every reference-provided waypoint (105 cases), scenario agent pose,
replay pose over time, and background-traffic agent (75 caches) lies on-road
in the compiled SDF under the env's own corner-based offroad metric, and the
analytic render index covers every waypoint. Reference ground truth:
data/{training,validation}_cases.yml, resources/background_traffic/*.json;
real maps consumed at reference gym_env.py:312.
"""

import pytest

from torchdriveenv_tpu.maps.arrays import load_assets

from tools.audit_map_fidelity import (
    audit_background,
    audit_render_coverage,
    audit_replay_poses,
    audit_scenario_agents,
    audit_spawn_segments,
    audit_waypoints,
)


@pytest.fixture(scope="module", params=["train", "val"])
def suite(request):
    return request.param, load_assets(request.param)


def test_waypoints_on_road(suite):
    name, assets = suite
    r = audit_waypoints(assets, name)
    assert r["violations"] == 0, r
    assert r["min_sdf_m"] > 1.0          # comfortably inside, not boundary


def test_spawn_segments_on_road(suite):
    name, assets = suite
    r = audit_spawn_segments(assets, name)
    assert r["violations"] == 0, r


def test_scenario_agents_on_road(suite):
    name, assets = suite
    r = audit_scenario_agents(assets, name)
    assert r["violations"] == 0, r


def test_replay_poses_on_road(suite):
    name, assets = suite
    r = audit_replay_poses(assets, name)
    assert r["violations"] == 0, r
    if name == "val":
        assert r["n"] == 300             # the 300-frame TrafficLights replay


def test_render_index_covers_waypoints(suite):
    name, assets = suite
    r = audit_render_coverage(assets, name)
    assert r["violations"] == 0, r


def test_background_agents_on_road():
    assets = load_assets("val")
    r = audit_background(assets)
    assert r["violations"] == 0, r
    assert r["n"] == 4355                # all agents of all 75 caches
