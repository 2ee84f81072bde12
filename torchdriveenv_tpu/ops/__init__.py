from torchdriveenv_tpu.ops.bicycle import bicycle_step  # noqa: F401
from torchdriveenv_tpu.ops.collision import (  # noqa: F401
    ego_collision,
    obb_corners,
    pairwise_collision,
)
from torchdriveenv_tpu.ops.offroad import compute_offroad  # noqa: F401
from torchdriveenv_tpu.ops.traffic_lights import (  # noqa: F401
    LightState,
    light_states_at,
    traffic_light_violation,
)
from torchdriveenv_tpu.ops.waypoints import waypoint_reached  # noqa: F401
