from torchdriveenv_tpu.npc.route_follow import npc_actions  # noqa: F401
