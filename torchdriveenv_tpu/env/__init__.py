from torchdriveenv_tpu.env.core import EnvState, reset, step  # noqa: F401
