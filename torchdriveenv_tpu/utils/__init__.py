from torchdriveenv_tpu.utils.seeding import set_seeds  # noqa: F401
from torchdriveenv_tpu.utils.video import save_video  # noqa: F401
